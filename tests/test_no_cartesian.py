"""Registry-wide negative plan lock: no query — driver slot or extra —
may plan a CartesianProduct, and BroadcastNestedLoopJoin is allowed
only where the broadcast side is structurally tiny (a scalar stats row,
a bounded query set, or literal band boundaries). A new query that
accidentally cross-joins two big frames fails here before it ever
reaches a cluster."""

from __future__ import annotations

import pytest

from scala_data_pipeline_spark.plans import explain_str
from scala_data_pipeline_spark.queries import all_queries, extra_queries

# Each of these broadcasts a provably-small side (see the operator's
# docstring): scalar aggregate rows (distinct_max_stamp, sim_quantize,
# text_surprisal's vocab stats, text_lm_perplexity's one-row vocab-size
# scalar at ext/textstats.py:497), bounded query batches (sim_topk_*),
# literal price bands (range_join_price_bands), or the one-row metric
# cross-joins of dedup_lsh_quality.
BNLJ_ALLOWED = {
    "dedup_lsh_quality",
    "distinct_max_stamp",
    "range_join_price_bands",
    "sim_mmr_rerank",
    "sim_quantize",
    # sim_knn_recall_eval composes sim_topk_bruteforce as its exact
    # side, inheriting that query's bounded 50-query broadcast cross
    # join (ext/similarity.py knn_recall_eval docstring).
    "sim_knn_recall_eval",
    # sim_rrf_fusion composes sim_topk_bruteforce + sim_topk_quantized
    # and inherits their bounded 5-query broadcast cross joins.
    "sim_rrf_fusion",
    "sim_topk_bruteforce",
    "sim_topk_quantized",
    # curation_semantic_decon broadcasts the BENCHMARK split (25 rows
    # at the fixture; eval sets are small by definition) onto the
    # corpus scan — the decontaminate-by-broadcast shape
    # (ext/similarity.py semantic_decontaminate docstring).
    "curation_semantic_decon",
    # sql_rfm_segments broadcasts two one-row frames (the anchor date
    # and the six tercile cuts) onto per-user stats — the documented
    # tiny-broadcast pattern (see the query's comment in sql_api.py).
    "sql_rfm_segments",
    # DSIR broadcasts the ONE-ROW corpus totals onto the bounded
    # hashed-vocabulary model (n_buckets rows) to smooth the log
    # ratios — the canonical tiny-broadcast cross join
    # (ext/dsir.py dsir_weights).
    "curation_dsir_weights",
    "curation_dsir_sample",
    # sketch_theta_audiences pairs per-event-type sketch rows with a
    # `type_a < type_b` inequality join — one broadcast row per event
    # TYPE (a handful of KB-sized sketches), never the events table
    # (queries/sketches.py docstring).
    "sketch_theta_audiences",
    # mad_anomaly_revenue broadcasts two one-row median/MAD frames
    # onto the bounded day grain (tiny-broadcast pattern).
    "mad_anomaly_revenue",
    # cusum_revenue_shift broadcasts one-row mean/changepoint/segment-
    # mean frames onto (and against) the bounded day grain.
    "cusum_revenue_shift",
    # theilsen_event_trend self-joins the bounded ~30-row day grain on
    # an inequality (pairwise slopes) and broadcasts the one-row
    # median-slope frame — never the events table.
    "theilsen_event_trend",
    # text_source_divergence cross-joins the BOUNDED per-source totals
    # (~20 rows) with the broadcast ~30-term vocabulary to densify the
    # probability grid — never the documents table (query docstring).
    "text_source_divergence",
    # sketch_hdr_quantiles joins FOUR broadcast probe-quantile rows
    # against the BOUNDED bucket-grain cumulative frame ((64-M)*2^M
    # rows regardless of corpus) on a `cum >= ceil(q*total)`
    # inequality — never the events table (ext/hdrhist.py docstring).
    "sketch_hdr_quantiles",
    # ab_welch_value pairs per-event-type moment rows with a
    # `type_a < type_b` inequality join — one broadcast row per event
    # TYPE, never the events table (queries/tsstats.py).
    "ab_welch_value",
    # ab_welch_fdr composes ab_welch_value and inherits the same
    # per-event-type inequality join; everything it adds runs on the
    # constant-size test-family frame (queries/tsstats.py).
    "ab_welch_fdr",
    # ewma_daily_revenue band-joins the DAY-GRAIN series with itself
    # (≤ span rows per day over thousands of day rows, broadcast side
    # is the day grain, never the orders corpus — queries/tsstats.py).
    "ewma_daily_revenue",
    # waterfall_nation_mom crosses the DISTINCT month frame with the
    # broadcast 25-row nation frame to densify the grid — both sides
    # grain frames, never the orders corpus (queries/tsstats.py).
    "waterfall_nation_mom",
    # ml_als_recommend broadcasts the 25-row item-factor frame onto
    # user factors for top-k scoring (queries/seqmine.py) — the
    # bounded-item-axis alternative to MLlib's blocked cartesian.
    "ml_als_recommend",
    # text_retrieval_eval broadcasts ONE corpus-stats row (N, avgdl,
    # per-term dfs) onto per-doc term frequencies — the same scalar
    # crossJoin pattern as text_surprisal/bm25 (ext/ranking.py
    # docstring).
    "text_retrieval_eval",
    # survival_km_users broadcasts the one-row censoring-horizon
    # aggregate onto per-user lifetimes (queries/tsstats.py).
    "survival_km_users",
    "text_bm25",
    "text_lm_perplexity",
    "text_ppl_buckets",
    "text_surprisal",
    # chi2_lang_source crosses the BOUNDED lang marginal (~5 rows)
    # with the broadcast ~20-row source marginal to densify the
    # contingency grid (absent cells carry E>0), plus the one-row
    # (n, r, c) totals frame — never the documents table.
    "chi2_lang_source",
    # mutual_info_lang_source broadcasts the one-row N total onto the
    # bounded marginal/cell grains and the three one-row metric
    # frames onto each other — never the documents table.
    "mutual_info_lang_source",
}

QUERIES = {**all_queries(), **extra_queries()}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_product(spark, sf_dir, name):
    plan = explain_str(QUERIES[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, (
        f"{name} plans a CartesianProduct"
    )
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a BroadcastNestedLoopJoin but is not in the "
            "tiny-broadcast-side allowlist"
        )
