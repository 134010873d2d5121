"""Mergeable-sketch analytics (Apache DataSketches, JVM-side in Spark 4.x).

The at-scale answers to "global quantiles" and "audience set algebra":
exact forms need either a global sort (percentile) or a distinct
shuffle per set expression (countDistinct), both of which stop scaling
long before 100 TB. Sketches are bounded-size mergeable state — each
executor summarizes its partition, the merge tree combines summaries,
and the error is a published bound, not a guess:

- **KLL** (Karnin-Lang-Liberty 2016): quantile sketch with ~1.65 %
  rank error at k=200. Critically, sketches built per GROUP can be
  merged again (``kll_sketch_merge_double``) — the two-level rollup
  here (per-linestatus sketches → one global sketch) is the exact
  pattern of a 100 TB pipeline that keeps per-partition summaries and
  derives any coarser rollup without rescanning the data.
- **Theta** (Dasgupta et al.): distinct-count sketch that, unlike HLL
  (``operators/rollup.py``), supports INTERSECTION and DIFFERENCE —
  "users who purchased but never clicked" over arbitrary groups is one
  sketch per group plus set algebra on summaries, no re-shuffle of the
  raw events.

Estimates are engine-specific (no DuckDB twin exists for either
sketch), so like ``approx_percentile_prices`` these register as
locally-tested extras: ``tests/test_sketches.py`` asserts the
published error bounds against exact answers computed side-by-side.

Reference parity note: the reference has no sketch operators (its
dashboards recompute exact distincts per query, dashboard.scala);
these are part of the beyond-reference scale surface SURVEY.md §6
calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}


def sketch_kll_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level KLL quantile rollup over lineitem prices.

    Level 1 builds one KLL sketch per l_linestatus (single pass,
    map-side partial merge — the shuffle carries sketches, not rows).
    Level 2 merges the group sketches into a global sketch with
    ``kll_sketch_merge_double`` — no second pass over the data. Both
    levels answer p50/p90/p99; rows: one per group + one ALL row.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_group = lineitem.groupBy("l_linestatus").agg(
        F.kll_sketch_agg_double("l_extendedprice", 200).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # Level-2 merge: collect the handful of KB-sized group sketches
    # into one row and fold them with the dedicated merge function —
    # a reduce over summaries, independent of corpus size. (Catalyst
    # dedups the repeated collect_list aggregate; the slice skips the
    # fold's seed element.)
    lst = F.collect_list("sk")
    global_row = per_group.groupBy(F.lit("ALL").alias("l_linestatus")).agg(
        F.aggregate(
            F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0))),
            F.element_at(lst, 1),
            lambda acc, s: F.kll_sketch_merge_double(acc, s),
        ).alias("sk"),
        F.sum("n_rows").alias("n_rows"),
    )
    both = per_group.unionByName(global_row)
    return both.select(
        "l_linestatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 4
        ).alias("kll_p50"),
        F.round(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 4
        ).alias("kll_p90"),
        F.round(
            F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 4
        ).alias("kll_p99"),
    )


def sketch_theta_audiences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra from per-event-type theta sketches.

    One pass builds a distinct-user theta sketch per event_type; every
    pairwise audience question — overlap, union, exclusive — is then
    summary algebra (``theta_intersection`` / ``theta_union`` /
    ``theta_difference``) on KB-sized state. The exact-form equivalent
    re-shuffles the events table once per set expression; at 100 TB
    that's the difference between one scan and a dozen.

    Output: one row per ordered event-type pair (a < b) with estimated
    |A|, |B|, |A∪B|, |A∩B|, |A\\B|.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    sk = events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id", 12).alias("sk")
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    # tiny×tiny join (one row per event type) — broadcast, never a
    # shuffle of the underlying events
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.theta_sketch_estimate("sk_a").cast("long").alias("est_a"),
        F.theta_sketch_estimate("sk_b").cast("long").alias("est_b"),
        F.theta_sketch_estimate(
            F.theta_union("sk_a", "sk_b")
        ).cast("long").alias("est_union"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).cast("long").alias("est_intersect"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_a", "sk_b")
        ).cast("long").alias("est_a_only"),
    )


def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpaceSaving approximate top-k corpus tokens (bounded-memory
    single pass; see ext/heavyhitters.py for the algorithm and its
    merged-summary guarantees). Rows-only: counts carry partition-
    layout-dependent overestimates; the published error bounds are
    asserted against exact counts in tests/test_heavyhitters.py and
    against the exact DuckDB token aggregate in
    tests/test_oracle_parity.py (bounded-error oracle, round 12)."""
    from ..ext.heavyhitters import heavy_hitters

    return heavy_hitters(spark, sf_dir)


EXTRA_QUERIES["sketch_kll_prices"] = sketch_kll_prices
EXTRA_QUERIES["sketch_theta_audiences"] = sketch_theta_audiences
EXTRA_QUERIES["sketch_heavy_hitters"] = sketch_heavy_hitters


def sketch_countmin_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates vs exact counts for customer keys
    1..20 over orders (round 7; see ext/countmin.py). Deterministic
    md5 slot arithmetic, so — unlike the other sketches here — this
    one carries a full DuckDB hash oracle; the CM overestimate
    invariant (est >= true, always) is additionally test-asserted."""
    from ..ext.countmin import countmin_estimates, countmin_sketch

    orders = load_table(spark, sf_dir, "orders")
    sketch = countmin_sketch(orders, "o_custkey")
    probes = spark.range(1, 21).select(F.col("id").alias("o_custkey"))
    est = countmin_estimates(sketch, probes, "o_custkey")
    truth = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    return est.join(truth, on="o_custkey", how="left").select(
        F.col("o_custkey").alias("custkey"),
        F.coalesce(F.col("true_cnt"), F.lit(0).cast("long")).alias(
            "true_cnt"
        ),
        F.col("cm_est").cast("long").alias("cm_est"),
    )


def _countmin_oracle() -> str:
    from ..ext.countmin import countmin_sql

    return f"""
WITH est AS ({countmin_sql("o_custkey", "orders", 1, 20)}),
truth AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM orders GROUP BY 1
)
SELECT est.k AS custkey,
       COALESCE(truth.true_cnt, 0) AS true_cnt,
       est.cm_est
FROM est LEFT JOIN truth ON truth.k = est.k
"""


# Round-9 driver rotation: sketch_countmin_custkey promoted (never
# driver-checked; the only sketch with a full-hash oracle — the
# deterministic CM sketch is replayed cell-by-cell in DuckDB).
# Round-15 demotion (green driver rows in 5 rounds):
EXTRA_QUERIES["sketch_countmin_custkey"] = sketch_countmin_custkey
EXTRA_ORACLES["sketch_countmin_custkey"] = _countmin_oracle()


def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantile estimates over events.value (round 9;
    see ext/hdrhist.py). Pure integer bucketing (bit-length octaves x
    32 linear sub-buckets), so — like sketch_countmin_custkey and
    unlike the rows-only KLL — the DuckDB oracle replays the identical
    arithmetic and this row is full-hash-checked; the <= 2^-5 relative
    error bound vs the exact percentile is test-asserted."""
    from ..ext.hdrhist import hdr_histogram, hdr_quantiles

    events = load_table(spark, sf_dir, "events")
    return hdr_quantiles(hdr_histogram(events, "value"))


def _hdr_oracle() -> str:
    from ..ext.hdrhist import hdr_quantiles_sql

    return hdr_quantiles_sql()


# Round-10 rotation: promoted to a driver slot (never driver-checked).
# Round-16 rotation: demoted after 5 green driver rounds (r11-r15) —
# still oracle-checked locally by tests/test_oracle_parity.py.
EXTRA_QUERIES["sketch_hdr_quantiles"] = sketch_hdr_quantiles
EXTRA_ORACLES["sketch_hdr_quantiles"] = _hdr_oracle()


BOUNDS = {
    "sketch_heavy_hitters": (
        "tests/test_oracle_parity.py::test_heavy_hitters_bounds_vs_exact_oracle"
        " — SpaceSaving frequency brackets vs exact DuckDB counts"
    ),
    "sketch_kll_prices": (
        "tests/test_sketches.py::test_kll_quantiles_within_rank_bounds"
        " — KLL quantiles inside the sketch's rank-error bound vs exact"
    ),
    "sketch_theta_audiences": (
        "tests/test_sketches.py::test_theta_set_algebra_exact_below_capacity"
        " — theta union/intersect/diff exact below sketch capacity"
    ),
}
