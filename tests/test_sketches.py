"""Error-bound tests for the DataSketches operators (queries/sketches.py).

Sketch estimates have no DuckDB twin, so — like approx_percentile —
they are verified against exact answers computed side-by-side, with
the sketches' PUBLISHED bounds as the tolerance:

- KLL k=200: rank error ε ≈ 1.65 % (two-sided, 99 % confidence). The
  assert brackets each KLL quantile between the exact values at rank
  q±2ε — a bound on the *rank*, converted to a value interval, which
  is how the guarantee is stated.
- Theta lgK=12 (4096 nominal entries): sets smaller than the nominal
  capacity are stored exactly, so at test SFs (≤1.5k distinct users)
  every estimate must equal the exact count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.queries.sketches import (
    sketch_kll_prices,
    sketch_theta_audiences,
)
from scala_data_pipeline_spark.sources import load_table

KLL_RANK_EPS = 2 * 0.0165


def test_kll_quantiles_within_rank_bounds(spark, sf_dir):
    out = {
        r["l_linestatus"]: r for r in sketch_kll_prices(spark, sf_dir).collect()
    }
    lineitem = load_table(spark, sf_dir, "lineitem")
    groups = [r["l_linestatus"] for r in out.values() if r["l_linestatus"] != "ALL"]
    assert "ALL" in out and groups
    for status in [*groups, "ALL"]:
        rows = (
            lineitem
            if status == "ALL"
            else lineitem.filter(F.col("l_linestatus") == status)
        )
        for q, col in [(0.5, "kll_p50"), (0.9, "kll_p90"), (0.99, "kll_p99")]:
            lo_r = max(0.0, q - KLL_RANK_EPS)
            hi_r = min(1.0, q + KLL_RANK_EPS)
            lo, hi = rows.select(
                F.expr(f"percentile(l_extendedprice, {lo_r})"),
                F.expr(f"percentile(l_extendedprice, {hi_r})"),
            ).first()
            got = out[status][col]
            assert lo - 1e-9 <= got <= hi + 1e-9, (
                f"{status}/{col}: {got} outside exact rank window "
                f"[{lo}, {hi}]"
            )
    # the merged ALL row must cover every group's rows exactly
    assert out["ALL"]["n_rows"] == sum(out[g]["n_rows"] for g in groups)


def test_theta_set_algebra_exact_below_capacity(spark, sf_dir):
    got = {
        (r["type_a"], r["type_b"]): r
        for r in sketch_theta_audiences(spark, sf_dir).collect()
    }
    assert got, "no event-type pairs"
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    audiences = {
        r["event_type"]: set(r["users"])
        for r in events.groupBy("event_type")
        .agg(F.collect_set("user_id").alias("users"))
        .collect()
    }
    for (ta, tb), r in got.items():
        a, b = audiences[ta], audiences[tb]
        assert r["est_a"] == len(a)
        assert r["est_b"] == len(b)
        assert r["est_union"] == len(a | b)
        assert r["est_intersect"] == len(a & b)
        assert r["est_a_only"] == len(a - b)
    # every unordered pair appears exactly once (a < b)
    types = sorted(audiences)
    expected_pairs = {(x, y) for x in types for y in types if x < y}
    assert set(got) == expected_pairs


def test_countmin_overestimates_and_merges(spark, sf_dir):
    """CM guarantees: (a) point estimates never underestimate; (b)
    partial sketches merge by cell-wise addition into exactly the
    full-data sketch (the mergeable-summaries property)."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.ext.countmin import (
        countmin_estimates,
        countmin_sketch,
    )
    from scala_data_pipeline_spark.queries.sketches import (
        sketch_countmin_custkey,
    )
    from scala_data_pipeline_spark.sources import load_table

    rows = sketch_countmin_custkey(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.cm_est >= r.true_cnt for r in rows)

    orders = load_table(spark, sf_dir, "orders")
    half_a = orders.filter(F.col("o_orderkey") % 2 == 0)
    half_b = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        countmin_sketch(half_a, "o_custkey")
        .unionByName(countmin_sketch(half_b, "o_custkey"))
        .groupBy("depth", "slot")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    full = countmin_sketch(orders, "o_custkey")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0
    # And estimates from the merged sketch equal full-sketch estimates.
    probes = spark.range(1, 21).select(F.col("id").alias("o_custkey"))
    em = {
        r.o_custkey: r.cm_est
        for r in countmin_estimates(merged, probes, "o_custkey").collect()
    }
    ef = {
        r.o_custkey: r.cm_est
        for r in countmin_estimates(full, probes, "o_custkey").collect()
    }
    assert em == ef


def test_hdr_quantile_error_bound(spark):
    """HDR estimates must sit within the sub-bucket relative error
    bound (2^-5) of the exact percentile — and the bucketing must be
    pure integer arithmetic (bit-length octaves), asserted implicitly
    by the oracle hash check in test_oracle_parity."""
    import duckdb

    from scala_data_pipeline_spark.ext.hdrhist import (
        HDR_SUB_BITS,
        hdr_histogram,
        hdr_quantiles,
    )
    from scala_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    got = {
        r["q"]: r["est_cents"]
        for r in hdr_quantiles(hdr_histogram(events, "value")).collect()
    }
    con = duckdb.connect()
    exact = {
        q: con.execute(
            f"SELECT quantile_cont(CAST(ROUND(value*100) AS BIGINT), {q})"
            f" FROM '{sf}/events.parquet' WHERE value > 0"
        ).fetchone()[0]
        for q in got
    }
    rel = 2.0 ** -HDR_SUB_BITS
    for q, est in got.items():
        true = float(exact[q])
        assert abs(est - true) <= rel * true + 1.0, (q, est, true)
