"""Property-based invariants (hypothesis): partitioning-invariance of
the order-independent aggregates and CASE-bucket totality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scala_data_pipeline_spark.functions.numeric import dsum
from scala_data_pipeline_spark.operators.relational import (
    ACCTBAL_BOUNDS,
    ACCTBAL_LABELS,
    bucket_column,
)

FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(FLOATS, min_size=1, max_size=40), st.integers(1, 6))
def test_dsum_partitioning_invariant(spark, values, n_parts):
    """dsum result is identical regardless of how rows are partitioned —
    the reproducibility contract that backs oracle parity at scale."""
    df = spark.createDataFrame([(v,) for v in values], "x DOUBLE")
    a = df.coalesce(1).agg(dsum(F.col("x")).alias("s")).first()["s"]
    b = df.repartition(n_parts).agg(dsum(F.col("x")).alias("s")).first()["s"]
    assert a == b


@settings(max_examples=8, deadline=None)
@given(st.lists(FLOATS, min_size=1, max_size=30))
def test_bucket_column_total_and_ordered(spark, values):
    """Every value lands in exactly one bucket, consistent with bounds."""
    df = spark.createDataFrame([(v,) for v in values], "x DOUBLE")
    out = df.select(
        "x",
        bucket_column(F.col("x"), ACCTBAL_BOUNDS, ACCTBAL_LABELS).alias("b"),
    ).collect()
    for r in out:
        expected = ACCTBAL_LABELS[-1]
        for bound, label in zip(ACCTBAL_BOUNDS, ACCTBAL_LABELS):
            if r["x"] < bound:
                expected = label
                break
        assert r["b"] == expected, (r["x"], r["b"], expected)


def test_approx_percentile_error_bound(spark, sf_dir):
    """GK sketch percentiles stay within rank-error of the exact ones."""
    from scala_data_pipeline_spark.queries.stats import approx_percentile_prices
    from scala_data_pipeline_spark.sources import load_table

    approx = {
        r["l_linestatus"]: (r["approx_p50"], r["approx_p90"])
        for r in approx_percentile_prices(spark, sf_dir).collect()
    }
    lineitem = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_linestatus"]: (r["p50"], r["p90"])
        for r in lineitem.groupBy("l_linestatus")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("p50"),
            F.percentile("l_extendedprice", 0.9).alias("p90"),
        )
        .collect()
    }
    for status, (a50, a90) in approx.items():
        e50, e90 = exact[status]
        # accuracy=1000 -> rank error ~1/1000; generous value tolerance
        assert abs(a50 - e50) / e50 < 0.05
        assert abs(a90 - e90) / e90 < 0.05


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 72),  # hour offset within 3 days
            st.sampled_from(["purchase", "view", "click"]),
            st.floats(0, 1e4, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 5),
)
def test_rollup_partial_merge_invariant(spark, rows, n_parts):
    """Continuous-aggregate contract: hour→day partial merge equals the
    direct daily aggregate for ARBITRARY event sets under ARBITRARY
    partitioning (the decimal-partials exactness the rollup relies on,
    operators/rollup.py)."""
    from datetime import datetime, timedelta

    from scala_data_pipeline_spark.operators.rollup import (
        daily_from_hourly,
        hourly_rollup,
    )

    base = datetime(2024, 3, 1)
    data = [
        (base + timedelta(hours=h, minutes=7), et, v) for h, et, v in rows
    ]
    df = spark.createDataFrame(
        data, "ts timestamp, event_type string, value double"
    ).repartition(n_parts)
    merged = {
        r.bucket_day: (r.revenue, r.n_events, r.n_purchases)
        for r in daily_from_hourly(hourly_rollup(df)).collect()
    }
    purchase_value = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(F.lit(0.0))
    direct = {
        r.bucket_day: (r.revenue, r.n_events, r.n_purchases)
        for r in df.groupBy(
            F.date_trunc("day", F.col("ts")).alias("bucket_day")
        )
        .agg(
            F.sum(purchase_value.cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", F.lit(1)))
            .cast("long")
            .alias("n_purchases"),
        )
        .collect()
    }
    assert merged == direct


@settings(max_examples=6, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda e: e[0] < e[1]
        ),
        max_size=20,
    )
)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered triangle counting equals the O(n^3) brute force on
    arbitrary small graphs (apex orientation neither drops nor double
    counts)."""
    from itertools import combinations

    from scala_data_pipeline_spark.ext.graph import triangle_counts

    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    verts = {v for e in edges for v in e}
    want: dict[int, int] = {}
    for a, b, c in combinations(sorted(verts), 3):
        if {(a, b), (a, c), (b, c)} <= edges:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(st.integers(0, 15), st.integers(-2, 2), max_size=10),
    st.dictionaries(st.integers(0, 15), st.integers(-2, 2), max_size=10),
)
def test_table_diff_partitions_keyspace(spark, old, new):
    """table_diff emits every key exactly once with the right class;
    diff(x, x) is all-unchanged."""
    from scala_data_pipeline_spark.operators.scd import table_diff

    if not old and not new:
        return
    mk = lambda d: spark.createDataFrame(
        [(k, v) for k, v in d.items()], "k LONG, val LONG"
    )
    out = {
        r["k"]: r["change_type"]
        for r in table_diff(mk(old) if old else mk({0: 0}).limit(0),
                            mk(new) if new else mk({0: 0}).limit(0),
                            key="k", attrs=["val"]).collect()
    }
    assert set(out) == set(old) | set(new)
    for k in set(old) | set(new):
        if k not in old:
            assert out[k] == "added"
        elif k not in new:
            assert out[k] == "removed"
        elif old[k] == new[k]:
            assert out[k] == "unchanged"
        else:
            assert out[k] == "changed"
    if old:
        same = table_diff(mk(old), mk(old), key="k", attrs=["val"])
        assert same.filter(F.col("change_type") != "unchanged").count() == 0


def test_bootstrap_ci_brackets_true_mean(spark, sf_dir):
    """Round-16: the Poisson-bootstrap 95% CI must bracket the exact
    per-group mean (a property the DuckDB twin cannot check — both
    engines would share a mis-specified draw), be properly ordered
    (lo <= median <= hi), and carry every replicate. With n >= 1000
    rows per priority group the bootstrap distribution is tight around
    the truth; a broken draw (wrong CDF constants, biased uniform)
    shifts or collapses the interval."""
    import duckdb

    from scala_data_pipeline_spark.queries.stats import (
        bootstrap_ci_revenue,
    )

    got = {
        r["o_orderpriority"]: r
        for r in bootstrap_ci_revenue(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    try:
        truth = dict(
            con.execute(
                f"SELECT o_orderpriority, AVG(o_totalprice) FROM "
                f"'{sf_dir}/orders.parquet' GROUP BY 1"
            ).fetchall()
        )
    finally:
        con.close()
    assert set(got) == set(truth)
    for grp, r in got.items():
        assert r["n_replicates"] == 100
        assert r["ci_lo"] <= r["boot_median"] <= r["ci_hi"], grp
        assert r["ci_lo"] <= truth[grp] <= r["ci_hi"], (
            grp,
            truth[grp],
            r["ci_lo"],
            r["ci_hi"],
        )
        # The interval is INFORMATIVE, not degenerate or vacuous:
        # half-width within 15% of the mean at fixture n.
        assert (r["ci_hi"] - r["ci_lo"]) / truth[grp] < 0.30, grp
