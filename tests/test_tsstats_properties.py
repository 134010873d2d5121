"""Hypothesis property tests for the tsstats algorithms — the
engine-independent semantics, pinned against brute-force replicas on
randomized inputs (the oracle-parity tests prove engine equivalence;
these prove both engines compute the RIGHT thing)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F
from pyspark.sql import Window

intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=1, max_value=41),
    ).map(lambda t: (min(t), max(t[0] + 1, t[1]))),
    min_size=1,
    max_size=30,
)


@settings(max_examples=25, deadline=None)
@given(intervals)
def test_delta_sweep_equals_brute_stab(spark, ivs):
    """+1/-1 sweep == per-day brute interval counting under [s, e)."""
    df = spark.createDataFrame(ivs, "s int, e int")
    deltas = df.select(
        F.col("s").alias("day"), F.lit(1).alias("d")
    ).unionAll(df.select(F.col("e").alias("day"), F.lit(-1).alias("d")))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = {
        r.day: r.open
        for r in deltas.groupBy("day")
        .agg(F.sum("d").alias("net"))
        .select("day", F.sum("net").over(w).alias("open"))
        .collect()
    }
    for day, got in swept.items():
        brute = sum(1 for s, e in ivs if s <= day < e)
        assert got == brute, (day, got, brute, ivs)
    # conservation: after the last edge everything is closed
    assert swept[max(swept)] == 0


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["b1", "b2"]),
            st.integers(min_value=0, max_value=9),  # price
            st.integers(min_value=0, max_value=9),  # size
        ),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_sweep_equals_dominance_definition(spark, rows):
    from scala_data_pipeline_spark.queries.frontier import pareto_frontier

    df = spark.createDataFrame(
        [(b, i, float(p), s) for i, (b, p, s) in enumerate(rows)],
        "p_brand string, p_partkey long, p_retailprice double, p_size int",
    )
    got = {r.p_partkey for r in pareto_frontier(df).collect()}
    data = [(i, b, float(p), s) for i, (b, p, s) in enumerate(rows)]
    for i, b, p, sz in data:
        dominated = any(
            qb == b
            and qp <= p
            and qs >= sz
            and (qp < p or qs > sz)
            for j, qb, qp, qs in data
            if j != i
        )
        assert (i in got) == (not dominated), (i, rows)


def test_km_terminal_step_is_exactly_zero(spark, tmp_path):
    """Round-5 advisor finding: when the longest-lived subject dies
    uncensored, deaths == at_risk at the last death time and the naive
    exp(sum(log(1 - d/n))) form silently carries the previous step
    forward (Spark) or errors on ln(0) (DuckDB). Both engines must
    instead report survival exactly 0 at the exhausting step."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from scala_data_pipeline_spark.queries.tsstats import (
        KM_ORACLE,
        survival_km_users,
    )
    from tests.oracle_harness import compare

    def ts(s):
        return dt.datetime.fromisoformat(s)

    # Gap-churn semantics (KM_GAP_DAYS = 3):
    # user 1: one event Jan 1 -> trailing silence >= 3 days -> dies at
    #   lifetime 0;
    # user 2: Jan 1/2/3 (no internal gap) -> trailing churn, lifetime 2
    #   (the longest UNCENSORED lifetime -> exhausts the risk set);
    # user 3: one event at the corpus max -> censored, lifetime 0;
    # user 4: Jan 5, 6, then a 9-day internal gap -> churns at Jan 6,
    #   lifetime 1 (the Jan 15 event is post-churn and ignored).
    events = pd.DataFrame(
        {
            "user_id": [1, 2, 2, 2, 3, 4, 4, 4],
            "ts": [
                ts("2024-01-01 12:00:00"),
                ts("2024-01-01 08:00:00"),
                ts("2024-01-02 10:00:00"),
                ts("2024-01-03 09:00:00"),
                ts("2024-02-01 00:00:00"),
                ts("2024-01-05 07:00:00"),
                ts("2024-01-06 07:00:00"),
                ts("2024-01-15 07:00:00"),
            ],
        }
    )
    path = str(tmp_path / "events.parquet")
    events.to_parquet(path)

    got = survival_km_users(spark, str(tmp_path))
    rows = {r.lifetime_days: r for r in got.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].at_risk == 4 and rows[0].deaths == 1
    assert rows[0].survival == 0.75
    assert rows[1].at_risk == 2 and rows[1].deaths == 1
    assert rows[1].survival == 0.375
    # the terminal step: deaths == at_risk -> survival must be 0.0,
    # not the previous step's value
    assert rows[2].at_risk == 1 and rows[2].deaths == 1
    assert rows[2].survival == 0.0

    # the oracle must neither error on ln(0) nor disagree
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
        want = con.execute(KM_ORACLE).df()
    finally:
        con.close()
    compare(got, want, "survival_km_users/terminal")


def test_benford_chi2_terms_are_pearson_contributions(spark, sf_dir):
    """chi2_term must be the PEARSON contribution N*(f-e)^2/e — with
    the total-count factor (round-13 review: omitting N made the terms
    ~N times too small, so a chi-square cutoff test would pass grossly
    fabricated data)."""
    from scala_data_pipeline_spark.queries.tsstats import benford_prices

    rows = benford_prices(spark, sf_dir).collect()
    n_total = sum(r.n for r in rows)
    for r in rows:
        f, e = r.n / n_total, r.benford_freq
        want = n_total * (f - e) ** 2 / e
        assert abs(r.chi2_term - want) < max(1e-4, 0.01 * want), r


def test_yoy_growth_skips_missing_base_month(spark, tmp_path):
    """A month GAP must yield NULL MoM/YoY for rows whose calendar base
    month is absent — not a silently shifted comparison (round-13
    review: lag(12) was 12 ROWS back)."""
    import datetime

    from scala_data_pipeline_spark.queries.tsstats import yoy_revenue_growth

    rows = []
    k = 0
    for y, m in [(2023, 1), (2023, 2), (2023, 4),  # March missing
                 (2024, 1), (2024, 2), (2024, 3), (2024, 4)]:
        for _ in range(3):
            k += 1
            rows.append((k, datetime.date(y, m, 15), 100.0 * m))
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r.year, r.month): (r.mom_growth, r.yoy_growth)
        for r in yoy_revenue_growth(spark, str(tmp_path)).collect()
    }
    # April 2023 follows a missing March: MoM must be NULL
    assert got[(2023, 4)][0] is None
    # March 2024 has no March 2023: YoY must be NULL (the row-lag bug
    # would have compared against a shifted month instead)
    assert got[(2024, 3)][1] is None
    # April 2024 vs April 2023 both exist: YoY = 0 (same revenue)
    assert got[(2024, 4)][1] == 0.0
    assert got[(2024, 2)][1] == 0.0
