"""Batch-equivalence twins of the streaming operators (SURVEY.md §2.9).

Structured Streaming's unified model means the SAME ``revenue_window_agg``
definition runs on a stream (tests/test_streaming.py drives it through a
file-source micro-batch pipeline) and on a batch frame (here, where the
DuckDB oracle can check the values). T1/T3 window semantics are checked
by value; trigger/checkpoint mechanics are checked in the streaming
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum_sql
from ..sources import load_table
from ..streaming.windowed import revenue_window_agg


def windowed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return revenue_window_agg(events, "60 minutes")


WINDOWED_REVENUE_ORACLE = f"""
SELECT time_bucket(INTERVAL '60 minutes', ts) AS window_start,
       time_bucket(INTERVAL '60 minutes', ts) + INTERVAL '60 minutes' AS window_end,
       {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 2)} AS revenue,
       CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS visitors,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
       CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
            THEN {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 2)}
                 / COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
       END AS aov
FROM events
GROUP BY 1, 2
"""


def windowed_revenue_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finer-grained window to exercise non-hour-aligned bucketing."""
    events = load_table(spark, sf_dir, "events")
    return revenue_window_agg(events, "15 minutes")


WINDOWED_REVENUE_15M_ORACLE = WINDOWED_REVENUE_ORACLE.replace("60 minutes", "15 minutes")


# Round-6 rotation: windowed_revenue (A9/T1, green r1-r5 — five
# consecutive driver rows) demoted to fund a never-checked flagship
# extra; the tumbling-window agg stays green via test_oracle_parity and
# the streaming twin stays covered by tests/test_streaming.py.
QUERIES: dict = {}

ORACLES: dict = {}

# Demoted from driver slots (50-row cap): pure window-width variant of
# windowed_revenue; still oracle-checked locally.
EXTRA_QUERIES = {
    "windowed_revenue_15m": windowed_revenue_15m,
    "windowed_revenue": windowed_revenue,
}
EXTRA_ORACLES = {
    "windowed_revenue_15m": WINDOWED_REVENUE_15M_ORACLE,
    "windowed_revenue": WINDOWED_REVENUE_ORACLE,
}


def rollup_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern: daily revenue/counts computed from
    hourly partials (not a raw rescan) — exact by decimal partials."""
    from ..operators.rollup import daily_rollup

    return daily_rollup(load_table(spark, sf_dir, "events"))


def _rollup_oracle() -> str:
    from ..operators.rollup import daily_rollup_sql

    return daily_rollup_sql()


# Round-6 rotation: promoted to a driver slot (new continuous-aggregate
# flagship, never driver-checked).
# Round-12 rotation: demoted after 6 green driver rounds (r6-r11).
EXTRA_QUERIES["rollup_daily_revenue"] = rollup_daily_revenue
EXTRA_ORACLES["rollup_daily_revenue"] = _rollup_oracle()


def rollup_daily_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users estimated by merging hourly HLL sketches —
    the mergeable-sketch side of the continuous-aggregate pattern
    (rows-only: approximate results have no value-hash twin)."""
    from ..operators.rollup import daily_distinct_users, hourly_user_sketches

    return daily_distinct_users(
        hourly_user_sketches(load_table(spark, sf_dir, "events"))
    )


EXTRA_QUERIES["rollup_daily_users_hll"] = rollup_daily_users_hll


def mau_28d_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-day sliding distinct users (MAU) per day — THE query exact
    distinct cannot do at scale (a sliding window can't reuse a running
    distinct: every day's window is a different set union). With
    per-day HLL sketches the slide is ``hll_union_agg`` over an
    integer-day RANGE frame: each day unions ≤28 KB-sized summaries,
    never re-touching the raw events. One corpus pass builds the daily
    sketches; the window runs over the day grain. Rows-only
    (estimates); tests/test_rollup.py asserts estimate == exact sliding
    distinct in the sparse test regime."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    daily = events.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias(
            "day"
        )
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = Window.orderBy("day").rangeBetween(-27, Window.currentRow)
    return daily.select(
        F.col("day").cast("long").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("long")
        .alias("mau_28d"),
    )


EXTRA_QUERIES["mau_28d_hll"] = mau_28d_hll


BOUNDS = {
    "mau_28d_hll": (
        "tests/test_rollup.py::test_mau_sliding_hll_exact_in_sparse_regime"
        " — sliding-window HLL MAU equals exact distinct in the sparse regime"
    ),
    "rollup_daily_users_hll": (
        "tests/test_rollup.py::test_hll_sketch_rollup_accuracy"
        " — merged-sketch rollup within HLL error of exact distinct"
    ),
}
