"""Matrix-layer queries: users×items pivot, incremental merge
idempotence, per-user time-feature matrix (SURVEY.md §2 A2/A4/A5/F18/F19)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from ..functions.timefn import WEEKDAYS
from ..operators.aggregates import pivot_counts
from ..operators.matrix import (
    event_items_long,
    item_values,
    merge_matrices,
    user_time_matrix,
    users_items_matrix,
)
from ..sources import load_table

_ITEMS_LONG_SQL = """
SELECT user_id,
       (CASE WHEN event_type = 'view' THEN 'view_item' ELSE 'buy_item' END)
         || CAST(json_extract_string(props, '$.k') AS VARCHAR) AS item
FROM events
WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
"""
# Oracle twin of the users×items pivot, built with the SHARED
# pivot_counts_sql generator (round-13 review: a hand-rolled copy here
# lacked the quote-escaping and label-collision hardening the shared
# helper carries).
from ..operators.aggregates import pivot_counts_sql

USERS_ITEMS_ORACLE = pivot_counts_sql(
    f"({_ITEMS_LONG_SQL})", key="user_id", pivot_col="item",
    values=item_values(),
)


def q_users_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return users_items_matrix(load_table(spark, sf_dir, "events"))


def q_users_items_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build on the first 20 days, merge the remainder incrementally —
    must equal the full-data matrix (same oracle).

    The narrow (user_id, item, ts) long frame is projected ONCE and
    persisted, then split by the cutoff — without it each side re-scans
    and re-parses events (props JSON included) for its own pivot. In
    production the old side is yesterday's matrix read from storage;
    persisting the shared projection is the equivalent one-scan shape
    when both sides derive from the same batch."""
    events = load_table(spark, sf_dir, "events")
    # localCheckpoint, not a never-unpersisted persist (round-13
    # review: each invocation pinned another copy of the long frame in
    # the block manager for the session lifetime; checkpointed RDDs are
    # released when the Python frame is GC'd — the bench loop relies on
    # that).
    long = event_items_long(events, extra_cols=("ts",)).localCheckpoint(
        eager=True
    )
    cutoff = F.lit("2024-01-20")
    vals = item_values()
    old = pivot_counts(
        long.filter(F.col("ts") < cutoff),
        key="user_id", pivot_col="item", values=vals,
    )
    new = pivot_counts(
        long.filter(F.col("ts") >= cutoff),
        key="user_id", pivot_col="item", values=vals,
    )
    return merge_matrices(old, new)


def q_user_time_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = user_time_matrix(load_table(spark, sf_dir, "events"))
    # Serialize the packed vector for hash-stable comparison.
    return wide.withColumn(
        "hour_vector", F.array_join(F.col("hour_vector"), ",")
    )


_HOUR_COLS = ",\n    ".join(
    f"CAST(COALESCE(SUM(CASE WHEN EXTRACT(hour FROM ts) = {h} THEN 1 END), 0) AS BIGINT) AS web_hour_{h}"
    for h in range(24)
)
_DAY_COLS = ",\n    ".join(
    "CAST(COALESCE(SUM(CASE WHEN lower(strftime(ts, '%a')) = '{d}' THEN 1 END), 0) AS BIGINT) AS web_day_{d}".format(d=d)
    for d in WEEKDAYS
)
_HOUR_VECTOR = " || ',' || ".join(
    f"CAST(CAST(COALESCE(SUM(CASE WHEN EXTRACT(hour FROM ts) = {h} THEN 1 END), 0) AS BIGINT) AS VARCHAR)"
    for h in range(24)
)
USER_TIME_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS visits,
       CAST(COUNT(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 9 AND 17 THEN 1 END) AS DOUBLE) / COUNT(*) AS web_fraction_work_hours,
       CAST(COUNT(CASE WHEN EXTRACT(hour FROM ts) BETWEEN 18 AND 23 THEN 1 END) AS DOUBLE) / COUNT(*) AS web_fraction_evening_hours,
       {_HOUR_COLS},
       {_DAY_COLS},
       {_HOUR_VECTOR} AS hour_vector
FROM events
WHERE user_id IS NOT NULL
GROUP BY user_id
"""


# Round-7 driver rotation: user_time_matrix (green r1-r6) demoted to an
# extra — the 201-column conditional-agg pivot machinery stays locked by
# tests/test_plans.py and local parity (this module now has three
# oracle-checked variants of it); its slot goes to the never-checked
# feature_point_in_time (scd_queries).
QUERIES: dict = {}

ORACLES: dict = {}

# users_items_incremental: demoted round 3 (merge must equal the full
# rebuild, so it shares USERS_ITEMS_ORACLE — a near-twin driver row).
# users_items_matrix: demoted round 4 (same 201-column conditional-agg
# machinery as user_time_matrix, which keeps the driver slot). Plan
# locks (tests/test_plans.py) and local parity checks remain for both.
EXTRA_QUERIES = {
    "users_items_incremental": q_users_items_incremental,
    "users_items_matrix": q_users_items,
    "user_time_matrix": q_user_time_matrix,
}
EXTRA_ORACLES = {
    "users_items_incremental": USERS_ITEMS_ORACLE,
    "users_items_matrix": USERS_ITEMS_ORACLE,
    "user_time_matrix": USER_TIME_ORACLE,
}
