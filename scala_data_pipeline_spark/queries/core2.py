"""Second core batch: remaining §2 inventory items — dropDuplicates
(P10), column drop (P9), explicit unpivot (F19), global sort (O1),
window functions (W1 literal + rank/lag), to_json round-trip (F15/F16)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import distinct_values, pivot_counts, unpivot_counts
from ..operators.matrix import users_items_matrix
from ..operators.windows import stamp_max_literal
from ..sources import load_table


# P9/P10: drop + dropDuplicates on a subset.

def drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.dropDuplicates(["user_id", "event_type"])
        .drop("props", "value", "ts", "event_id")
        .filter(F.col("user_id").isNotNull())
    )


DROP_DUP_ORACLE = """
SELECT DISTINCT user_id, event_type
FROM events
WHERE user_id IS NOT NULL
"""


# F19: explicit unpivot of the users×items matrix back to long form.

def unpivot_matrix_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    matrix = users_items_matrix(load_table(spark, sf_dir, "events"))
    long = unpivot_counts(
        matrix,
        key="user_id",
        value_cols=[c for c in matrix.columns if c != "user_id"],
    )
    return long.filter(F.col("cnt") > 0)


UNPIVOT_ORACLE = """
SELECT user_id,
       (CASE WHEN event_type = 'view' THEN 'view_item' ELSE 'buy_item' END)
         || CAST(json_extract_string(props, '$.k') AS VARCHAR) AS item_id,
       COUNT(*) AS cnt
FROM events
WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
GROUP BY 1, 2
"""


# O1: global sort before write — materialized as a ranked projection so
# the oracle can check the total order by value.

def global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # The row_number window imposes the global (date, key) sort itself;
    # an explicit pre-orderBy was dead code (round-13 review).
    return orders.select(
        F.row_number()
        .over(Window.orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc()))
        .alias("pos"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
    )


GLOBAL_SORT_ORACLE = """
SELECT ROW_NUMBER() OVER (ORDER BY o_orderdate ASC, o_orderkey ASC) AS pos,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date
FROM orders
"""


# W1 literal: the reference's single-partition window stamping max date.

def window_maxdate_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.max("ts").alias("type_max_ts")
    )
    stamped = stamp_max_literal(per_type, F.col("type_max_ts"), "global_max_ts")
    return stamped.select(
        "event_type",
        F.date_format("type_max_ts", "yyyyMMdd").alias("type_max_date"),
        F.date_format("global_max_ts", "yyyyMMdd").alias("global_max_date"),
    )


WINDOW_MAXDATE_ORACLE = """
SELECT event_type,
       strftime(MAX(ts), '%Y%m%d') AS type_max_date,
       strftime(MAX(MAX(ts)) OVER (), '%Y%m%d') AS global_max_date
FROM events
GROUP BY event_type
"""


# Rank + lag: per-customer order sequence analytics.

def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        "o_orderdate",
    )
    # o_orderdate ties within a customer would make rank/lag ambiguous —
    # tiebreak on o_orderkey for a total order (operators.windows.ranked/
    # with_lag take any order Column; composed inline here).
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    seq = base.withColumn("rnk", F.row_number().over(w)).withColumn(
        "prev_price", F.lag("price").over(w)
    )
    return seq.select("o_custkey", "o_orderkey", "rnk", "price", "prev_price")


WINDOW_RANK_ORACLE = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rnk,
       ROUND(o_totalprice, 2) AS price,
       LAG(ROUND(o_totalprice, 2)) OVER w AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# F15/F16: to_json(struct(*)) serialization round-trip.

def json_serialize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    compact = events.select("event_id", "event_type")
    as_json = compact.select(
        F.to_json(F.struct("event_id", "event_type")).alias("payload")
    )
    back = as_json.select(
        F.from_json("payload", "event_id BIGINT, event_type STRING").alias("v")
    ).select("v.*")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("event_id").cast("long").alias("id_sum")
    )


JSON_ROUNDTRIP_ORACLE = """
SELECT event_type, COUNT(*) AS cnt, CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Dynamic pivot (data_mart/data_mart.scala:114,126; users_items/
# users_items.scala:79): the value list is DISCOVERED at runtime via an
# eager distinct job, then fed to the single-shuffle pivot_counts plan.
# The data-dependent-schema path the reference uses as its workhorse.
# Oracle: DuckDB's native dynamic PIVOT discovers the same columns.
# ---------------------------------------------------------------------------

def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    values = distinct_values(events, "event_type")
    return pivot_counts(events, "user_id", "event_type", values)


PIVOT_DYNAMIC_ORACLE = """
PIVOT (SELECT user_id, event_type FROM events WHERE event_type IS NOT NULL)
ON event_type USING COUNT(*) GROUP BY user_id
"""


QUERIES: dict = {}

ORACLES: dict = {}

# Round-4 registry rotation: near-twin slots freed for never-driver-
# checked flagship extras (pivot_dynamic twins pivot_user_events;
# window_maxdate_literal's W1 semantics are covered by window_rank_lag's
# window machinery + its own local parity check). Both stay green in
# tests/test_oracle_parity.py.
# Round-5 rotation: json_serialize_roundtrip (F15/F16, green since
# round 1; json_extract_props keeps the from_json/to_json family under
# a driver row) demoted for a never-checked flagship extra.
EXTRA_QUERIES = {
    "window_maxdate_literal": window_maxdate_literal,
    "pivot_dynamic": pivot_dynamic,
    "json_serialize_roundtrip": json_serialize_roundtrip,
    # Round-6 rotation: rank/lag held a green driver row rounds 1-4;
    # the window family keeps driver coverage via rolling_revenue_7d
    # and session_funnel_ordered. Slot freed for event_transitions.
    "window_rank_lag": window_rank_lag,
    # Round-7 rotation: native unpivot (F19) green r1-r4; the
    # wide↔long machinery keeps a driver row via user_time_matrix.
    "unpivot_matrix_long": unpivot_matrix_long,
}
EXTRA_ORACLES = {
    "window_maxdate_literal": WINDOW_MAXDATE_ORACLE,
    "pivot_dynamic": PIVOT_DYNAMIC_ORACLE,
    "json_serialize_roundtrip": JSON_ROUNDTRIP_ORACLE,
    "window_rank_lag": WINDOW_RANK_ORACLE,
    "unpivot_matrix_long": UNPIVOT_ORACLE,
}

# Round-6 rotation: drop_duplicates_subset (P10) and global_sort (O1)
# held green driver rows rounds 1-4; dedup_exact keeps P10-style
# dedup under a driver row and global ordering is exercised inside
# topk/window queries. Demoted for never-checked flagship extras.
EXTRA_QUERIES["drop_duplicates_subset"] = drop_duplicates_subset
EXTRA_ORACLES["drop_duplicates_subset"] = DROP_DUP_ORACLE
EXTRA_QUERIES["global_sort"] = global_sort
EXTRA_ORACLES["global_sort"] = GLOBAL_SORT_ORACLE


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``eqNullSafe`` / SQL ``<=>``): events carry
    NULL user_ids (anonymous traffic), and a plain equi-join silently
    drops them when enriching events with per-user aggregates — the
    null-safe key matches the NULL group to the NULL bucket instead,
    conserving every row. No other registry query plans a null-safe
    join key. Output: per user-bucket event count with its enrichment
    count cross-checked (equal iff no row was dropped), NULL bucket
    included.

    Plan: one shuffle to the per-user grain, then the null-safe join is
    a plain hash join on a coalesced key internally — same cost class
    as the equi-join that would have been wrong.
    """
    # The fixture's user_id is never NULL, so anonymous traffic is
    # PLANTED deterministically (user_id % 7 = 0 -> NULL; same
    # expression in the oracle) — otherwise a plain equi-join would
    # pass this query and the null-safe semantics would be untested.
    events = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 7 != 0, F.col("user_id")).alias(
            "user_id"
        ),
        "event_id",
    )
    stats = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    joined = events.select("user_id", "event_id").join(
        stats.withColumnRenamed("user_id", "uid"),
        on=F.col("user_id").eqNullSafe(F.col("uid")),
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_joined"),
            F.max("n_events").alias("n_events"),
        )
        .filter(F.col("user_id").isNull() | (F.col("user_id") < 20))
        .select("user_id", "n_events", "n_joined")
    )


JOIN_NULL_SAFE_ORACLE = """
WITH ev AS (
  SELECT CASE WHEN user_id % 7 <> 0 THEN user_id END AS user_id, event_id
  FROM events
), stats AS (
  SELECT user_id AS uid, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY user_id
)
SELECT e.user_id,
       MAX(s.n_events) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_joined
FROM ev e JOIN stats s ON e.user_id IS NOT DISTINCT FROM s.uid
WHERE e.user_id IS NULL OR e.user_id < 20
GROUP BY e.user_id
"""

# Round-15 promotion (never driver-checked):
# Round-19 demotion (green r15-r18).
EXTRA_QUERIES["join_null_safe"] = join_null_safe
EXTRA_ORACLES["join_null_safe"] = JOIN_NULL_SAFE_ORACLE
