"""Core relational/aggregation queries (SURVEY.md §2.2-2.7).

Each query exercises a specific operator group from the reference's
inventory and has a DuckDB oracle twin. Column names are aliased
identically on both sides (driver hashes after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, davg_sql, dsum, dsum_sql
from ..operators.aggregates import pivot_counts, pivot_counts_sql, topk
from ..operators.relational import (
    ACCTBAL_BOUNDS,
    ACCTBAL_LABELS,
    bucket_column,
    bucket_sql_case,
    dim_join,
)
from ..sources import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
ORDER_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


# ---------------------------------------------------------------------------
# Flagship: condensed data_mart-shaped query (SURVEY.md §7.2).
# scan → CASE bucket (P7) → join (J2) → conditional agg (A3) → pivot (A2)
# → na.fill (P11) → multi-key full-outer merge (J4).
# Reference shape: data_mart/data_mart.scala:52-146.
# ---------------------------------------------------------------------------

def flagship_datamart(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    cust = customer.select(
        "c_custkey",
        bucket_column(F.col("c_acctbal"), ACCTBAL_BOUNDS, ACCTBAL_LABELS).alias(
            "acct_bucket"
        ),
    )
    # Conditional-agg side: revenue over finished orders per customer.
    agg_side = (
        orders.groupBy("o_custkey")
        .agg(
            dsum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
                    0.0
                )
            ).alias("revenue_f"),
            F.count(F.lit(1)).alias("orders_cnt"),
        )
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    # Pivot side: order-priority count matrix per customer.
    pivot_side = pivot_counts(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        key="c_custkey",
        pivot_col="o_orderpriority",
        values=ORDER_PRIORITIES,
        prefix="prio_",
    )
    # Customer attrs broadcast-joined onto the agg side, then a full-outer
    # merge of the two derived sides on the shared key (J4 shape).
    left = dim_join(agg_side, cust, on="c_custkey", how="left")
    merged = left.join(pivot_side, on="c_custkey", how="outer")
    return merged.na.fill(0).na.fill({"acct_bucket": "none"})


FLAGSHIP_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey,
         {bucket_sql_case('c_acctbal', ACCTBAL_BOUNDS, ACCTBAL_LABELS)} AS acct_bucket
  FROM customer
), agg_side AS (
  SELECT o_custkey AS c_custkey,
         {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS revenue_f,
         COUNT(*) AS orders_cnt
  FROM orders GROUP BY 1
), left_side AS (
  SELECT a.c_custkey, a.revenue_f, a.orders_cnt, COALESCE(c.acct_bucket, 'none') AS acct_bucket
  FROM agg_side a LEFT JOIN cust c USING (c_custkey)
), pivot_side AS (
  {pivot_counts_sql('(SELECT o_custkey AS c_custkey, o_orderpriority FROM orders)',
                    'c_custkey', 'o_orderpriority', ORDER_PRIORITIES, prefix='prio_')}
)
SELECT COALESCE(l.c_custkey, p.c_custkey) AS c_custkey,
       COALESCE(l.revenue_f, 0.0) AS revenue_f,
       COALESCE(l.orders_cnt, 0) AS orders_cnt,
       COALESCE(l.acct_bucket, 'none') AS acct_bucket,
       COALESCE(p.prio_1_urgent, 0) AS prio_1_urgent,
       COALESCE(p.prio_2_high, 0) AS prio_2_high,
       COALESCE(p.prio_3_medium, 0) AS prio_3_medium,
       COALESCE(p.prio_4_not_specified, 0) AS prio_4_not_specified,
       COALESCE(p.prio_5_low, 0) AS prio_5_low
FROM left_side l FULL OUTER JOIN pivot_side p ON l.c_custkey = p.c_custkey
"""


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): groupBy + sum/avg/count (A1, A5, F13).
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            # price(2dp)*(1-disc)(2dp)*(1+tax)(2dp) has exactly 6 decimal
            # places; scale must cover the exact width or …xx50 ties round
            # differently in Spark (HALF_UP) vs DuckDB (HALF_EVEN).
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Projection + filters (P1, P3, P5, P6): null predicate, equality, derive.
# ---------------------------------------------------------------------------

def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("user_id").isNotNull())
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "value",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )


FILTER_PROJECT_ORACLE = """
SELECT event_id, user_id, value,
       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
FROM events
WHERE user_id IS NOT NULL AND event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Dimension-chain join (J1-shape): fact ⋈ nation ⋈ region, broadcast dims.
# ---------------------------------------------------------------------------

def join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = dim_join(
        nation.withColumnRenamed("n_nationkey", "c_nationkey"),
        region.withColumnRenamed("r_regionkey", "n_regionkey"),
        on="n_regionkey",
    )
    return (
        dim_join(customer, dims, on="c_nationkey")
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            dsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


JOIN_DIMS_ORACLE = f"""
SELECT r_name, n_name,
       COUNT(*) AS customers,
       {dsum_sql('c_acctbal', 2)} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Left + multi-key outer joins (J2, J4).
# ---------------------------------------------------------------------------

def join_outer_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Two aggregate views of orders keyed by (custkey, status): one over
    # urgent priorities, one over low — full-outer merged on both keys.
    urgent = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("urgent_cnt"))
    )
    low = (
        orders.filter(F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"))
        .groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("low_cnt"))
    )
    return urgent.join(low, on=["o_custkey", "o_orderstatus"], how="outer").na.fill(0)


JOIN_OUTER_ORACLE = """
WITH urgent AS (
  SELECT o_custkey, o_orderstatus, COUNT(*) AS urgent_cnt
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  GROUP BY 1, 2
), low AS (
  SELECT o_custkey, o_orderstatus, COUNT(*) AS low_cnt
  FROM orders WHERE o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
  GROUP BY 1, 2
)
SELECT COALESCE(u.o_custkey, l.o_custkey) AS o_custkey,
       COALESCE(u.o_orderstatus, l.o_orderstatus) AS o_orderstatus,
       COALESCE(u.urgent_cnt, 0) AS urgent_cnt,
       COALESCE(l.low_cnt, 0) AS low_cnt
FROM urgent u FULL OUTER JOIN low l
  ON u.o_custkey = l.o_custkey AND u.o_orderstatus = l.o_orderstatus
"""


# ---------------------------------------------------------------------------
# Pivot (A2): users × event-type count matrix, explicit value list.
# ---------------------------------------------------------------------------

def pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return pivot_counts(
        events.filter(F.col("user_id").isNotNull()),
        key="user_id",
        pivot_col="event_type",
        values=EVENT_TYPES,
        prefix="ev_",
    )


PIVOT_ORACLE = pivot_counts_sql(
    "(SELECT user_id, event_type FROM events WHERE user_id IS NOT NULL)",
    "user_id",
    "event_type",
    EVENT_TYPES,
    prefix="ev_",
)


# ---------------------------------------------------------------------------
# Top-k (O2): top 25 parts by discounted revenue, deterministic tiebreak.
# ---------------------------------------------------------------------------

def topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    revenue = lineitem.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    return topk(revenue, order_col="revenue", k=25, tiebreak="l_partkey")


TOPK_ORACLE = f"""
SELECT l_partkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey ASC
LIMIT 25
"""


# ---------------------------------------------------------------------------
# Set ops (U1): split-by-predicate then unionByName (positional-union
# parity holds because both sides share one projection).
# ---------------------------------------------------------------------------

def union_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select("event_id", "user_id", "event_type", "value")
    views = base.filter(F.col("event_type") == "view")
    buys = base.filter(F.col("event_type") == "purchase")
    return views.unionByName(buys)


UNION_ORACLE = """
SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'view'
UNION ALL
SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# Distinct + scalar max (A7, A8, W1 idiomatic replacement): dataset-wide
# max event date stamped onto per-type counts via a broadcast cross-join
# instead of the reference's single-partition window
# (users_items/users_items.scala:28).
# ---------------------------------------------------------------------------

def distinct_max_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    max_date = events.agg(
        F.date_format(F.max("ts"), "yyyyMMdd").alias("max_date")
    )
    per_type = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return per_type.crossJoin(F.broadcast(max_date))


DISTINCT_MAX_ORACLE = """
SELECT event_type, COUNT(*) AS cnt,
       (SELECT strftime(MAX(ts), '%Y%m%d') FROM events) AS max_date
FROM events
GROUP BY event_type
"""


QUERIES = {
    "flagship_datamart": flagship_datamart,
}

ORACLES = {
    "flagship_datamart": FLAGSHIP_ORACLE,
}

# Demoted from driver slots (50-row cap): A7 distinct stays green via
# drop_duplicates_subset, W1 via window_maxdate_literal; this variant is
# still oracle-checked locally. Round-6 rotation: join_outer_multikey
# (J4, green r1-r4) demoted too — the multi-key outer-join family keeps
# driver coverage via flagship_datamart and scd2_customer.
# Round-7 rotation: pricing_summary (A3-A5), join_dims (J1/A1) and
# pivot_user_events (A2), all green r1-r4, demoted for never-checked
# flagships; their families keep driver rows via flagship_datamart
# (join+agg), cube_orders / windowed_revenue (conditional aggs) and
# user_time_matrix (wide conditional-agg pivot shape).
EXTRA_QUERIES = {
    "distinct_max_stamp": distinct_max_stamp,
    "join_outer_multikey": join_outer_multikey,
    "pricing_summary": pricing_summary,
    "join_dims": join_dims,
    "pivot_user_events": pivot_user_events,
}
EXTRA_ORACLES = {
    "distinct_max_stamp": DISTINCT_MAX_ORACLE,
    "join_outer_multikey": JOIN_OUTER_ORACLE,
    "pricing_summary": PRICING_ORACLE,
    "join_dims": JOIN_DIMS_ORACLE,
    "pivot_user_events": PIVOT_ORACLE,
}

# Round-6 rotation: filter_project / topk_parts / union_split carried
# green driver rows in rounds 1-4 and their P1-P6 / O1-O2 / U1
# machinery is also exercised by flagship_datamart and pricing_summary;
# demoted to free driver slots for never-checked flagship extras
# (graph_pagerank, text_gopher_rules, rollup_daily_revenue, ...).
# Still oracle-checked locally by tests/test_oracle_parity.py.
EXTRA_QUERIES["filter_project"] = filter_project
EXTRA_ORACLES["filter_project"] = FILTER_PROJECT_ORACLE
EXTRA_QUERIES["topk_parts"] = topk_parts
EXTRA_ORACLES["topk_parts"] = TOPK_ORACLE
EXTRA_QUERIES["union_split"] = union_split
EXTRA_ORACLES["union_split"] = UNION_ORACLE
