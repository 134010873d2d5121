"""SQL-entry-point queries: the same engine driven through
``spark.sql`` over registered views — Catalyst plans both identically,
and the oracle checks the SQL surface end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import dsum_sql
from ..sources.tables import register_views

SQL_REVENUE_BY_NATION = f"""
SELECT n_name,
       COUNT(*) AS orders_cnt,
       {dsum_sql('o_totalprice')} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
"""


def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_REVENUE_BY_NATION)


SQL_EVENT_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS buys
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT
  COUNT(*) AS users,
  CAST(SUM(CASE WHEN views > 0 THEN 1 ELSE 0 END) AS BIGINT) AS viewers,
  CAST(SUM(CASE WHEN buys > 0 THEN 1 ELSE 0 END) AS BIGINT) AS buyers,
  CAST(SUM(CASE WHEN views > 0 AND buys > 0 THEN 1 ELSE 0 END) AS BIGINT) AS converted
FROM per_user
"""


def sql_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_EVENT_FUNNEL)


# Round-7 rotation: sql_revenue_by_nation (TPC-H q5 shape, green
# r1-r4) demoted — the SQL surface keeps four driver rows
# (sql_cohort_retention + the three subquery-rewrite shapes).
QUERIES: dict = {}

# The Spark SQL strings are themselves ANSI enough for DuckDB.
ORACLES: dict = {}


# Cohort retention: users grouped by first-activity week, distinct
# actives per (cohort, week offset) — the standard product-analytics
# matrix. Day arithmetic instead of date_trunc('week', ...) so cohort
# boundaries are engine-independent.
SQL_COHORT_RETENTION = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), activity AS (
  SELECT e.user_id,
         CAST(FLOOR(DATEDIFF(f.first_day, DATE '2024-01-01') / 7.0) AS BIGINT)
           AS cohort_week,
         CAST(FLOOR(DATEDIFF(CAST(e.ts AS DATE), f.first_day) / 7.0) AS BIGINT)
           AS offset_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.user_id IS NOT NULL
)
SELECT cohort_week, offset_week,
       COUNT(DISTINCT user_id) AS active_users
FROM activity
GROUP BY cohort_week, offset_week
"""

# DuckDB twin: DATEDIFF(a, b) in Spark is a - b in days; DuckDB's
# date_diff takes (part, start, end).
SQL_COHORT_RETENTION_DUCKDB = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
), activity AS (
  SELECT e.user_id,
         CAST(FLOOR(date_diff('day', DATE '2024-01-01', f.first_day) / 7.0) AS BIGINT)
           AS cohort_week,
         CAST(FLOOR(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
           AS offset_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.user_id IS NOT NULL
)
SELECT cohort_week, offset_week,
       COUNT(DISTINCT user_id) AS active_users
FROM activity
GROUP BY cohort_week, offset_week
"""


def sql_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_COHORT_RETENTION)


# Round-5 rotation: sql_event_funnel (long-green, mere-presence funnel)
# demoted to an extra so its driver slot goes to the never-checked
# ordered funnel below; still oracle-checked in test_oracle_parity.
EXTRA_QUERIES = {
    "sql_event_funnel": sql_event_funnel,
    "sql_revenue_by_nation": sql_revenue_by_nation,
}
EXTRA_ORACLES = {
    "sql_event_funnel": SQL_EVENT_FUNNEL,
    "sql_revenue_by_nation": SQL_REVENUE_BY_NATION,
}

# Round-6 rotation: sql_cohort_retention promoted to a driver slot
# (never driver-checked; the registry's only cohort-analysis shape).
EXTRA_QUERIES["sql_cohort_retention"] = sql_cohort_retention
EXTRA_ORACLES["sql_cohort_retention"] = SQL_COHORT_RETENTION_DUCKDB


def session_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered in-session funnel: sessions (30-min gap) where a view is
    followed by a click is followed by a purchase, STRICTLY in time
    order (the plain funnel counts mere presence). One shuffle: events
    sessionize via a window, each session collects its sorted
    (ts, type) array, and the greedy stage timestamps are per-row array
    lookups — existence under greedy-earliest is exact."""
    from pyspark.sql import Window, functions as F

    from ..sources import load_table

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    # Timestamp subtraction yields a day-time interval under both
    # TIMESTAMP and TIMESTAMP_NTZ (a bigint cast analyzes only for the
    # former), so this stays valid whatever shape the events fixture
    # takes.
    new_sess = F.when(
        F.col("ts") - F.lag(F.col("ts")).over(w)
        > F.expr("INTERVAL 30 MINUTES"),
        1,
    ).otherwise(F.lit(1) - F.lag(F.lit(1)).over(w).isNotNull().cast("int"))
    sess = events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = sess.groupBy("user_id", "session_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("arr")
    )
    def first_after(kind, after):
        # F.get (0-based) is null on empty matches; element_at would
        # throw under ANSI for sessions that never reach the stage.
        return F.get(
            F.filter(
                F.col("arr"),
                lambda e: (e["event_type"] == kind)
                & (e["ts"] > after if after is not None else F.lit(True)),
            ),
            0,
        )["ts"]
    staged = (
        per.withColumn("tv", first_after("view", None))
        .withColumn("tc", first_after("click", F.col("tv")))
        .withColumn("tp", first_after("purchase", F.col("tc")))
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_view_click"),
        F.count("tp").alias("n_full_funnel"),
    )


SESSION_FUNNEL_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_type,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
), numbered AS (
  SELECT *, SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
), v AS (
  SELECT user_id, session_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv
  FROM numbered GROUP BY user_id, session_id
), c AS (
  SELECT v.user_id, v.session_id, v.tv,
         MIN(CASE WHEN n.event_type = 'click' AND n.ts > v.tv THEN n.ts END) AS tc
  FROM v JOIN numbered n USING (user_id, session_id)
  GROUP BY v.user_id, v.session_id, v.tv
), p AS (
  SELECT c.user_id, c.session_id, c.tv, c.tc,
         MIN(CASE WHEN n.event_type = 'purchase' AND n.ts > c.tc THEN n.ts END) AS tp
  FROM c JOIN numbered n USING (user_id, session_id)
  GROUP BY c.user_id, c.session_id, c.tv, c.tc
)
SELECT COUNT(*) AS n_sessions,
       COUNT(tv) AS n_view,
       COUNT(tc) AS n_view_click,
       COUNT(tp) AS n_full_funnel
FROM p
"""

# Promoted to a driver slot in round 5 (never driver-checked before).
EXTRA_QUERIES["session_funnel_ordered"] = session_funnel_ordered
EXTRA_ORACLES["session_funnel_ordered"] = SESSION_FUNNEL_ORACLE


# TPC-H Q3 shape (shipping priority), adapted to the fixture schema
# (o_orderpriority stands in for o_shippriority; timestamps, not
# dates). One SQL string drives BOTH engines — revenue goes through the
# dsum decimal rounding so the top-10 selection is order- and
# partitioning-independent, with an l_orderkey tiebreak for determinism.
SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_SHIPPING_PRIORITY)


# Round-18 rotation: promoted to a driver slot (never driver-checked;
# TPC-H Q3 shape — 3-way fact join + top-10 unshipped orders).
QUERIES["sql_shipping_priority"] = sql_shipping_priority
ORACLES["sql_shipping_priority"] = SQL_SHIPPING_PRIORITY


# TPC-H Q18 shape (large-volume customers): IN-subquery over a HAVING
# aggregate — the correlated-membership surface the other SQL queries
# don't exercise. Quantity sums go through the dsum decimal rounding so
# the HAVING cut is partitioning-independent in both engines.
SQL_BIG_ORDERS = f"""
SELECT c_name,
       o_orderkey,
       o_totalprice,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
WHERE o_orderkey IN (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING {dsum_sql('l_quantity')} > 300
)
"""


def sql_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_BIG_ORDERS)


EXTRA_QUERIES["sql_big_orders"] = sql_big_orders
EXTRA_ORACLES["sql_big_orders"] = SQL_BIG_ORDERS


# TPC-H Q4 shape (order-priority checking): EXISTS correlated subquery —
# the decorrelation surface Q18's IN-membership doesn't cover (Catalyst
# rewrites EXISTS to a left semi join; the orders scan never duplicates
# rows however many lineitems match). The fixture has no
# commit/receipt dates, so "late" = any line item shipped more than 60
# days after the order date. `INTERVAL 60 DAY` parses in both engines.
SQL_LATE_ORDERS_EXISTS = """
SELECT o_orderpriority,
       COUNT(*) AS late_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def sql_late_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_LATE_ORDERS_EXISTS)


# Round-6 rotation: promoted to a driver slot — the registry's only
# EXISTS-decorrelation shape, never driver-checked.
EXTRA_QUERIES["sql_late_orders_exists"] = sql_late_orders_exists
EXTRA_ORACLES["sql_late_orders_exists"] = SQL_LATE_ORDERS_EXISTS


# TPC-H Q16 shape (supplier counting with an exclusion list): NOT IN
# subquery — the null-aware anti-join surface. Catalyst plans NOT IN as
# a null-aware anti join (a plain anti join here, since s_suppkey is
# non-null); the supplier blocklist broadcasts, the fact side never
# moves for the exclusion. lineitem stands in for partsupp (the fixture
# has no partsupp table): a part's suppliers = distinct shipping
# suppliers.
SQL_PART_SUPPLIERS_ANTI = """
SELECT p_brand,
       p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
  AND p_size <= 10
GROUP BY p_brand, p_size
"""


def sql_part_suppliers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PART_SUPPLIERS_ANTI)


# Round-6 rotation: promoted — the only null-aware anti-join shape.
EXTRA_QUERIES["sql_part_suppliers_anti"] = sql_part_suppliers_anti
EXTRA_ORACLES["sql_part_suppliers_anti"] = SQL_PART_SUPPLIERS_ANTI


# Correlated SCALAR subqueries: orders worth more than 2× their own
# customer's average order value. Catalyst decorrelates each subquery
# into a grouped aggregate joined back on the correlation key — the
# third subquery rewrite family after IN (Q18) and EXISTS (Q4).
# The comparison is exact on both engines: instead of dividing (float
# averages are summation-order-dependent), both sides stay in integer/
# decimal arithmetic — price × count > 2 × decimal-exact sum.
SQL_ORDERS_ABOVE_CUSTOMER_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,4)) * (
        SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
      ) > 2 * (
        SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
      )
"""


def sql_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_ORDERS_ABOVE_CUSTOMER_AVG)


# Round-6 rotation: promoted — the only correlated-scalar-subquery shape.
# Round-12 rotation: demoted after 6 green driver rounds (r6-r11).
EXTRA_QUERIES["sql_orders_above_customer_avg"] = sql_orders_above_customer_avg
EXTRA_ORACLES["sql_orders_above_customer_avg"] = SQL_ORDERS_ABOVE_CUSTOMER_AVG


# Set operations beyond UNION (the reference stops at unionAll,
# SURVEY.md §2.7): INTERSECT and EXCEPT with ANSI distinct semantics —
# customers active in BOTH 1998 and 1999, minus any with a pending
# order. Parenthesized so precedence is explicit on both engines; both
# compile to aggregate-free semi/anti join shapes over the same scan.
SQL_CUSTOMER_SET_OPS = """
(SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1998
 INTERSECT
 SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999)
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


def sql_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_CUSTOMER_SET_OPS)


# Round-17 rotation: promoted (never driver-checked; INTERSECT/EXCEPT
# set-operator shapes).
QUERIES["sql_customer_set_ops"] = sql_customer_set_ops
ORACLES["sql_customer_set_ops"] = SQL_CUSTOMER_SET_OPS


def _rfm_sql(percentile_fn: str, datediff: str) -> str:
    """RFM segmentation shared shape; the two engines differ only in
    the percentile function name and day-difference spelling."""
    cuts = ", ".join(
        f"ROUND({percentile_fn}({m}, {q}), 4) AS {m[0]}{int(q * 100)}"
        for m in ("recency_days", "frequency", "monetary")
        for q in (0.33, 0.66)
    )

    def bucket(m):
        c = m[0]
        return (
            f"CASE WHEN {m} <= {c}33 THEN 1 "
            f"WHEN {m} <= {c}66 THEN 2 ELSE 3 END AS {c}_bucket"
        )

    return f"""
WITH purchases AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
), anchor AS (
  SELECT MAX(d) AS a FROM purchases
), per_user AS (
  SELECT user_id,
         {datediff} AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
  FROM purchases CROSS JOIN anchor
  GROUP BY user_id, anchor.a
), cuts AS (
  SELECT {cuts} FROM per_user
)
SELECT r_bucket, f_bucket, m_bucket, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (
  SELECT {bucket('recency_days')}, {bucket('frequency')},
         {bucket('monetary')}
  FROM per_user CROSS JOIN cuts
)
GROUP BY r_bucket, f_bucket, m_bucket
"""


# RFM (recency / frequency / monetary) segmentation — the classic mart
# query: per-user purchase stats cut at exact interpolated terciles.
# Cuts and the anchor date are one-row frames (broadcast cross joins —
# the documented tiny-broadcast pattern); monetary goes through the
# decimal-exact sum; cuts are rounded to 4 on both engines before the
# bucket comparison so boundary membership is engine-independent.
SQL_RFM_SEGMENTS = _rfm_sql("percentile", "DATEDIFF(anchor.a, MAX(d))")
SQL_RFM_SEGMENTS_DUCKDB = _rfm_sql(
    "quantile_cont", "date_diff('day', MAX(d), anchor.a)"
)


def sql_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_RFM_SEGMENTS)


# Round-6 rotation: promoted to a driver slot (per-verdict: never
# driver-checked; the interpolated-tercile RFM mart is the strongest
# percentile-parity check in the SQL surface).
# Round-13 rotation: demoted after 6 green driver rounds; still
# oracle-checked locally via tests/test_oracle_parity.py.
EXTRA_QUERIES["sql_rfm_segments"] = sql_rfm_segments
EXTRA_ORACLES["sql_rfm_segments"] = SQL_RFM_SEGMENTS_DUCKDB


# TPC-H Q8-shaped market share: the registry's only TWO-ROLE dimension
# join (nation joins once through the customer side and once through
# the supplier side — alias-disambiguated dims, the shape BI tools
# generate constantly). Revenue share of each supplier nation within
# each customer-region market per order year. Both nation sides are
# broadcast (25 rows); the only corpus shuffle is the final group-by.
SQL_MARKET_SHARE = """
SELECT cust_region,
       order_year,
       supp_nation,
       CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS nation_rev,
       ROUND(CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(SUM(CAST(rev AS DECIMAL(18,4)))) OVER (
                 PARTITION BY cust_region, order_year) AS DOUBLE), 6)
         AS market_share
FROM (
  SELECT r.r_name AS cust_region,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
         sn.n_name AS supp_nation,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
) base
GROUP BY cust_region, order_year, supp_nation
"""


def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_MARKET_SHARE)


# Round-6 rotation: promoted to a driver slot (per-verdict: never
# driver-checked; TPC-H Q8 shape, the registry's only two-role
# dimension join).
# Round-13 rotation: demoted after 6 green driver rounds; still
# oracle-checked locally via tests/test_oracle_parity.py.
EXTRA_QUERIES["sql_market_share"] = sql_market_share
EXTRA_ORACLES["sql_market_share"] = SQL_MARKET_SHARE


# TPC-H Q13 shape (customer order-count distribution): the registry's
# only filtered LEFT OUTER join whose NULL-extension feeds a
# count-of-counts histogram — customers with NO qualifying orders must
# appear as c_count = 0, which an inner join silently drops (the
# classic Q13 trap). The join-time predicate (exclude low-priority
# orders) must live in the ON clause, not WHERE, to preserve those
# customers. Scale: customer/orders shuffle once on custkey; the
# second aggregation runs over one row per customer.
SQL_CUSTDIST = """
SELECT c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority NOT LIKE '%LOW%'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


def sql_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_CUSTDIST)


# Round-16 rotation: promoted to a driver slot (never driver-checked).
QUERIES["sql_custdist"] = sql_custdist
ORACLES["sql_custdist"] = SQL_CUSTDIST


# TPC-H Q11 shape (important stock): per-part revenue from the
# lineitems of one nation's suppliers, kept only when it exceeds a
# fixed fraction of that nation's total — the registry's only
# uncorrelated scalar subquery inside HAVING. Both engines push the
# same decimal-exact per-part sums; the scalar total is one broadcast
# row. Engine-exactness: revenue summed as decimal(18,4) per part and
# for the global threshold, double only at the final comparison/emit.
SQL_IMPORTANT_PARTS = """
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS part_rev
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
GROUP BY l_partkey
HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
       > (
  SELECT SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
         * 0.001
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
"""


def sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_IMPORTANT_PARTS)


EXTRA_QUERIES["sql_important_parts"] = sql_important_parts
EXTRA_ORACLES["sql_important_parts"] = SQL_IMPORTANT_PARTS


# TPC-H Q21 shape (suppliers who kept orders waiting): the DOUBLE
# correlated subquery — EXISTS(another supplier touched the order) AND
# NOT EXISTS(another supplier was ALSO late) — the one decorrelation
# surface the Q4/Q16/Q18 shapes don't cover (Catalyst plans it as a
# semi join plus an anti join on the same key, both shuffle-free on a
# bucketed l_orderkey at scale). The fixture has no
# commit/receipt dates, so "late" = shipped > 45 days after the order
# date; the inner late-check re-joins orders inside the subquery so the
# only correlation is the equi l_orderkey (both engines decorrelate
# equality-correlated subqueries; Spark rejects non-equi outer refs).
SQL_WAITING_SUPPLIERS = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY
  )
GROUP BY s_name
"""


def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_WAITING_SUPPLIERS)


# Round-17 rotation: promoted (never driver-checked; the TPC-H Q21
# double-EXISTS/NOT-EXISTS shape).
QUERIES["sql_waiting_suppliers"] = sql_waiting_suppliers
ORACLES["sql_waiting_suppliers"] = SQL_WAITING_SUPPLIERS


# TPC-H Q22 shape (global sales opportunity): an UNCORRELATED SCALAR
# subquery (the above-average cut — planned as a broadcast scalar, no
# cross join) plus a NOT EXISTS anti join — customers with
# above-average balances and no RECENT order (every fixture customer
# has some order, so Q22's literal "never ordered" would be vacuous;
# "idle since 1999" keeps the identical plan shape non-empty), grouped
# by segment (the fixture has no phone country codes). Balance sums
# ride the dsum decimal pattern, and the above-average threshold is the
# multiply-based EXACT form (bal x count > sum — the
# SQL_ORDERS_ABOVE_CUSTOMER_AVG pattern): Spark evaluates the decimal
# AVG exactly while DuckDB averages in floating point, so the divided
# form applied two different cutoffs across engines (round-13 review).
SQL_IDLE_RICH_CUSTOMERS = f"""
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       {dsum_sql('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (
    SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0
  ) > (
    SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  )
GROUP BY c_mktsegment
"""


def sql_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_IDLE_RICH_CUSTOMERS)


# Round-14 rotation: promoted (never driver-checked; the anti-join +
# HAVING shape was touched by the dea0e7e fix wave) in place of the
# demoted backlog_open_lineitems.
# Round-18 rotation: demoted after 4 green driver rounds (r14-r17).
EXTRA_QUERIES["sql_idle_rich_customers"] = sql_idle_rich_customers
EXTRA_ORACLES["sql_idle_rich_customers"] = SQL_IDLE_RICH_CUSTOMERS


# TPC-H Q7 shape (volume shipping / cross-nation trade flows): the
# same dimension table joined TWICE under different roles (supplier
# nation, customer nation) with a symmetric pair predicate — the
# self-aliased-dimension surface none of the other SQL shapes covers.
# Both nation sides broadcast; the fact side shuffles once per equi
# join, never for the pair filter.
SQL_NATION_TRADE_FLOWS = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def sql_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_NATION_TRADE_FLOWS)


# Round-19 rotation: promoted (never driver-checked).
QUERIES["sql_nation_trade_flows"] = sql_nation_trade_flows
ORACLES["sql_nation_trade_flows"] = SQL_NATION_TRADE_FLOWS


# TPC-H Q2 shape (min-cost supplier): a CORRELATED SCALAR subquery —
# each part keeps the supplier(s) whose account balance equals the MAX
# over that part's own shippers (lineitem stands in for partsupp).
# Catalyst decorrelates the scalar MAX into an aggregate + join; the
# membership filter never duplicates fact rows.
SQL_BEST_SUPPLIER_PER_PART = """
SELECT p_partkey, s_name, s_acctbal
FROM part
JOIN lineitem ON l_partkey = p_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 10
  AND s_acctbal = (
    SELECT MAX(s2.s_acctbal)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    WHERE l2.l_partkey = p_partkey
  )
GROUP BY p_partkey, s_name, s_acctbal
"""


def sql_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_BEST_SUPPLIER_PER_PART)


EXTRA_QUERIES["sql_best_supplier_per_part"] = sql_best_supplier_per_part
EXTRA_ORACLES["sql_best_supplier_per_part"] = SQL_BEST_SUPPLIER_PER_PART


# TPC-H Q15 shape (top supplier): aggregate-of-aggregate — a revenue
# CTE per supplier, then tie-preserving membership against the MAX of
# that CTE (Q15's view + scalar-subquery structure).
SQL_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_TOP_SUPPLIER)


# Round-18 rotation: promoted (never driver-checked; TPC-H Q15 shape
# — scalar-subquery max over a revenue view).
QUERIES["sql_top_supplier"] = sql_top_supplier
ORACLES["sql_top_supplier"] = SQL_TOP_SUPPLIER


# TPC-H Q10 shape (returned-item reporting): revenue lost to returns
# per customer, top 20 — a 4-table join funneled through
# TakeOrderedAndProject (ORDER BY + LIMIT never global-sorts the
# aggregate). Ties on revenue broken by custkey so the LIMIT edge is
# engine-deterministic.
SQL_RETURNED_ITEM_LOSS = f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def sql_returned_item_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_RETURNED_ITEM_LOSS)


EXTRA_QUERIES["sql_returned_item_loss"] = sql_returned_item_loss
EXTRA_ORACLES["sql_returned_item_loss"] = SQL_RETURNED_ITEM_LOSS


# TPC-H Q14 shape (promotion effect): conditional-sum ratio — promo
# revenue share of a one-quarter window. The division's operands are
# both dsum-exact, so the ratio hashes identically.
SQL_PROMO_REVENUE_SHARE = f"""
SELECT ROUND(100.0 * {dsum_sql(
    "CASE WHEN p_type = 'PROMO' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
         / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6)
         AS promo_revenue_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


def sql_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PROMO_REVENUE_SHARE)


# Round-19 rotation: promoted (never driver-checked).
QUERIES["sql_promo_revenue_share"] = sql_promo_revenue_share
ORACLES["sql_promo_revenue_share"] = SQL_PROMO_REVENUE_SHARE


# TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
# OR-of-ANDs across two tables — the predicate-pushdown stress case
# (Catalyst must split the disjunction into per-scan filters plus a
# join-level residual; a naive planner reads both tables in full).
SQL_DISJUNCTIVE_REVENUE = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 25 AND 50)
"""


def sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_DISJUNCTIVE_REVENUE)


EXTRA_QUERIES["sql_disjunctive_revenue"] = sql_disjunctive_revenue
EXTRA_ORACLES["sql_disjunctive_revenue"] = SQL_DISJUNCTIVE_REVENUE


# TPC-H Q6 shape (forecasting revenue change): the pure single-scan
# predicate aggregate — no join at all; the whole query must collapse
# to a parquet scan with every predicate pushed + one partial/final
# agg pair (the simplest shape worth plan-locking at 100 TB).
SQL_FORECAST_REVENUE_CHANGE = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue_delta,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def sql_forecast_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_FORECAST_REVENUE_CHANGE)


# Round-10 rotation: promoted to a driver slot (never driver-checked).
# Round-15 demotion (green driver rows in 4 rounds):
EXTRA_QUERIES["sql_forecast_revenue_change"] = sql_forecast_revenue_change
EXTRA_ORACLES["sql_forecast_revenue_change"] = SQL_FORECAST_REVENUE_CHANGE


# TPC-H Q20 shape (dominant supplier): a CORRELATED AGGREGATE in the
# predicate — suppliers who shipped an outsized share (>15%; the
# fixture's supplier-part quantities are near-uniform, max share
# ~0.245, so Q20's literal one-half cut would be vacuous) of a part's
# total quantity (partsupp-free adaptation). The inner per-(part) total and
# the outer per-(part, supplier) sum decorrelate into two aggregates
# joined on the part key.
SQL_DOMINANT_SUPPLIERS = """
SELECT s_suppkey, s_name, l_partkey AS partkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS supp_qty
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
GROUP BY s_suppkey, s_name, l_partkey
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > (
    SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) * 0.15
    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
"""


def sql_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_DOMINANT_SUPPLIERS)


# Round-16 rotation: demoted after 5 green driver rounds (r11-r15) —
# still oracle-checked locally by tests/test_oracle_parity.py.
EXTRA_QUERIES["sql_dominant_suppliers"] = sql_dominant_suppliers
EXTRA_ORACLES["sql_dominant_suppliers"] = SQL_DOMINANT_SUPPLIERS


# TPC-H Q5 shape (local supplier volume): the LOCAL-trade predicate —
# customer and supplier must sit in the SAME nation — expressed as an
# extra equi-key on the supplier join (c_nationkey = s_nationkey), plus
# a region filter reached through two dimension hops. Catalyst
# broadcasts the nation/region dims and AQE picks broadcast for
# supplier/customer at bench SF; the only big shuffle is the
# orders⋈lineitem key. Completes the 22-shape TPC-H sweep together
# with Q9/Q12/Q17 below (reference has no SQL surface at all — this
# family is the engine's ANSI-SQL parity evidence).
SQL_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_LOCAL_SUPPLIER_VOLUME)


EXTRA_QUERIES["sql_local_supplier_volume"] = sql_local_supplier_volume
EXTRA_ORACLES["sql_local_supplier_volume"] = SQL_LOCAL_SUPPLIER_VOLUME


# TPC-H Q9 shape (product-type profit): a five-way join whose measure
# MIXES columns from two fact-side tables (lineitem revenue minus a
# cost term built from part), under a part-NAME substring filter.
# partsupp (and with it ps_supplycost) is absent from the fixture —
# the cost term substitutes p_retailprice * 0.4 * l_quantity, keeping
# the shape (cross-table arithmetic inside the aggregated expression)
# while staying honest about the stand-in, like the other
# partsupp-free adaptations (sql_important_parts et al.). All-double
# arithmetic inside, per-row decimal rounding at the sum: order- and
# engine-independent.
SQL_PRODUCT_TYPE_PROFIT = f"""
SELECT nation, o_year,
       {dsum_sql(
           'l_extendedprice * (1 - l_discount) '
           '- p_retailprice * 0.4 * l_quantity'
       )} AS sum_profit
FROM (
  SELECT n_name AS nation,
         year(o_orderdate) AS o_year,
         l_extendedprice, l_discount, p_retailprice, l_quantity
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


def sql_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PRODUCT_TYPE_PROFIT)


# Round-18 rotation: promoted (never driver-checked; TPC-H Q9 shape —
# 5-way join with computed profit and per-nation/year rollup).
QUERIES["sql_product_type_profit"] = sql_product_type_profit
ORACLES["sql_product_type_profit"] = SQL_PRODUCT_TYPE_PROFIT


# TPC-H Q12 shape (shipmode / order-priority checking): one fact join
# + per-group CONDITIONAL COUNTS keyed on an attribute of the OTHER
# table (order priority counted per lineitem group). The fixture has
# no l_shipmode/l_commitdate/l_receiptdate; l_returnflag stands in as
# the grouping attribute and the ship-date year bounds the scan —
# same shape: the counts pivot the joined-in dimension attribute, one
# shuffle on the group key after map-side partials.
SQL_PRIORITY_SHIPMENTS = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


def sql_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_PRIORITY_SHIPMENTS)


# Round-19 rotation: promoted (never driver-checked).
QUERIES["sql_priority_shipments"] = sql_priority_shipments
ORACLES["sql_priority_shipments"] = SQL_PRIORITY_SHIPMENTS


# TPC-H Q17 shape (small-quantity-order revenue): a correlated
# per-part AVERAGE in the predicate — keep lineitems whose quantity is
# below 20% of their part's average — decorrelated into one per-part
# aggregate joined back to the fact (same decorrelation Catalyst
# applies to the textbook correlated form; written decorrelated so
# both engines run the identical plan shape). The 0.2·avg comparison
# is done in EXACT arithmetic (l_quantity · 5 · count < sum, all
# decimal) — a double avg would be engine-order-dependent at ties.
# p_brand stands in for Q17's brand+container filter pair.
SQL_SMALL_QTY_REVENUE = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS agg_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty,
         COUNT(*) AS cnt_qty
  FROM lineitem
  GROUP BY l_partkey
) part_agg ON agg_partkey = l_partkey
WHERE p_brand IN ('Brand#1', 'Brand#2')
  AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * cnt_qty < sum_qty
GROUP BY p_brand
"""


def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_SMALL_QTY_REVENUE)


EXTRA_QUERIES["sql_small_qty_revenue"] = sql_small_qty_revenue
EXTRA_ORACLES["sql_small_qty_revenue"] = SQL_SMALL_QTY_REVENUE


# TPC-DS Q36-shaped rollup ranking (round 13): ROLLUP over
# (nation, order_year) with GROUPING()-derived level, then RANK and a
# share-of-parent ratio against each row's TRUE parent in the rollup
# hierarchy (detail -> nation subtotal -> grand total; round-13 review
# fixed the original lvl,nation partition, which made every subtotal's
# share a degenerate 1.0) — the "rank categories inside their hierarchy
# level" report every BI cube emits.
# No other registry query composes grouping-set flags with windows over
# the rollup output. Window partitions are bounded (level x nation:
# <= 25 x years rows regardless of corpus). NULLS FIRST is explicit:
# Spark defaults ASC to NULLS FIRST, DuckDB to NULLS LAST — the rollup
# NULLs make the tiebreak engine-divergent without it.
SQL_ROLLUP_RANK_SHARE = """
WITH base AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS order_year,
         o.o_totalprice AS price
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), agg AS (
  SELECT nation, order_year,
         CAST(GROUPING(nation) * 2 + GROUPING(order_year) AS INTEGER)
           AS lvl,
         SUM(CAST(price AS DECIMAL(18,2))) AS rev_dec
  FROM base
  GROUP BY ROLLUP(nation, order_year)
), shared AS (
  -- parent partition: a detail row's parent is its nation subtotal;
  -- a nation subtotal's parent is the grand total (PARTITION BY lvl
  -- alone); the grand total is its own parent (ratio 1). Window-sum
  -- the DECIMAL and cast AFTER (order-independent; the house rule).
  SELECT nation, order_year, lvl,
         CAST(rev_dec AS DOUBLE) AS rev_d,
         CAST(SUM(rev_dec) OVER (
           PARTITION BY lvl,
                        CASE WHEN lvl = 0 THEN nation END
         ) AS DOUBLE) AS parent_rev
  FROM agg
)
SELECT nation, order_year, lvl,
       ROUND(rev_d, 2) AS rev,
       CAST(RANK() OVER (
         PARTITION BY lvl
         ORDER BY rev_d DESC,
                  nation ASC NULLS FIRST,
                  order_year ASC NULLS FIRST) AS BIGINT) AS lvl_rank,
       ROUND(rev_d / parent_rev, 6) AS share_of_parent
FROM shared
"""


def sql_rollup_rank_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_ROLLUP_RANK_SHARE)


# Round-14 rotation: promoted (never driver-checked; its true-rollup
# parents were rewritten in dea0e7e — the post-fix semantics deserve
# the hard signal) in place of the demoted event_trigrams.
# Round-18 rotation: demoted after 4 green driver rounds (r14-r17).
EXTRA_QUERIES["sql_rollup_rank_share"] = sql_rollup_rank_share
EXTRA_ORACLES["sql_rollup_rank_share"] = SQL_ROLLUP_RANK_SHARE
