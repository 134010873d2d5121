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


QUERIES = {
    "sql_revenue_by_nation": sql_revenue_by_nation,
    "sql_event_funnel": sql_event_funnel,
}

# The Spark SQL strings are themselves ANSI enough for DuckDB.
ORACLES = {
    "sql_revenue_by_nation": SQL_REVENUE_BY_NATION,
    "sql_event_funnel": SQL_EVENT_FUNNEL,
}


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


EXTRA_QUERIES = {"sql_cohort_retention": sql_cohort_retention}
EXTRA_ORACLES = {"sql_cohort_retention": SQL_COHORT_RETENTION_DUCKDB}
