"""SCD2 merge query: a versioned customer dimension (with pre-existing
history rows) updated by a batch containing changed, unchanged, and
brand-new keys — every branch of operators/scd.scd2_apply fires."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scd import OPEN_END, scd2_apply, scd2_apply_sql
from ..sources import load_table

LOAD_DATE = "2024-06-01"
ATTRS = ("name", "acctbal")

# dim: every customer current since 2024-01-01; customers with
# custkey % 11 == 0 also carry one closed history version (balance -50).
DIM_SQL = f"""
SELECT c_custkey AS cust_key, c_name AS name, ROUND(c_acctbal, 2) AS acctbal,
       '2024-01-01' AS effective_from, '{OPEN_END}' AS effective_to,
       TRUE AS is_current
FROM customer
UNION ALL
SELECT c_custkey, c_name, ROUND(c_acctbal - 50, 2),
       '2023-01-01', '2024-01-01', FALSE
FROM customer WHERE c_custkey % 11 = 0
"""

# updates: % 7 keys change balance (+100), % 5 == 1 keys arrive
# unchanged (no-op branch), % 97 keys spawn new customers.
UPDATES_SQL = """
SELECT c_custkey AS cust_key, c_name AS name,
       ROUND(c_acctbal + 100, 2) AS acctbal
FROM customer WHERE c_custkey % 7 = 0
UNION ALL
SELECT c_custkey, c_name, ROUND(c_acctbal, 2)
FROM customer WHERE c_custkey % 5 = 1 AND c_custkey % 7 <> 0
UNION ALL
SELECT c_custkey + 1000000, 'NEW_' || c_name, 0.0
FROM customer WHERE c_custkey % 97 = 0
"""


def _dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cur = c.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("2024-01-01").alias("effective_from"),
        F.lit(OPEN_END).alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    hist = c.filter(F.col("c_custkey") % 11 == 0).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") - 50, 2).alias("acctbal"),
        F.lit("2023-01-01").alias("effective_from"),
        F.lit("2024-01-01").alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    return cur.unionByName(hist)


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    changed = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") + 100, 2).alias("acctbal"),
    )
    same = c.filter(
        (F.col("c_custkey") % 5 == 1) & (F.col("c_custkey") % 7 != 0)
    ).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    new = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("cust_key"),
        F.concat(F.lit("NEW_"), F.col("c_name")).alias("name"),
        F.lit(0.0).alias("acctbal"),
    )
    return changed.unionByName(same).unionByName(new)


def scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_apply(
        _dim(spark, sf_dir),
        _updates(spark, sf_dir),
        key="cust_key",
        attrs=list(ATTRS),
        load_date=LOAD_DATE,
    )


SCD2_ORACLE = scd2_apply_sql(
    DIM_SQL, UPDATES_SQL, key="cust_key", attrs=list(ATTRS), load_date=LOAD_DATE
)

# scd2_customer promoted to a driver slot round 4 (type-2 slowly-
# changing-dimension apply — a merge shape nothing else in the
# registry exercises). Round-12 rotation: demoted after 7 green driver
# rounds (r4-r11) — the longest tenure in the registry; stays
# oracle-checked locally.
QUERIES: dict = {}
ORACLES: dict[str, str] = {}
EXTRA_QUERIES: dict = {"scd2_customer": scd2_customer}
EXTRA_ORACLES: dict[str, str] = {"scd2_customer": SCD2_ORACLE}


# Snapshot diff fixture: "yesterday" = the customer table; "today" =
# %7 balances drift (+100), %13 customers churn out, %97 spawn new
# accounts — all four change classes fire.
OLD_SNAP_SQL = """
SELECT c_custkey AS cust_key, c_name AS name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
"""

NEW_SNAP_SQL = """
SELECT c_custkey AS cust_key, c_name AS name,
       CASE WHEN c_custkey % 7 = 0 THEN ROUND(c_acctbal + 100, 2)
            ELSE ROUND(c_acctbal, 2) END AS acctbal
FROM customer WHERE c_custkey % 13 <> 0
UNION ALL
SELECT c_custkey + 1000000, 'NEW_' || c_name, 0.0
FROM customer WHERE c_custkey % 97 = 0
"""


def scd_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day snapshot diff (CDC without a log): one full outer
    join classifying added / removed / changed / unchanged keys."""
    from ..operators.scd import table_diff

    c = load_table(spark, sf_dir, "customer")
    old = c.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    kept = c.filter(F.col("c_custkey") % 13 != 0).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.when(
            F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 100, 2)
        )
        .otherwise(F.round("c_acctbal", 2))
        .alias("acctbal"),
    )
    born = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("cust_key"),
        F.concat(F.lit("NEW_"), F.col("c_name")).alias("name"),
        F.lit(0.0).alias("acctbal"),
    )
    return table_diff(
        old, kept.unionByName(born), key="cust_key", attrs=["name", "acctbal"]
    )


def _table_diff_oracle() -> str:
    from ..operators.scd import table_diff_sql

    return table_diff_sql(
        OLD_SNAP_SQL, NEW_SNAP_SQL, key="cust_key", attrs=["name", "acctbal"]
    )


# Round-16 rotation: promoted to a driver slot (never driver-checked).
QUERIES["scd_table_diff"] = scd_table_diff
ORACLES["scd_table_diff"] = _table_diff_oracle()


def scd2_customer_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the applied SCD2 history: the dimension as it
    stood ON the load date — new/changed rows (effective that day) are
    in, rows closed that day are out; boundary semantics of the
    half-open validity interval exercised exactly."""
    from ..operators.scd import scd2_as_of

    return scd2_as_of(scd2_customer(spark, sf_dir), LOAD_DATE)


SCD2_ASOF_ORACLE = f"""
SELECT * FROM ({SCD2_ORACLE})
WHERE CAST(effective_from AS DATE) <= DATE '{LOAD_DATE}'
  AND (effective_to IS NULL OR CAST(effective_to AS DATE) > DATE '{LOAD_DATE}')
"""

# Round-13 rotation: promoted to a driver slot (per round-12 verdict:
# never driver-checked; the as-of slice over the SCD2 interval build).
# Round-18 rotation: demoted after 5 green driver rounds (r13-r17).
EXTRA_QUERIES["scd2_customer_asof"] = scd2_customer_asof
EXTRA_ORACLES["scd2_customer_asof"] = SCD2_ASOF_ORACLE


def feature_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store correctness join: each purchase event is enriched
    with the customer's account balance AS OF the event time from the
    applied SCD2 history — the point-in-time join that prevents
    training-serving skew (a model trained with today's balance on last
    year's purchase leaks the future). The validity-interval band join
    is an equi-join on the key plus an interval predicate; the history
    side is one row per (key, version), small enough to broadcast at
    dimension scale, and events never shuffle twice. January-2024
    events deterministically hit the pre-update version of every
    customer the June-2024 load later changed — the lookback the
    operator exists to get right. Output: per-version-date rollup of
    matched purchases and their as-of balance sum.
    """
    hist = scd2_customer(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    )
    ev_day = F.col("ts").cast("date")
    joined = events.join(
        F.broadcast(hist),
        (events.user_id == hist.cust_key)
        & (ev_day >= F.col("effective_from").cast("date"))
        & (ev_day < F.col("effective_to").cast("date")),
    )
    return joined.groupBy("effective_from").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.count_distinct(F.col("cust_key")).alias("n_customers"),
        F.sum(F.col("acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("asof_balance_sum"),
    )


FEATURE_PIT_ORACLE = f"""
WITH hist AS ({SCD2_ORACLE})
SELECT effective_from,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT h.cust_key) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(h.acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS asof_balance_sum
FROM events e
JOIN hist h
  ON e.user_id = h.cust_key
 AND CAST(e.ts AS DATE) >= CAST(h.effective_from AS DATE)
 AND CAST(e.ts AS DATE) < CAST(h.effective_to AS DATE)
WHERE e.event_type = 'purchase' AND e.user_id IS NOT NULL
GROUP BY effective_from
"""

# Round-7 driver rotation: promoted (never driver-checked; the
# training-serving-skew-correct PIT join is a flagship feature-store
# shape) in place of the demoted user_time_matrix.
# Round-14: demoted after 6 green rounds; slot funds sim_semdedup_report.
EXTRA_QUERIES["feature_point_in_time"] = feature_point_in_time
EXTRA_ORACLES["feature_point_in_time"] = FEATURE_PIT_ORACLE


# ---------------------------------------------------------------------------
# CDC changelog apply: type-1 latest-wins MERGE with deletes (round 7)
# ---------------------------------------------------------------------------


def cdc_apply_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changelog to a base table with MERGE semantics —
    the type-1 complement to scd2_customer (type-2 keeps history; this
    is the latest-wins compaction a Debezium/Delta-style ingest runs):
    per key, only the LAST change matters — an upsert overwrites the
    tracked attribute, a delete removes the row, untouched base rows
    pass through.

    Changelog fixture (deterministic from testdata): every order is a
    change to its customer, sequenced by (o_orderdate, o_orderkey);
    'F'-status changes are deletes, others upsert acctbal :=
    o_totalprice. Scale shape: ONE window over the changelog
    partitioned by the (uniform) key picks the latest change, then ONE
    full outer join onto base — no iteration, no skew; this is exactly
    how a log-structured table compacts at 100 TB.
    """
    from ..operators.scd import cdc_latest_wins

    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    log = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_key"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
        F.round("o_totalprice", 2).alias("new_acctbal"),
        "o_orderdate",
        "o_orderkey",
    )
    return cdc_latest_wins(base, log)


CDC_APPLY_ORACLE = """
WITH base AS (
  SELECT c_custkey AS cust_key, c_name AS name,
         ROUND(c_acctbal, 2) AS acctbal
  FROM customer
), log AS (
  SELECT o_custkey AS cust_key,
         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
         ROUND(o_totalprice, 2) AS new_acctbal,
         o_orderdate, o_orderkey
  FROM orders
), latest AS (
  SELECT cust_key, op, new_acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY cust_key
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM log
  ) WHERE rn = 1
)
SELECT COALESCE(b.cust_key, l.cust_key) AS cust_key,
       COALESCE(b.name, 'NEW#' || CAST(l.cust_key AS VARCHAR)) AS name,
       COALESCE(l.new_acctbal, b.acctbal) AS acctbal,
       COALESCE(l.op, 'KEEP') AS last_op
FROM base b FULL OUTER JOIN latest l ON l.cust_key = b.cust_key
WHERE l.op IS NULL OR l.op <> 'D'
"""

# Round-9 driver rotation: cdc_apply_customer promoted (never
# driver-checked; latest-wins type-1 MERGE with all 4 branches
# test-locked).
# Round-15 demotion (green driver rows in 5 rounds):
EXTRA_QUERIES["cdc_apply_customer"] = cdc_apply_customer
EXTRA_ORACLES["cdc_apply_customer"] = CDC_APPLY_ORACLE
