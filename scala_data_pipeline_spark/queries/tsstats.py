"""Time-series anomaly detection, survival analysis, forensic DQ.

- **Rolling z-score anomalies** (`anomaly_daily_revenue`): daily
  revenue vs its trailing-28-day mean/std. The rolling moments come
  from DECIMAL partial sums (Σx, Σx²) over an integer-day RANGE frame,
  so every engine sees the identical exact sums; the mean/variance
  division happens once, in double, in the same expression shape on
  both sides — partitioning- and engine-invariant. Scale shape: one
  corpus-sized groupBy to the daily grain, then windows over DAYS
  (thousands of rows at 100 TB — negligible; partition by series key
  when there are many series).
- **Kaplan-Meier survival** (`survival_km_users`): user-retention
  curve with right-censoring (users still active near the corpus edge
  are censored, not dead — dropping them would bias retention down,
  the standard KM motivation). S(t) = Π_{tᵢ≤t} (1 - dᵢ/nᵢ) computed as
  exp(Σ ln(1-d/n)) — the log-sum form is a cumulative window over the
  handful of distinct lifetimes, identical in both engines. At-risk
  counts nᵢ fall out of one cumulative count window, no self-join.
  (Kaplan & Meier, "Nonparametric Estimation from Incomplete
  Observations", JASA 1958.)
- **Benford first-digit audit** (`benford_prices`): observed
  first-significant-digit distribution of order totals vs Benford's
  log10(1+1/d) expectation with per-digit chi-square contributions —
  the classic fabricated-data screen. One scan, one 9-row aggregate.

All three are single-pass / daily-grain plans; none shuffles the
corpus more than once. Beyond-reference surface (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}

ANOM_WINDOW_DAYS = 28
ANOM_Z = 2.5


def anomaly_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    daily = orders.groupBy(day.alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    w = (
        Window.orderBy("day")
        .rangeBetween(-(ANOM_WINDOW_DAYS - 1), Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("rev").over(w).cast("double")
    ss = (
        F.sum((F.col("rev") * F.col("rev")).cast("decimal(38,8)"))
        .over(w)
        .cast("double")
    )
    mean = s / n
    # sample variance from exact partial sums; guard the 1-row frame
    var = F.when(n > 1, (ss - s * s / n) / (n - 1)).otherwise(F.lit(0.0))
    z = F.when(
        var > 0, (F.col("rev").cast("double") - mean) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return daily.select(
        F.col("day").cast("long").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(z, 4).alias("z28"),
        (F.abs(z) > ANOM_Z).alias("is_anomaly"),
    )


ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
), win AS (
  SELECT day, rev,
         COUNT(*) OVER w AS n,
         CAST(SUM(rev) OVER w AS DOUBLE) AS s,
         CAST(SUM(CAST(rev * rev AS DECIMAL(38,8))) OVER w AS DOUBLE) AS ss
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN {ANOM_WINDOW_DAYS - 1} PRECEDING
               AND CURRENT ROW)
)
SELECT day,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CASE WHEN n > 1 AND (ss - s * s / n) / (n - 1) > 0
                  THEN (CAST(rev AS DOUBLE) - s / n)
                       / sqrt((ss - s * s / n) / (n - 1))
                  ELSE 0.0 END, 4) AS z28,
       CASE WHEN n > 1 AND (ss - s * s / n) / (n - 1) > 0
            THEN abs((CAST(rev AS DOUBLE) - s / n)
                     / sqrt((ss - s * s / n) / (n - 1))) > {ANOM_Z}
            ELSE FALSE END AS is_anomaly
FROM win
"""

KM_CENSOR_DAYS = 14


def survival_km_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-retention curve over event-activity lifetimes.

    Lifetime = days between a user's first and last event. Users whose
    last event falls within ``KM_CENSOR_DAYS`` of the corpus's max
    timestamp are right-censored (they may still be active). One
    row per distinct death time: at-risk count, deaths, and the KM
    survival estimate.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    per_user = events.groupBy("user_id").agg(
        F.datediff(
            F.max("ts").cast("date"), F.min("ts").cast("date")
        ).alias("lifetime"),
        F.max("ts").alias("last_ts"),
    )
    horizon = events.agg(
        F.date_sub(F.max("ts").cast("date"), KM_CENSOR_DAYS).alias("edge")
    )
    subjects = per_user.crossJoin(F.broadcast(horizon)).select(
        "lifetime",
        (F.col("last_ts").cast("date") <= F.col("edge")).alias("died"),
    )
    # one row per distinct lifetime: deaths and total leavers
    grouped = subjects.groupBy("lifetime").agg(
        F.sum(F.when(F.col("died"), 1).otherwise(0)).alias("deaths"),
        F.count(F.lit(1)).alias("leavers"),
    )
    w_prev = Window.orderBy("lifetime").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # at-risk = everyone minus those who left at strictly earlier times;
    # the total comes from a window too, keeping the query single-pass
    at_risk = F.sum("leavers").over(Window.partitionBy()) - F.coalesce(
        F.sum("leavers").over(w_prev), F.lit(0)
    )
    w_cum = Window.orderBy("lifetime").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = F.exp(
        F.sum(
            F.log(
                F.lit(1.0)
                - F.col("deaths").cast("double") / F.col("at_risk")
            )
        ).over(w_cum)
    )
    return (
        grouped.withColumn("at_risk", at_risk)
        .where(F.col("deaths") > 0)  # KM steps only at death times
        .select(
            F.col("lifetime").cast("long").alias("lifetime_days"),
            F.col("at_risk").cast("long").alias("at_risk"),
            F.col("deaths").cast("long").alias("deaths"),
            F.round(km, 6).alias("survival"),
        )
    )


KM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         datediff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
           AS lifetime,
         MAX(ts) AS last_ts
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), horizon AS (
  SELECT MAX(CAST(ts AS DATE)) - INTERVAL {KM_CENSOR_DAYS} DAY AS edge
  FROM events WHERE user_id IS NOT NULL
), subjects AS (
  SELECT lifetime,
         CAST(last_ts AS DATE) <= (SELECT CAST(edge AS DATE) FROM horizon)
           AS died
  FROM per_user
), grouped AS (
  SELECT lifetime,
         SUM(CASE WHEN died THEN 1 ELSE 0 END) AS deaths,
         COUNT(*) AS leavers
  FROM subjects GROUP BY lifetime
), curve AS (
  SELECT lifetime, deaths,
         SUM(leavers) OVER ()
           - COALESCE(SUM(leavers) OVER (ORDER BY lifetime
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS at_risk
  FROM grouped
), km AS (
  SELECT lifetime, deaths, at_risk,
         exp(SUM(ln(1.0 - CAST(deaths AS DOUBLE) / at_risk))
             OVER (ORDER BY lifetime
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS survival
  FROM curve
)
SELECT CAST(lifetime AS BIGINT) AS lifetime_days,
       CAST(at_risk AS BIGINT) AS at_risk,
       CAST(deaths AS BIGINT) AS deaths,
       ROUND(survival, 6) AS survival
FROM km WHERE deaths > 0
"""


def benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law, with per-digit chi-square contributions."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    )
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    )
    counts = orders.groupBy(digit.cast("int").alias("digit")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = Window.partitionBy()
    observed = F.col("n") / F.sum("n").over(total)
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi2 = (
        (observed - expected) * (observed - expected) / expected
    )
    return counts.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(observed, 6).alias("observed_freq"),
        F.round(expected, 6).alias("benford_freq"),
        F.round(chi2, 8).alias("chi2_term"),
    )


BENFORD_ORACLE = """
WITH counts AS (
  SELECT CAST(floor(o_totalprice
               / power(10.0, floor(log10(o_totalprice)))) AS INTEGER)
           AS digit,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_totalprice > 0
  GROUP BY 1
)
SELECT digit, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_freq,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_freq,
       ROUND((CAST(n AS DOUBLE) / SUM(n) OVER ()
                 - log10(1.0 + 1.0 / digit))
             * (CAST(n AS DOUBLE) / SUM(n) OVER ()
                 - log10(1.0 + 1.0 / digit))
             / log10(1.0 + 1.0 / digit), 8) AS chi2_term
FROM counts
"""

EXTRA_QUERIES["anomaly_daily_revenue"] = anomaly_daily_revenue
EXTRA_ORACLES["anomaly_daily_revenue"] = ANOMALY_ORACLE
EXTRA_QUERIES["survival_km_users"] = survival_km_users
EXTRA_ORACLES["survival_km_users"] = KM_ORACLE
EXTRA_QUERIES["benford_prices"] = benford_prices
EXTRA_ORACLES["benford_prices"] = BENFORD_ORACLE
