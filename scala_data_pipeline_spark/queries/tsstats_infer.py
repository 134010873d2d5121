"""Statistical-inference and drift analytics over the event/order
corpora — the round-7 family split out of queries/tsstats.py (r17
verdict item 8: 3,355 lines / 50 defs was the next maintenance
hotspot; pure hygiene, registry names unchanged).

Families: KS two-sample drift (+ the streaming drift sink's shared
kernels), ACF, TWAP, Benjamini-Hochberg FDR over the Welch t-test
family, Cramér's V / mutual information, pairwise KS scans, Spearman
rank correlation, STL-lite seasonal decomposition, cohort LTV, rolling
and lead-lag correlation, activity heat maps. Beyond-reference surface
(SURVEY.md §6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .tsstats import WELCH_ORACLE, ab_welch_value

QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}

# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample drift (round 7)
# ---------------------------------------------------------------------------


def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    `value` distributions of click vs view events — the
    distribution-level drift detector that complements the categorical
    chi-square in drift_priority_mix (a mean shift chi-square can't
    see, a shape change a t-test can't see; KS sees both).

    D = max over x of |ECDF_click(x) - ECDF_view(x)|, computed exactly:
    one conditional aggregate to per-distinct-value counts (the only
    corpus-sized shuffle; values are cent-quantized so the grain is
    the bounded price domain, not the event count), one cumulative
    window over that value grain, one max. Also emits the scaled
    statistic sqrt(n·m/(n+m))·D (the asymptotic Kolmogorov argument —
    > ~1.36 rejects at α=0.05).

    Engine-exactness: ECDFs are ratios of exact longs (deterministic
    double division); D and the scaling are rounded to 6.
    """
    ev = load_table(spark, sf_dir, "events")
    return ks_from_value_counts(ks_value_counts(ev))


def ks_value_counts(events: DataFrame) -> DataFrame:
    """The mergeable-partial half of the KS statistic: per-distinct-
    value click/view counts. Longs are exactly additive, so per-micro-
    batch partial frames merged by summation are BIT-IDENTICAL to one
    batch pass — the continuous drift-monitor shape
    (streaming/drift_sink.py maintains this frame incrementally)."""
    # NULL observations are EXCLUDED (round-13 review): they are not
    # values of the distribution, and Spark's cumulative window would
    # order them FIRST while DuckDB orders them LAST — an engine
    # divergence in every intermediate ECDF gap. Same convention as
    # ab_welch_value.
    return (
        events.filter(
            F.col("event_type").isin("click", "view")
            & F.col("value").isNotNull()
        )
        .groupBy(F.col("value").cast("decimal(18,2)").alias("v"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("c_click"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("c_view"),
        )
    )


def ks_from_value_counts(per_val: DataFrame) -> DataFrame:
    """Finish the KS statistic from a (v, c_click, c_view) count frame
    — shared verbatim by the batch query and the streaming merge-on-
    read path, so the two agree by construction."""
    # Value-grain cumulative window (bounded domain — the
    # anomaly_daily_revenue "windows over DAYS" precedent).
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    n_click = F.sum("c_click").over(tot)
    n_view = F.sum("c_view").over(tot)
    diff = F.abs(
        F.sum("c_click").over(w_cum).cast("double") / n_click.cast("double")
        - F.sum("c_view").over(w_cum).cast("double") / n_view.cast("double")
    )
    stepped = per_val.select(
        diff.alias("diff"),
        n_click.alias("n_click"),
        n_view.alias("n_view"),
    )
    return stepped.groupBy("n_click", "n_view").agg(
        F.round(F.max("diff"), 6).alias("ks_d"),
        F.round(
            F.max("diff")
            * F.sqrt(
                F.first("n_click").cast("double")
                * F.first("n_view").cast("double")
                / (F.first("n_click") + F.first("n_view")).cast("double")
            ),
            6,
        ).alias("ks_scaled"),
    )


KS_ORACLE = """
WITH per_val AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_click,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS c_view
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
  GROUP BY 1
), stepped AS (
  SELECT ABS(
           CAST(SUM(c_click) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(c_click) OVER () AS DOUBLE)
           - CAST(SUM(c_view) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(c_view) OVER () AS DOUBLE)) AS diff,
         CAST(SUM(c_click) OVER () AS BIGINT) AS n_click,
         CAST(SUM(c_view) OVER () AS BIGINT) AS n_view
  FROM per_val
)
SELECT n_click, n_view,
       ROUND(MAX(diff), 6) AS ks_d,
       ROUND(MAX(diff) * SQRT(CAST(MIN(n_click) AS DOUBLE)
             * CAST(MIN(n_view) AS DOUBLE)
             / CAST(MIN(n_click) + MIN(n_view) AS DOUBLE)), 6) AS ks_scaled
FROM stepped GROUP BY n_click, n_view
"""

# Round-9 driver rotation: ks_value_drift promoted (never
# driver-checked; exact 2-sample KS over the bounded cent-value grain).
# Round-15 demotion (green driver rows in 5 rounds):
EXTRA_QUERIES["ks_value_drift"] = ks_value_drift
EXTRA_ORACLES["ks_value_drift"] = KS_ORACLE


# ---------------------------------------------------------------------------
# Autocorrelation function of daily revenue (round 7)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1..7 — the
    weekly-seasonality detector in its classical form (dow_seasonality
    shows WHICH weekday is hot; a spike of the ACF at lag 7 shows THAT
    the series is weekly-periodic, and at lag 1 how sticky it is).
    Standard biased estimator ρ(k) = Σ(dev_t·dev_{t-k}) / Σ dev_t².

    Scale shape: one corpus-sized groupBy to the daily grain; mean,
    lags and the lag-term explode all run on the bounded DAYS frame
    (the anomaly_daily_revenue precedent). Engine-exactness: daily
    revenue is an exact decimal sum; the mean is one double division
    of identical operands; deviations and lag products are rounded to
    8 and summed as decimals (order-independent); the final ratio is
    rounded to 6.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    tot = Window.partitionBy()
    mean = F.sum("rev").over(tot).cast("double") / F.count(F.lit(1)).over(tot)
    dev = daily.select(
        "day", F.round(F.col("rev").cast("double") - mean, 8).alias("dev")
    )
    w_day = Window.orderBy("day")
    lagged = dev.select(
        "dev",
        *[
            F.lag("dev", k).over(w_day).alias(f"dev_{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    terms = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.round(
                            F.col("dev")
                            * (
                                F.col("dev")
                                if k == 0
                                else F.col(f"dev_{k}")
                            ),
                            8,
                        ).alias("term"),
                    )
                    for k in range(0, ACF_MAX_LAG + 1)
                ]
            )
        ).alias("t")
    ).select("t.lag", "t.term")
    sums = (
        terms.filter(F.col("term").isNotNull())
        .groupBy("lag")
        .agg(F.sum(F.col("term").cast("decimal(38,8)")).alias("s"))
    )
    den = F.max(F.when(F.col("lag") == 0, F.col("s"))).over(
        Window.partitionBy()
    )
    return (
        sums.withColumn("den", den)
        .filter(F.col("lag") >= 1)
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.round(
                F.col("s").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
    )


def _acf_oracle() -> str:
    term_selects = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, ROUND(dev * "
        + ("dev" if k == 0 else f"lag(dev, {k}) OVER (ORDER BY day)")
        + ", 8) AS term FROM dev"
        for k in range(0, ACF_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
), dev AS (
  SELECT day,
         ROUND(CAST(rev AS DOUBLE)
               - CAST(SUM(rev) OVER () AS DOUBLE) / COUNT(*) OVER (), 8)
           AS dev
  FROM daily
), terms AS (
  {term_selects}
), sums AS (
  SELECT lag, SUM(CAST(term AS DECIMAL(38,8))) AS s
  FROM terms WHERE term IS NOT NULL GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag,
       ROUND(CAST(s AS DOUBLE)
             / CAST((SELECT s FROM sums WHERE lag = 0) AS DOUBLE), 6) AS acf
FROM sums WHERE lag >= 1
"""


# Round-12 rotation: promoted to a driver slot (never driver-checked;
# the registry's only autocorrelation / lagged-self-join shape).
# Round-17 rotation: demoted after multiple green driver rounds.
EXTRA_QUERIES["acf_daily_revenue"] = acf_daily_revenue
EXTRA_ORACLES["acf_daily_revenue"] = _acf_oracle()


# ---------------------------------------------------------------------------
# Time-weighted average value per user (round 7)
# ---------------------------------------------------------------------------


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user (TWAP): each event's
    value holds until the user's next event, weighted by that holding
    duration — the correct "average state" statistic when observations
    arrive irregularly (a plain AVG over-weights bursts; TWAP is what
    pricing, telemetry and session-quality pipelines actually want).

    Scale shape: one user-partitioned lead window + one groupBy on the
    SAME key — Catalyst reuses the window's hash partitioning for the
    aggregate, so the corpus shuffles once. Durations are exact
    integer microseconds (no CAST(ts AS BIGINT); unix_micros on the
    load_table-normalized timestamp), value is cent-exact decimal, so
    the weighted sum is an exact decimal both engines agree on; the
    one division is double, rounded to 6. Users with a single event
    have no holding interval and are excluded (n_intervals >= 1).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    stepped = ev.select(
        "user_id",
        (F.unix_micros(nxt) - F.unix_micros(F.col("ts"))).alias("dur_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    ).filter(F.col("dur_us").isNotNull())
    agg = stepped.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("v") * F.col("dur_us")).alias("num"),
        F.sum("dur_us").cast("long").alias("den_us"),
    )
    # try_divide: a user whose kept intervals are all zero-length
    # (same-timestamp events — the event_id tiebreak exists because
    # ties are in the data contract) has den_us = 0; NULL twap matches
    # the DuckDB twin instead of an ANSI throw (round-13 review).
    return agg.select(
        "user_id",
        "n_intervals",
        F.round(
            F.try_divide(
                F.col("num").cast("double"), F.col("den_us").cast("double")
            ),
            6,
        ).alias("twap_value"),
    )


TWAP_ORACLE = """
WITH stepped AS (
  SELECT user_id,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dur_us,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE user_id IS NOT NULL
), agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_intervals,
         SUM(v * dur_us) AS num,
         CAST(SUM(dur_us) AS BIGINT) AS den_us
  FROM stepped WHERE dur_us IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_intervals,
       ROUND(CAST(num AS DOUBLE) / CAST(den_us AS DOUBLE), 6) AS twap_value
FROM agg
"""

# Round-17 rotation: promoted (never driver-checked; time-weighted
# average over irregular event intervals).
QUERIES["twap_user_value"] = twap_user_value
ORACLES["twap_user_value"] = TWAP_ORACLE


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over the Welch t-test family (round 7)
# ---------------------------------------------------------------------------

_BH_Q = 0.05
_INV_SQRT2 = 0.7071067811865476
# Abramowitz & Stegun 7.1.26 erf polynomial (max abs error 1.5e-7 —
# invisible at the 6-decimal rounding below).
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _p_two_sided(t_col):
    """Two-sided normal-approximation p-value from a t statistic:
    p = erfc(|t|/sqrt(2)) via the A&S 7.1.26 polynomial — plain
    double arithmetic (mul/add/exp) in the SAME expression shape on
    both engines, over the already-rounded t_stat, then rounded to 6;
    a last-ulp exp() difference cannot surface at that scale."""
    x = F.abs(t_col) * _INV_SQRT2
    u = 1.0 / (1.0 + _AS_P * x)
    poly = u * (
        _AS_A[0]
        + u * (_AS_A[1] + u * (_AS_A[2] + u * (_AS_A[3] + u * _AS_A[4])))
    )
    return F.round(poly * F.exp(-x * x), 6)


def ab_welch_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the pairwise Welch
    t-test family (Benjamini & Hochberg, JRSS-B 1995) — the multiple-
    testing correction a scan that fires thousands of A/B comparisons
    needs: at q=0.05, raw per-test thresholds would produce ~5% false
    discoveries among the nulls REGARDLESS of how many tests ran.

    Composes ab_welch_value's constant-size pair frame: normal-approx
    two-sided p (valid here — every Welch df is huge), rank by p
    ascending, step-up rule "reject ranks 1..k where k = max{i : p_i <=
    (i/m)q}". All windows run over the 10-row test family.
    """
    wel = ab_welch_value(spark, sf_dir)
    m = F.count(F.lit(1)).over(Window.partitionBy())
    w_rank = Window.orderBy(
        F.col("p_value").asc(), F.col("type_a").asc(), F.col("type_b").asc()
    )
    ranked = (
        wel.select(
            "type_a",
            "type_b",
            "t_stat",
            _p_two_sided(F.col("t_stat")).alias("p_value"),
        )
        .withColumn("m", m)
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn(
            "bh_crit",
            F.round(
                F.col("rank").cast("double") / F.col("m").cast("double")
                * _BH_Q,
                6,
            ),
        )
    )
    k = F.max(
        F.when(F.col("p_value") <= F.col("bh_crit"), F.col("rank")).otherwise(
            0
        )
    ).over(Window.partitionBy())
    return ranked.withColumn("k", k).select(
        "type_a",
        "type_b",
        "t_stat",
        "p_value",
        F.col("rank").cast("int").alias("rank"),
        "bh_crit",
        (F.col("rank") <= F.col("k")).alias("significant"),
    )


def _welch_fdr_oracle() -> str:
    x = f"(ABS(t_stat) * {_INV_SQRT2!r})"
    u = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    poly = (
        f"({u} * ({_AS_A[0]!r} + {u} * ({_AS_A[1]!r} + {u} * "
        f"({_AS_A[2]!r} + {u} * ({_AS_A[3]!r} + {u} * {_AS_A[4]!r})))))"
    )
    p = f"ROUND({poly} * EXP(-{x} * {x}), 6)"
    return f"""
WITH wel AS ({WELCH_ORACLE}),
scored AS (
  SELECT type_a, type_b, t_stat, {p} AS p_value FROM wel
), ranked AS (
  SELECT *,
         COUNT(*) OVER () AS m,
         ROW_NUMBER() OVER (ORDER BY p_value ASC, type_a ASC, type_b ASC)
           AS rank
  FROM scored
), crit AS (
  SELECT *,
         ROUND(CAST(rank AS DOUBLE) / CAST(m AS DOUBLE) * {_BH_Q!r}, 6)
           AS bh_crit
  FROM ranked
)
SELECT type_a, type_b, t_stat, p_value,
       CAST(rank AS INTEGER) AS rank, bh_crit,
       rank <= MAX(CASE WHEN p_value <= bh_crit THEN rank ELSE 0 END)
                 OVER () AS significant
FROM crit
"""


# Round-9 driver rotation: ab_welch_fdr promoted (never driver-checked;
# Welch t per brand + Benjamini-Hochberg FDR — the BH step rank window
# runs over the bounded 25-brand grain).
# Round-15 demotion (green driver rows in 5 rounds):
EXTRA_QUERIES["ab_welch_fdr"] = ab_welch_fdr
EXTRA_ORACLES["ab_welch_fdr"] = _welch_fdr_oracle()


# ---------------------------------------------------------------------------
# Categorical association: Cramér's V + mutual information (round 7)
# ---------------------------------------------------------------------------


def assoc_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strength-of-association between order priority and order status:
    chi-square, Cramér's V (chi-square normalized to [0,1] — comparable
    across tables of different size/shape) and mutual information in
    bits (the information-theoretic view; 0 iff independent). The
    drift tests say WHETHER two categoricals co-move; this measures
    HOW MUCH — the feature-redundancy screen a feature store runs
    before shipping two nearly-identical columns.

    Scale shape: one corpus-sized groupBy to the contingency grain
    (r·c ≤ 15 rows here); every total/marginal/term runs on that tiny
    frame via windows. Engine-exactness: counts are exact longs,
    per-cell terms are rounded to 8 and decimal-summed, finals rounded
    to 6.
    """
    orders = load_table(spark, sf_dir, "orders")
    cont = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = Window.partitionBy()
    w_pri = Window.partitionBy("pri")
    w_st = Window.partitionBy("st")
    n = F.sum("cnt").over(tot)
    row_t = F.sum("cnt").over(w_pri)
    col_t = F.sum("cnt").over(w_st)
    r = F.size(F.collect_set("pri").over(tot))
    c = F.size(F.collect_set("st").over(tot))
    e = row_t.cast("double") * col_t.cast("double") / n.cast("double")
    chi_term = F.round(
        (F.col("cnt").cast("double") - e) * (F.col("cnt").cast("double") - e)
        / e,
        8,
    )
    p_xy = F.col("cnt").cast("double") / n.cast("double")
    p_x = row_t.cast("double") / n.cast("double")
    p_y = col_t.cast("double") / n.cast("double")
    mi_term = F.round(p_xy * F.log2(p_xy / (p_x * p_y)), 8)
    cells = cont.select(
        n.alias("n"),
        r.alias("r"),
        c.alias("c"),
        chi_term.cast("decimal(18,8)").alias("chi_term"),
        mi_term.cast("decimal(18,8)").alias("mi_term"),
    )
    return cells.groupBy("n", "r", "c").agg(
        F.round(F.sum("chi_term").cast("double"), 6).alias("chi_square"),
        F.round(
            F.sqrt(
                F.sum("chi_term").cast("double")
                / (
                    F.first("n").cast("double")
                    * (F.least(F.first("r"), F.first("c")) - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
        F.round(F.sum("mi_term").cast("double"), 6).alias("mi_bits"),
    ).select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("int").alias("r"),
        F.col("c").cast("int").alias("c"),
        "chi_square",
        "cramers_v",
        "mi_bits",
    )


ASSOC_ORACLE = """
WITH cont AS (
  SELECT o_orderpriority AS pri, o_orderstatus AS st,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
), cells AS (
  SELECT
    SUM(cnt) OVER () AS n,
    (SELECT COUNT(DISTINCT pri) FROM cont) AS r,
    (SELECT COUNT(DISTINCT st) FROM cont) AS c,
    CAST(ROUND(
      (CAST(cnt AS DOUBLE)
        - CAST(SUM(cnt) OVER (PARTITION BY pri) AS DOUBLE)
          * CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE)
          / CAST(SUM(cnt) OVER () AS DOUBLE))
      * (CAST(cnt AS DOUBLE)
        - CAST(SUM(cnt) OVER (PARTITION BY pri) AS DOUBLE)
          * CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE)
          / CAST(SUM(cnt) OVER () AS DOUBLE))
      / (CAST(SUM(cnt) OVER (PARTITION BY pri) AS DOUBLE)
         * CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE)
         / CAST(SUM(cnt) OVER () AS DOUBLE)), 8) AS DECIMAL(18,8))
      AS chi_term,
    CAST(ROUND(
      (CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE))
      * log2((CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE))
             / ((CAST(SUM(cnt) OVER (PARTITION BY pri) AS DOUBLE)
                 / CAST(SUM(cnt) OVER () AS DOUBLE))
                * (CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE)
                   / CAST(SUM(cnt) OVER () AS DOUBLE)))), 8)
      AS DECIMAL(18,8)) AS mi_term
  FROM cont
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(r AS INTEGER) AS r,
       CAST(c AS INTEGER) AS c,
       ROUND(CAST(SUM(chi_term) AS DOUBLE), 6) AS chi_square,
       ROUND(SQRT(CAST(SUM(chi_term) AS DOUBLE)
             / (CAST(MIN(n) AS DOUBLE) * (LEAST(MIN(r), MIN(c)) - 1))), 6)
         AS cramers_v,
       ROUND(CAST(SUM(mi_term) AS DOUBLE), 6) AS mi_bits
FROM cells GROUP BY n, r, c
"""

EXTRA_QUERIES["assoc_priority_status"] = assoc_priority_status
EXTRA_ORACLES["assoc_priority_status"] = ASSOC_ORACLE


# ---------------------------------------------------------------------------
# Pairwise KS drift scan over all event types (round 7)
# ---------------------------------------------------------------------------

_KS_TYPES = ("click", "error", "purchase", "signup", "view")


def ks_pairwise_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-pair KS distance matrix over the five event types' value
    distributions — the distributional analogue of ab_welch_value's
    pairwise mean scan (and the input ab_welch_fdr-style corrections
    consume when the pair family is large). One corpus pass builds the
    per-type counts on the bounded value grain; all 10 pairwise ECDF
    gaps fall out of ONE set of cumulative windows over that grain —
    the corpus is never re-scanned per pair.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_KS_TYPES) & F.col("value").isNotNull()
    )
    counts = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"c_{t}")
        for t in _KS_TYPES
    ]
    grain = ev.groupBy(
        F.col("value").cast("decimal(18,2)").alias("v")
    ).agg(*counts)
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    # windows must materialize before the explode can reference them
    with_cdfs = grain.select(
        *[
            (
                F.sum(f"c_{t}").over(w_cum).cast("double")
                / F.sum(f"c_{t}").over(tot).cast("double")
            ).alias(f"cdf_{t}")
            for t in _KS_TYPES
        ]
    )
    pair_structs = [
        F.struct(
            F.lit(a).alias("type_a"),
            F.lit(b).alias("type_b"),
            F.abs(F.col(f"cdf_{a}") - F.col(f"cdf_{b}")).alias("diff"),
        )
        for i, a in enumerate(_KS_TYPES)
        for b in _KS_TYPES[i + 1 :]
    ]
    stepped = with_cdfs.select(
        F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.type_a", "p.type_b", "p.diff")
    return stepped.groupBy("type_a", "type_b").agg(
        F.round(F.max("diff"), 6).alias("ks_d")
    )


def _ks_pairwise_oracle() -> str:
    count_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c_{t}"
        for t in _KS_TYPES
    )
    cdf = {
        t: (
            f"(CAST(SUM(c_{t}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW) AS DOUBLE) "
            f"/ CAST(SUM(c_{t}) OVER () AS DOUBLE))"
        )
        for t in _KS_TYPES
    }
    pair_rows = "\n  UNION ALL ".join(
        f"SELECT '{a}' AS type_a, '{b}' AS type_b, "
        f"ABS({cdf[a]} - {cdf[b]}) AS diff FROM grain"
        for i, a in enumerate(_KS_TYPES)
        for b in _KS_TYPES[i + 1 :]
    )
    types = ", ".join(f"'{t}'" for t in _KS_TYPES)
    return f"""
WITH grain AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         {count_cols}
  FROM events WHERE event_type IN ({types}) AND value IS NOT NULL
  GROUP BY 1
), stepped AS (
  {pair_rows}
)
SELECT type_a, type_b, ROUND(MAX(diff), 6) AS ks_d
FROM stepped GROUP BY type_a, type_b
"""


# Round-19 rotation: promoted (never driver-checked).
QUERIES["ks_pairwise_events"] = ks_pairwise_events
ORACLES["ks_pairwise_events"] = _ks_pairwise_oracle()


# ---------------------------------------------------------------------------
# Spearman rank correlation per brand (round 7)
# ---------------------------------------------------------------------------


def spearman_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Spearman rank correlation of part size vs retail
    price — the monotone-association complement to the Pearson fit in
    regress_brand_price (Pearson sees only LINEAR relationships;
    Spearman catches any monotone one and shrugs off outliers).
    Computed as Pearson over tie-averaged ranks (the exact definition
    with ties): rank(x) = average row_number within each tied value
    group, from two brand-partitioned windows; the correlation then
    reuses the decimal-partial closed form on the ranked frame. All
    windows are brand-partitioned — no global sort.
    """
    part = load_table(spark, sf_dir, "part")

    def avg_rank(col: str) -> F.Column:
        rn = F.row_number().over(
            Window.partitionBy("p_brand").orderBy(
                F.col(col).asc(), F.col("p_partkey").asc()
            )
        )
        return F.avg(rn).over(Window.partitionBy("p_brand", col))

    ranked = part.select(
        "p_brand",
        avg_rank("p_size").alias("rx"),
        avg_rank("p_retailprice").alias("ry"),
    )
    x = F.col("rx").cast("decimal(18,4)")
    y = F.col("ry").cast("decimal(18,4)")
    sums = ranked.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,8)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,8)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,8)")).cast("double").alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        # try_divide: a constant-size brand has zero rank variance —
        # NULL rho (undefined correlation; matches DuckDB) instead of
        # an ANSI throw (round-13 review).
        F.round(F.try_divide(cov, den), 6).alias("spearman_rho"),
    )


SPEARMAN_ORACLE = """
WITH ranked AS (
  SELECT p_brand,
         AVG(rnx) OVER (PARTITION BY p_brand, p_size) AS rx,
         AVG(rny) OVER (PARTITION BY p_brand, p_retailprice) AS ry
  FROM (
    SELECT p_brand, p_size, p_retailprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY p_size ASC, p_partkey ASC) AS DOUBLE) AS rnx,
           CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
               ORDER BY p_retailprice ASC, p_partkey ASC) AS DOUBLE) AS rny
    FROM part
  )
), sums AS (
  SELECT p_brand,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(rx AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ry AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(rx AS DECIMAL(18,4))
                       * CAST(ry AS DECIMAL(18,4)) AS DECIMAL(38,8)))
              AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(rx AS DECIMAL(18,4))
                       * CAST(rx AS DECIMAL(18,4)) AS DECIMAL(38,8)))
              AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(ry AS DECIMAL(18,4))
                       * CAST(ry AS DECIMAL(18,4)) AS DECIMAL(38,8)))
              AS DOUBLE) AS syy
  FROM ranked GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS spearman_rho
FROM sums
"""

# Round-19 rotation: promoted (never driver-checked).
QUERIES["spearman_brand_price"] = spearman_brand_price
ORACLES["spearman_brand_price"] = SPEARMAN_ORACLE


# ---------------------------------------------------------------------------
# STL-lite seasonal decomposition of daily revenue (round 7)
# ---------------------------------------------------------------------------


def seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily-revenue series:
    trend = centered 7-day moving average (full windows only),
    seasonal = mean detrended value per day-of-week re-centered to sum
    to zero, residual = the rest — the explainability layer under the
    anomaly detector (a z-score spike that the seasonal term explains
    is a Tuesday, not an incident). Everything after the one
    corpus-sized groupBy runs on the DAYS grain; means are ratios of
    decimal sums over exact counts, every emitted component rounded
    to 6 in the same expression shape as the oracle.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    trend = F.when(
        F.count(F.lit(1)).over(w7) == 7,
        F.round(
            F.sum("rev").over(w7).cast("double") / 7,
            6,
        ),
    )
    detr = daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        trend.alias("trend"),
    ).withColumn(
        "detrended",
        F.round(F.col("revenue") - F.col("trend"), 6),
    )
    w_dow = Window.partitionBy(F.dayofweek("day"))
    tot = Window.partitionBy()
    dow_mean = F.round(
        F.sum(F.col("detrended").cast("decimal(18,6)")).over(w_dow).cast(
            "double"
        )
        / F.count("detrended").over(w_dow),
        6,
    )
    with_dow = detr.withColumn("dow_mean", dow_mean)
    # Re-center so the seasonal component carries no level: subtract
    # the mean of the 7 per-DOW means (computed over DISTINCT dows).
    grand = F.round(
        F.sum(
            F.when(
                F.row_number().over(
                    Window.partitionBy(F.dayofweek("day")).orderBy("day")
                )
                == 1,
                F.col("dow_mean"),
            ).cast("decimal(18,6)")
        ).over(tot).cast("double")
        / 7,
        6,
    )
    return (
        with_dow.withColumn("grand", grand)
        .select(
            "day",
            F.round("revenue", 6).alias("revenue"),
            "trend",
            F.round(F.col("dow_mean") - F.col("grand"), 6).alias("seasonal"),
            F.round(
                F.col("revenue")
                - F.col("trend")
                - (F.col("dow_mean") - F.col("grand")),
                6,
            ).alias("residual"),
        )
        .filter(F.col("trend").isNotNull())
    )


SEASONAL_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1
), detr AS (
  SELECT day,
         CAST(rev AS DOUBLE) AS revenue,
         CASE WHEN COUNT(*) OVER w7 = 7
              THEN ROUND(CAST(SUM(rev) OVER w7 AS DOUBLE) / 7, 6)
         END AS trend
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), with_det AS (
  SELECT *, ROUND(revenue - trend, 6) AS detrended FROM detr
), with_dow AS (
  SELECT *,
         ROUND(CAST(SUM(CAST(detrended AS DECIMAL(18,6)))
                 OVER (PARTITION BY dayofweek(day)) AS DOUBLE)
               / COUNT(detrended) OVER (PARTITION BY dayofweek(day)), 6)
           AS dow_mean,
         ROW_NUMBER() OVER (PARTITION BY dayofweek(day) ORDER BY day)
           AS dow_rn
  FROM with_det
), with_grand AS (
  SELECT *,
         ROUND(CAST(SUM(CASE WHEN dow_rn = 1
                 THEN CAST(dow_mean AS DECIMAL(18,6)) END) OVER ()
               AS DOUBLE) / 7, 6) AS grand
  FROM with_dow
)
SELECT day,
       ROUND(revenue, 6) AS revenue,
       trend,
       ROUND(dow_mean - grand, 6) AS seasonal,
       ROUND(revenue - trend - (dow_mean - grand), 6) AS residual
FROM with_grand WHERE trend IS NOT NULL
"""

# Round-16 rotation: promoted to a driver slot (never driver-checked).
QUERIES["seasonal_decompose_revenue"] = seasonal_decompose_revenue
ORACLES["seasonal_decompose_revenue"] = SEASONAL_ORACLE


# ---------------------------------------------------------------------------
# Cohort LTV curves (round 7)
# ---------------------------------------------------------------------------


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per signup cohort by account age — the LTV
    curve that prices acquisition (retention says users STAY; LTV says
    what staying is worth). Cohort = month of a user's first event;
    revenue = purchase values in each subsequent month; LTV/user =
    cumulative cohort revenue over the cohort's user count.

    Scale shape: one per-user aggregate for cohort assignment, one
    (user, month) revenue aggregate, then everything on the
    (cohort, age) grain — cumulative windows over months, not events.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("cohort_month")
    )
    monthly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id",
            F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    per_cell = (
        monthly.join(cohorts, on="user_id")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("month"), F.col("cohort_month"))
            .cast("int")
            .alias("age_months"),
        )
        .agg(F.sum("rev").alias("rev"))
    )
    sizes = cohorts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    w_cum = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_cell.join(sizes, on="cohort_month")
        .select(
            "cohort_month",
            "age_months",
            F.round(F.col("rev").cast("double"), 6).alias("revenue"),
            F.round(F.sum("rev").over(w_cum).cast("double"), 6).alias(
                "cum_revenue"
            ),
            "cohort_users",
            F.round(
                F.sum("rev").over(w_cum).cast("double")
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
    )


COHORT_LTV_ORACLE = """
WITH cohorts AS (
  SELECT user_id,
         CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort_month
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), monthly AS (
  SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS month,
         SUM(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
  GROUP BY 1, 2
), per_cell AS (
  SELECT c.cohort_month,
         CAST(date_diff('month', c.cohort_month, m.month) AS INTEGER)
           AS age_months,
         SUM(m.rev) AS rev
  FROM monthly m JOIN cohorts c USING (user_id)
  GROUP BY 1, 2
), sizes AS (
  SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM cohorts GROUP BY 1
)
SELECT p.cohort_month, p.age_months,
       ROUND(CAST(p.rev AS DOUBLE), 6) AS revenue,
       ROUND(CAST(SUM(p.rev) OVER (PARTITION BY p.cohort_month
               ORDER BY p.age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 6) AS cum_revenue,
       s.cohort_users,
       ROUND(CAST(SUM(p.rev) OVER (PARTITION BY p.cohort_month
               ORDER BY p.age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6)
         AS ltv_per_user
FROM per_cell p JOIN sizes s USING (cohort_month)
"""

# Round-17 rotation: demoted after multiple green driver rounds.
EXTRA_QUERIES["cohort_ltv"] = cohort_ltv
EXTRA_ORACLES["cohort_ltv"] = COHORT_LTV_ORACLE


# ---------------------------------------------------------------------------
# Rolling correlation: daily revenue vs daily event activity (round 7)
# ---------------------------------------------------------------------------


def rolling_corr_revenue_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-28-day Pearson correlation between daily purchase
    revenue and daily event volume — the relationship-stability monitor (a
    stable positive correlation breaking toward zero means activity
    stopped converting, a different failure than either series' own
    anomaly z-score catches). Five decimal partial sums over an
    integer-day RANGE frame (the anomaly_daily_revenue machinery,
    applied to a PAIR of series joined on day); the correlation is one
    double expression per day, emitted only for full 28-day windows.
    """
    events = load_table(spark, sf_dir, "events")
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("x"))
    )
    act = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("decimal(18,4)").alias("y")
    )
    paired = rev.join(act, on="day").select(
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("d"),
        "day",
        "x",
        "y",
    )
    w = (
        Window.orderBy("d")
        .rangeBetween(-27, 0)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    sx = F.sum("x").over(w).cast("double")
    sy = F.sum("y").over(w).cast("double")
    sxy = F.sum((F.col("x") * F.col("y")).cast("decimal(38,8)")).over(w).cast(
        "double"
    )
    sxx = F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)")).over(w).cast(
        "double"
    )
    syy = F.sum((F.col("y") * F.col("y")).cast("decimal(38,8)")).over(w).cast(
        "double"
    )
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return (
        paired.select(
            "day", n.alias("n"), F.round(r, 6).alias("rolling_corr")
        )
        .filter(F.col("n") == 28)
        .select("day", F.col("n").cast("long").alias("n_days"), "rolling_corr")
    )


ROLLING_CORR_ORACLE = """
WITH rev AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,4))) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), act AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS DECIMAL(18,4)) AS y
  FROM events GROUP BY 1
), paired AS (
  SELECT date_diff('day', DATE '1970-01-01', r.day) AS d, r.day, r.x, a.y
  FROM rev r JOIN act a USING (day)
), stats AS (
  SELECT day,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         CAST(SUM(x) OVER w AS DOUBLE) AS sx,
         CAST(SUM(y) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,8))) OVER w AS DOUBLE) AS syy
  FROM paired
  WINDOW w AS (ORDER BY d RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
)
SELECT day, CAST(n AS BIGINT) AS n_days,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS rolling_corr
FROM stats WHERE n = 28
"""

EXTRA_QUERIES["rolling_corr_revenue_events"] = rolling_corr_revenue_events
EXTRA_ORACLES["rolling_corr_revenue_events"] = ROLLING_CORR_ORACLE


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation: clicks vs purchase revenue (round 7)
# ---------------------------------------------------------------------------

XCORR_MAX_LAG = 3


def xcorr_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily click volume against daily purchase
    revenue at lags -3..+3 — the lead-lag detector (a peak at positive
    lag k means clicks LEAD purchases by k days: the conversion delay;
    ACF sees a series' own rhythm, this sees the coupling between
    two). Normalized like the ACF: ρ(k) = Σ dx_t·dy_{t+k} /
    sqrt(Σdx²·Σdy²), deviations about each series' own mean. Day-grain
    plan throughout; decimal-rounded lag products.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("decimal(18,4)").alias("clicks"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).cast("decimal(18,4)").alias("rev"),
    )
    tot = Window.partitionBy()
    mx = F.sum("clicks").over(tot).cast("double") / F.count(F.lit(1)).over(tot)
    my = F.sum("rev").over(tot).cast("double") / F.count(F.lit(1)).over(tot)
    dev = daily.select(
        "day",
        F.round(F.col("clicks").cast("double") - mx, 8).alias("dx"),
        F.round(F.col("rev").cast("double") - my, 8).alias("dy"),
    )
    w_day = Window.orderBy("day")
    lags = dev.select(
        "dx",
        "dy",
        *[
            F.lead("dy", k).over(w_day).alias(f"dy_p{k}")
            for k in range(1, XCORR_MAX_LAG + 1)
        ],
        *[
            F.lag("dy", k).over(w_day).alias(f"dy_m{k}")
            for k in range(1, XCORR_MAX_LAG + 1)
        ],
    )

    def dy_at(k: int):
        if k == 0:
            return F.col("dy")
        return F.col(f"dy_p{k}") if k > 0 else F.col(f"dy_m{-k}")

    terms = lags.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.round(F.col("dx") * dy_at(k), 8).alias("xy"),
                        F.when(
                            dy_at(k).isNotNull(),
                            F.round(F.col("dx") * F.col("dx"), 8),
                        ).alias("xx"),
                        F.when(
                            dy_at(k).isNotNull(),
                            F.round(dy_at(k) * dy_at(k), 8),
                        ).alias("yy"),
                    )
                    for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
                ]
            )
        ).alias("t")
    ).select("t.lag", "t.xy", "t.xx", "t.yy")
    sums = (
        terms.filter(F.col("xy").isNotNull())
        .groupBy("lag")
        .agg(
            F.sum(F.col("xy").cast("decimal(38,8)")).alias("sxy"),
            F.sum(F.col("xx").cast("decimal(38,8)")).alias("sxx"),
            F.sum(F.col("yy").cast("decimal(38,8)")).alias("syy"),
        )
    )
    return sums.select(
        F.col("lag").cast("int").alias("lag"),
        F.round(
            F.col("sxy").cast("double")
            / F.sqrt(
                F.col("sxx").cast("double") * F.col("syy").cast("double")
            ),
            6,
        ).alias("xcorr"),
    )


def _xcorr_oracle() -> str:
    def dy_at(k: int) -> str:
        if k == 0:
            return "dy"
        if k > 0:
            return f"lead(dy, {k}) OVER (ORDER BY day)"
        return f"lag(dy, {-k}) OVER (ORDER BY day)"

    term_selects = "\n  UNION ALL ".join(
        f"SELECT {k} AS lag, ROUND(dx * ({dy_at(k)}), 8) AS xy, "
        f"CASE WHEN ({dy_at(k)}) IS NOT NULL "
        f"THEN ROUND(dx * dx, 8) END AS xx, "
        f"CASE WHEN ({dy_at(k)}) IS NOT NULL "
        f"THEN ROUND(({dy_at(k)}) * ({dy_at(k)}), 8) END AS yy FROM dev"
        for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS DECIMAL(18,4)) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END)
              AS DECIMAL(18,4)) AS rev
  FROM events GROUP BY 1
), dev AS (
  SELECT day,
         ROUND(CAST(clicks AS DOUBLE)
               - CAST(SUM(clicks) OVER () AS DOUBLE) / COUNT(*) OVER (), 8)
           AS dx,
         ROUND(CAST(rev AS DOUBLE)
               - CAST(SUM(rev) OVER () AS DOUBLE) / COUNT(*) OVER (), 8)
           AS dy
  FROM daily
), terms AS (
  {term_selects}
), sums AS (
  SELECT lag,
         SUM(CAST(xy AS DECIMAL(38,8))) AS sxy,
         SUM(CAST(xx AS DECIMAL(38,8))) AS sxx,
         SUM(CAST(yy AS DECIMAL(38,8))) AS syy
  FROM terms WHERE xy IS NOT NULL GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag,
       ROUND(CAST(sxy AS DOUBLE)
             / SQRT(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6) AS xcorr
FROM sums
"""


EXTRA_QUERIES["xcorr_clicks_purchases"] = xcorr_clicks_purchases
EXTRA_ORACLES["xcorr_clicks_purchases"] = _xcorr_oracle()


# ---------------------------------------------------------------------------
# Activity heat map: day-of-week × hour grid (round 7)
# ---------------------------------------------------------------------------


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity grid with each cell's share of
    total traffic — the load-profile fingerprint capacity planning and
    anomaly triage both start from (dow_seasonality collapses to one
    axis; the 2-d grid shows WHICH hours of WHICH days carry the
    load). One corpus aggregate to the ≤168-cell grid; shares via one
    total window over it.
    """
    events = load_table(spark, sf_dir, "events")
    grid = events.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    tot = Window.partitionBy()
    return grid.select(
        "dow",
        "hour",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(tot).cast("double"),
            6,
        ).alias("traffic_share"),
    )


# Spark dayofweek: 1 = Sunday; DuckDB dayofweek: 0 = Sunday — shift to
# match Spark's numbering.
ACTIVITY_HEATMAP_ORACLE = """
WITH grid AS (
  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT dow, hour, n_events,
       ROUND(CAST(n_events AS DOUBLE)
             / CAST(SUM(n_events) OVER () AS DOUBLE), 6) AS traffic_share
FROM grid
"""

EXTRA_QUERIES["activity_heatmap"] = activity_heatmap
EXTRA_ORACLES["activity_heatmap"] = ACTIVITY_HEATMAP_ORACLE
