"""Sequential-pattern mining and collaborative filtering.

- **PrefixSpan** (`seq_prefixspan`): frequent event-type sequences
  across user journeys (Pei et al., "Mining Sequential Patterns by
  Pattern-Growth", TKDE 2004). ``pyspark.ml.fpm.PrefixSpan`` runs the
  distributed projection-database algorithm: sequences shuffle once to
  build per-prefix projected databases, growth happens locally per
  prefix partition — no candidate-generation joins. Per-user sequences
  are capped at the first ``SEQ_CAP`` events, which bounds every
  projected database (at 100 TB the cap is the difference between
  bounded task memory and a power-law user blowing up a partition).

  Oracle strategy (mirrors ``basket.py``): general PrefixSpan output
  is not SQL, but with ``maxPatternLength=2`` and singleton itemsets
  (one event per sequence element) the frequent patterns are exactly
  (a) event types contained in ≥ minCount distinct user sequences and
  (b) ordered pairs (a then later b) contained in ≥ minCount distinct
  user sequences — both exact SQL (EXISTS-style distinct-user counts
  over a row_number self-join). The query filters to length ≤ 2 so the
  SQL twin is complete by construction; minCount = ceil(minSupport·n)
  replicates MLlib's cut. Sequence order ties on equal timestamps are
  broken by event_id in BOTH engines, so the a-before-b relation is
  engine-identical.

- **ALS recommendations** (`ml_als_recommend`, rows-only): implicit-
  feedback matrix factorization (Hu/Koren/Volinsky, ICDM 2008) over
  customer × part-brand purchase quantities. ALS is the canonical
  Spark-scale recommender: factor blocks co-partition with their
  ratings, each sweep is a block-to-block join, never an all-pairs
  score. Output factors are seed-fixed but float-iteration-dependent
  (no SQL twin exists for a latent factorization), so this registers
  rows-only with invariants tested in ``tests/test_seqmine.py``:
  top-k shape, score monotonicity per user, and that recommendations
  reproduce under the same seed.

Reference parity: beyond-reference surface (SURVEY.md §6); the
reference's only ML is the text-classifier pipeline
(mlproject/mlproject.scala).
"""

from __future__ import annotations

from pyspark.ml.fpm import PrefixSpan
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES: dict = {}
EXTRA_ORACLES: dict = {}

SEQ_CAP = 50  # first N events per user enter the sequence
SEQ_MIN_SUPPORT = 0.05


def _user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w_rn = F.expr(
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    )
    capped = events.select(
        "user_id", "event_type", w_rn.alias("rn")
    ).where(F.col("rn") <= SEQ_CAP)
    # array_sort on (rn, event_type) structs -> deterministic order,
    # then each event becomes a singleton itemset (PrefixSpan's input
    # is array<array<string>>)
    return capped.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
            lambda s: F.array(s["event_type"]),
        ).alias("sequence")
    )


def seq_prefixspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    seqs = _user_sequences(spark, sf_dir)
    model = PrefixSpan(
        minSupport=SEQ_MIN_SUPPORT,
        maxPatternLength=2,
        maxLocalProjDBSize=32_000_000,
    )
    freq = model.findFrequentSequentialPatterns(seqs.select("sequence"))
    return freq.select(
        F.concat_ws(
            ">", F.transform("sequence", lambda s: s[0])
        ).alias("pattern"),
        F.col("freq").cast("long").alias("freq"),
    )


SEQ_PREFIXSPAN_ORACLE = f"""
WITH s AS (
  SELECT user_id, event_type, rn FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE user_id IS NOT NULL
  ) WHERE rn <= {SEQ_CAP}
), nu AS (
  SELECT CAST(CEIL({SEQ_MIN_SUPPORT} * COUNT(DISTINCT user_id)) AS BIGINT)
         AS min_count
  FROM s
), singles AS (
  SELECT event_type AS pattern,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS freq
  FROM s GROUP BY event_type
), pairs AS (
  SELECT a.event_type || '>' || b.event_type AS pattern,
         CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS freq
  FROM s a JOIN s b ON a.user_id = b.user_id AND a.rn < b.rn
  GROUP BY a.event_type, b.event_type
)
SELECT pattern, freq FROM singles WHERE freq >= (SELECT min_count FROM nu)
UNION ALL
SELECT pattern, freq FROM pairs WHERE freq >= (SELECT min_count FROM nu)
"""

# --------------------------------------------------------------------
# ALS implicit-feedback recommendations (rows-only)
# --------------------------------------------------------------------

ALS_RANK = 8
ALS_SEED = 42
ALS_TOPK = 3


def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k part-brand recommendations per customer from implicit
    purchase strengths (summed lineitem quantity via orders).

    Brands (25) rather than raw partkeys keep the item axis dense
    enough for the tiny SFs to factor meaningfully; at 100 TB the same
    code runs on raw items — ALS block partitioning is built for
    millions of items. Rows-only: latent factors have no SQL twin.
    """
    from pyspark.ml.recommendation import ALS

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    strengths = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            # dense int item ids from the brand label ("Brand#13" -> 13)
            F.regexp_extract("p_brand", r"(\d+)$", 1)
            .cast("int")
            .alias("item"),
        )
        .agg(F.sum("l_quantity").cast("float").alias("strength"))
    )
    als = ALS(
        rank=ALS_RANK,
        maxIter=5,
        seed=ALS_SEED,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
    )
    model = als.fit(strengths)
    # Score manually instead of recommendForAllUsers: MLlib's built-in
    # path block-crossJoins user×item factor blocks (a deliberate
    # CartesianProduct). With a bounded item axis the Spark-first shape
    # is a broadcast of the item factors (25 rows × rank floats) onto
    # the user factors and a per-user window top-k — no cartesian ever
    # reaches the plan, and the scoring scan stays whole-stage codegen
    # except the zip_with dot product.
    items = F.broadcast(
        model.itemFactors.select(
            F.col("id").alias("brand_id"), F.col("features").alias("vf")
        )
    )
    users = model.userFactors.select(
        F.col("id").alias("custkey"), F.col("features").alias("uf")
    )
    scored = users.crossJoin(items).select(
        "custkey",
        "brand_id",
        F.aggregate(
            F.zip_with("uf", "vf", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("custkey").orderBy(
        F.desc("score"), F.asc("brand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ALS_TOPK)
        .select(
            F.col("custkey").cast("long").alias("custkey"),
            F.col("rank").cast("int").alias("rank"),
            F.col("brand_id").cast("int").alias("brand_id"),
        )
    )


# Round-7 rotation: PrefixSpan takes a driver slot (never checked; the
# registry's only sequential-pattern shape). ALS stays a rows-only
# extra by nature.
# Round-12 rotation: demoted after 5 green driver rounds (r7-r11).
EXTRA_QUERIES["seq_prefixspan"] = seq_prefixspan
EXTRA_ORACLES["seq_prefixspan"] = SEQ_PREFIXSPAN_ORACLE
EXTRA_QUERIES["ml_als_recommend"] = ml_als_recommend


BOUNDS = {
    "ml_als_recommend": (
        "tests/test_rows_only_bounds.py::test_ml_als_recommend_beats_popularity_baseline"
        " — hit-rate >= 0.95 and precision@3 >= the popularity baseline"
    ),
}
