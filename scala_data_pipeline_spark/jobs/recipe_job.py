"""The full modern pretraining-data recipe as ONE composable job —
the round-7 capstone tying the curation operators together the way a
production corpus build sequences them:

    documents
      → exact dedup (md5 keeper)                      [ext/dedup]
      → near-dup DEDUP-AND-REWEIGHT (keeper carries   [LSH pairs →
        cluster size as sample weight; corpus mass     components →
        conserved exactly)                             keeper]
      → cross-source score CALIBRATION (quantile-map  [ext/curation.
        every source's quality distribution onto the   score_calibration]
        global one)
      → quality gate on the CALIBRATED score (equal   (the reason to
        global-quantile bar for every source)          calibrate first)
      → decontaminate vs the benchmark set            [ext/curation]

Output: (doc_id, source, lang, weight, quality_score,
calibrated_score) — one row per surviving doc, ready for a
weighted training sampler.

Scale shape: every stage is a DataFrame transform over bounded
intermediates (keeper frames, the score-grain mapping table, the
hashed benchmark n-grams broadcast); the corpus is scanned, digest-
shuffled, pair-hub-joined and n-gram-shuffled — no driver loops, no
global sorts over corpus-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ext.curation import decontaminate, score_calibration
from ..ext.dedup import exact_dedup_groups
from ..ext.textstats import quality_features


def recipe(
    docs: DataFrame,
    benchmark: DataFrame,
    near_dup_pairs: DataFrame,
    min_calibrated: float = 0.5,
) -> DataFrame:
    """Run the recipe. ``near_dup_pairs`` is the LSH candidate-pair
    frame (callers reuse their memoized/persisted hub — the
    scale_smoke_pairs checkpoint pattern)."""
    from pyspark.sql import Window

    from ..ext.components import connected_components

    # 1. exact dedup
    keepers = exact_dedup_groups(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    deduped = docs.join(keepers, on="doc_id")

    # 2. near-dup dedup-and-reweight (inline form of
    #    queries/ext_dedup.dedup_reweight over the provided pair hub)
    comp = connected_components(near_dup_pairs)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    q = quality_features(deduped).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    cluster_keepers = (
        comp.join(q, on="doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .join(sizes, on="cluster_id")
        .select("doc_id", "n_members")
    )
    membership = comp.select("doc_id", F.lit(True).alias("clustered"))
    weighted = (
        deduped.join(membership, on="doc_id", how="left")
        .join(cluster_keepers, on="doc_id", how="left")
        .filter(F.col("clustered").isNull() | F.col("n_members").isNotNull())
        .withColumn(
            "weight", F.coalesce(F.col("n_members"), F.lit(1)).cast("long")
        )
        .drop("clustered", "n_members")
    )

    # 3. calibrate quality scores across sources
    scores = quality_features(weighted).select(
        "doc_id", F.col("quality_score").alias("score")
    )
    mapping = score_calibration(weighted, scores)
    calibrated = (
        weighted.join(scores, on="doc_id")
        .join(mapping, on=["source", "score"])
        .withColumnRenamed("score", "quality_score")
    )

    # 4. gate on the calibrated score: the same global-quantile bar
    #    for every source
    gated = calibrated.filter(F.col("calibrated_score") >= min_calibrated)

    # 5. benchmark decontamination (anti-join on broadcast n-grams)
    return decontaminate(gated, benchmark).select(
        "doc_id",
        "source",
        "lang",
        "weight",
        "quality_score",
        "calibrated_score",
    )
