"""Incremental corpus maintenance: fold an arriving document batch into
an existing deduplicated corpus — the steady-state of a production
training-data pipeline (the full-corpus jobs run once; every day after
that runs THIS).

    existing index (band buckets, parquet)   arriving batch
                 \\                               |
                  ── lsh_incremental_pairs ──────┤
                        |                        |
              components over NEW pairs    exact-dup digests
                        |                        |
            batch keep/drop decision (near-dup of an indexed doc,
            exact dup, or fresh) → updated index written back

Scale shape: the existing corpus is touched only through its stored
band-bucket index (bucketed parquet; O(|batch|) bucket join) and its
digest column; the batch's shingling is O(|batch|); the index update
appends the batch's buckets. Nothing rescans old documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.dedup import (
    lsh_band_buckets,
    lsh_incremental_pairs,
    minhash_signature,
)
from ..sources import load_table


def build_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, band, bucket, digest): the persistent dedup index — band
    buckets for near-dup candidates plus the exact-dup digest."""
    buckets = lsh_band_buckets(minhash_signature(docs, text_col))
    digests = docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("digest")
    )
    return buckets.join(digests, on="doc_id")


def classify_batch(
    old_docs: DataFrame, new_docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per new document: (doc_id, is_exact_dup, n_near_candidates,
    decision) where decision ∈ ('drop_exact', 'review_near', 'keep').

    ``review_near`` means LSH surfaced at least one candidate pair for
    the document — a production pipeline feeds exactly those to the
    Jaccard verify stage (jaccard_verify_pairs) instead of verifying
    the whole batch."""
    old_digests = old_docs.select(
        F.md5(F.col(text_col)).alias("digest")
    ).distinct()
    new_digested = new_docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("digest")
    )
    exact = new_digested.join(
        old_digests, on="digest", how="left_semi"
    ).select("doc_id", F.lit(True).alias("is_exact_dup"))

    pairs = lsh_incremental_pairs(old_docs, new_docs, text_col)
    new_ids = new_docs.select("doc_id")
    near_counts = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .join(new_ids, on="doc_id", how="left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near_candidates"))
    )
    base = (
        new_ids.join(exact, on="doc_id", how="left")
        .join(near_counts, on="doc_id", how="left")
        .na.fill({"n_near_candidates": 0})
        .withColumn("is_exact_dup", F.coalesce("is_exact_dup", F.lit(False)))
    )
    decision = (
        F.when(F.col("is_exact_dup"), F.lit("drop_exact"))
        .when(F.col("n_near_candidates") > 0, F.lit("review_near"))
        .otherwise(F.lit("keep"))
    )
    return base.select(
        "doc_id", "is_exact_dup", "n_near_candidates",
        decision.alias("decision"),
    )


def run(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    new_sources: tuple[str, ...] = ("src18", "src19"),
) -> DataFrame:
    """E2E: split the fixture corpus into existing vs arriving by
    source, classify the batch, and write the UPDATED index (existing ∪
    kept batch docs) partitioned by band — the layout the next day's
    bucket join prunes on."""
    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*new_sources)
    old_docs, new_docs = docs.filter(~is_new), docs.filter(is_new)

    # The persist serves the index write below (kept_ids reads
    # decisions); it is released before returning so the cache does not
    # outlive the job — a caller re-collecting the returned frame pays
    # one recompute, which beats a session-lifetime cache leak. Callers
    # that iterate over decisions repeatedly should persist it
    # themselves.
    decisions = classify_batch(old_docs, new_docs).persist()
    try:
        kept_ids = decisions.filter(
            F.col("decision") != "drop_exact"
        ).select("doc_id")
        updated = build_index(
            old_docs.select("doc_id", "text").unionByName(
                new_docs.join(kept_ids, on="doc_id").select("doc_id", "text")
            )
        )
        updated.write.mode("overwrite").partitionBy("band").parquet(
            index_path
        )
    finally:
        decisions.unpersist()
    return decisions
