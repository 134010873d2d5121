"""Streaming maintenance of the exact-dedup digest index
(ext/dedup.py::exact_dedup_groups) — the ingestion-side dedup a corpus
pipeline runs so a batch re-scan of all history is never needed to ask
"have we seen this document before, and who is its keeper?".

Each micro-batch appends its own ``(digest, keeper_partial,
n_copies_partial)`` rows as immutable parquet files; readers merge
partials on read. The grain is ASSOCIATIVE — min-of-mins for the
keeper and sum-of-longs for the copy count — so merge-on-read is
bit-identical to the batch operator over the full history regardless
of how documents were sliced into batches, which the streaming test
asserts. Same segment model as the rollup/fingerprint/index stores:
append-only (no read-modify-write races, object-store friendly), with
compaction = the same read → merge → overwrite plan run offline.

At 100 TB the store holds one row per DISTINCT digest per batch that
saw it — far smaller than the corpus, and the merge groupBy shuffles
only the digest grain. New-batch lookups ("is this doc a dup of
history?") are a broadcast- or bucket-join of the batch's digests
against the merged index, not a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ext.dedup import exact_dedup_groups


def dedup_append_sink(target_dir: str, text_col: str = "text"):
    """``foreachBatch`` function: append this micro-batch's digest
    partials. The per-batch frame IS the batch operator's output (min
    doc_id + count within the batch) — one code path, so the store can
    never drift from the batch semantics."""

    def write_partials(batch_df: DataFrame, batch_id: int) -> None:
        partials = exact_dedup_groups(batch_df, text_col=text_col).select(
            "digest",
            "keeper_id",
            "n_copies",
        )
        partials.write.mode("append").parquet(target_dir)

    return write_partials


def merged_groups(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: collapse per-batch digest fragments to the exact
    full-history dedup groups (min keeper wins, copy counts add)."""
    from pyspark.sql import functions as F

    partials = spark.read.parquet(target_dir)
    return partials.groupBy("digest").agg(
        F.min("keeper_id").alias("keeper_id"),
        F.sum("n_copies").cast("long").alias("n_copies"),
    )


def flag_new_batch(
    spark: SparkSession, target_dir: str, batch: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The serving query: mark each document of an incoming batch as a
    duplicate-of-history or novel, with the historical keeper when one
    exists. Joins the BATCH's digests (small side) against the merged
    index on the digest key — no corpus re-scan."""
    from pyspark.sql import functions as F

    index = merged_groups(spark, target_dir).select(
        "digest", F.col("keeper_id").alias("history_keeper")
    )
    digests = batch.withColumn("digest", F.md5(F.col(text_col)))
    return digests.join(index, on="digest", how="left").select(
        "doc_id",
        "digest",
        F.col("history_keeper").isNotNull().alias("is_dup_of_history"),
        "history_keeper",
    )
