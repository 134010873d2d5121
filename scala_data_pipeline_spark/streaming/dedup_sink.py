"""Streaming maintenance of the exact-dedup digest index
(ext/dedup.py::exact_dedup_groups) — the ingestion-side dedup a corpus
pipeline runs so a batch re-scan of all history is never needed to ask
"have we seen this document before, and who is its keeper?".

Each micro-batch OVERWRITES its own ``batch-{id}/`` subdirectory of
immutable ``(digest, keeper_partial, n_copies_partial)`` parquet;
readers merge partials on read across all batch subdirs. Keying the
write by ``batch_id`` makes the sink idempotent under foreachBatch's
at-least-once delivery: a batch retried after a crash-between-write-
and-checkpoint rewrites the SAME subdir instead of appending a second
copy of its partials (which would double-count ``n_copies`` — plain
``mode("append")`` is not retry-safe for an additive grain). The
grain itself is ASSOCIATIVE — min-of-mins for the keeper and
sum-of-longs for the copy count — so merge-on-read is bit-identical
to the batch operator over the full history regardless of how
documents were sliced into batches, which the streaming test asserts.
Same segment model as the rollup/fingerprint/index stores: immutable
files, no read-modify-write races, compaction = the same read →
merge → overwrite plan run offline.

At 100 TB the store holds one row per DISTINCT digest per batch that
saw it — far smaller than the corpus, and the merge groupBy shuffles
only the digest grain. New-batch lookups ("is this doc a dup of
history?") are a broadcast- or bucket-join of the batch's digests
against the merged index, not a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ext.dedup import content_digest, exact_dedup_groups
from .partial_store import per_batch_writer, read_partials

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.StringType()),
        T.StructField("keeper_id", T.LongType()),
        T.StructField("n_copies", T.LongType()),
    ]
)


def dedup_append_sink(target_dir: str, text_col: str = "text"):
    """``foreachBatch`` function: write this micro-batch's digest
    partials into ``batch-{batch_id}/`` (overwrite → retry-idempotent).
    The per-batch frame IS the batch operator's output (min doc_id +
    count within the batch) — one code path, so the store can never
    drift from the batch semantics."""

    def partials(batch_df: DataFrame) -> DataFrame:
        return exact_dedup_groups(batch_df, text_col=text_col).select(
            "digest",
            F.col("keeper_id").cast("long").alias("keeper_id"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )

    return per_batch_writer(target_dir, partials)


def merged_groups(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: collapse per-batch digest fragments to the exact
    full-history dedup groups (min keeper wins, copy counts add).

    Reads via the shared ``partial_store.read_partials`` (round-13
    review finding: the sink's private reader caught bare ``Exception``,
    so a corrupt or unreadable store was indistinguishable from an
    empty one and every historical duplicate flagged as novel — the
    exact failure the round-11 shared helper exists to prevent; only a
    not-yet-written store reads as empty now)."""
    return read_partials(spark, target_dir, schema=_INDEX_SCHEMA).groupBy(
        "digest"
    ).agg(
        F.min("keeper_id").alias("keeper_id"),
        F.sum("n_copies").cast("long").alias("n_copies"),
    )


def flag_new_batch(
    spark: SparkSession, target_dir: str, batch: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The serving query: mark each document of an incoming batch as a
    duplicate-of-history or novel, with the historical keeper when one
    exists (every doc is novel against an empty/absent store). Joins
    the BATCH's digests (small side) against the merged index on the
    digest key — no corpus re-scan. The digest is the shared
    ext/dedup.py::content_digest, so serving can never drift from what
    the store was written with."""
    index = merged_groups(spark, target_dir).select(
        "digest", F.col("keeper_id").alias("history_keeper")
    )
    digests = batch.withColumn("digest", content_digest(F.col(text_col)))
    return digests.join(index, on="digest", how="left").select(
        "doc_id",
        "digest",
        F.col("history_keeper").isNotNull().alias("is_dup_of_history"),
        "history_keeper",
    )
