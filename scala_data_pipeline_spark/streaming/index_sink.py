"""Streaming maintenance of the inverted index — the retrieval-index
analogue of the rollup / fingerprint / KS-drift partial stores.

Each micro-batch appends its own (term, doc_id, tf) rows as immutable
parquet files. That grain — NOT the finished (df, ctf, postings) row —
is what makes the store exactly mergeable: term frequencies are
additive longs, df is a count over the merged (term, doc) grain, and
the posting-list CAP is applied at READ time over the merged grain, so
truncation never loses a doc id that a later batch's merge would have
ranked into the cap. Reading through the same ``inverted_index``
aggregation shape the batch operator uses yields a bit-identical index
(test_index_stream.py asserts this).

At 100 TB: per-batch partials are the batch's own term×doc touch set
(the index segment), the merge is one uniform-key aggregate over
segments — the standard segment-and-merge architecture (Lucene-style)
expressed as plain Spark reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.textstats import tokens_col
from .partial_store import per_batch_writer, read_partials


def index_append_sink(target_dir: str, text_col: str = "text"):
    """``foreachBatch`` function: write this micro-batch's
    (term, doc_id, tf) segment into ``batch-{batch_id}/`` (overwrite →
    retry-idempotent; a replayed append would double the replayed
    batch's tf sums, see streaming/partial_store.py)."""

    def segment(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                "doc_id",
                F.explode(tokens_col(F.col(text_col))).alias("term"),
            )
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )

    return per_batch_writer(target_dir, segment)


def read_inverted_index(
    spark: SparkSession, target_dir: str, max_postings: int = 32
) -> DataFrame:
    """Merge-on-read: collapse segments to the (term, doc) grain, then
    finish through the batch operator's aggregation shape."""
    _recover_store(spark, target_dir)
    segments = read_partials(spark, target_dir)
    per_doc = segments.groupBy("term", "doc_id").agg(
        F.sum("tf").cast("long").alias("tf")
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("ctf"),
        F.array_join(
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, max_postings),
            ",",
        ).alias("postings"),
    )


def _fs(spark: SparkSession, target_dir: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    return hpath(target_dir).getFileSystem(conf), hpath


def _recover_store(spark: SparkSession, target_dir: str) -> None:
    """Crash recovery for the two-rename compaction swap: if a previous
    ``compact_segments`` died after staging the live store to ``.old``
    but before installing the merged ``.compact-tmp`` (the window the
    round-8 advisor flagged), the store path is missing while a
    complete copy sits in a sibling. On open, restore it: prefer the
    original ``.old`` (conservative — bit-identical to pre-compaction),
    fall back to the fully-written ``.compact-tmp`` (same logical
    content, already merged). No-op when the store exists.

    Single-writer assumption (documented, not enforced): one compactor
    at a time, and readers racing the millisecond-scale swap window on
    a non-atomic-rename filesystem (object stores) should retry — the
    store is never gone, only mid-rename.
    """
    fs, hpath = _fs(spark, target_dir)
    tgt = hpath(target_dir)
    if fs.exists(tgt):
        return
    old_p = hpath(target_dir.rstrip("/") + ".old")
    tmp_p = hpath(target_dir.rstrip("/") + ".compact-tmp")
    # Two readers can race THIS recovery itself (round-13 review
    # finding): the loser's rename returns False (source already moved)
    # — benign iff the store now exists — and the tmp-install branch
    # must re-check the target, because Hadoop rename moves a source
    # INTO an existing destination directory, nesting a second copy of
    # the segment that recursiveFileLookup would then double-count.
    if fs.exists(old_p):
        if not fs.rename(old_p, tgt) and not fs.exists(tgt):
            raise IOError(
                f"index store recovery: could not restore {old_p} -> "
                f"{target_dir}"
            )
        fs.delete(tmp_p, True)
    elif fs.exists(tmp_p):
        if fs.exists(tgt):
            # a concurrent recoverer already restored the store; the
            # .old winner path deletes the tmp, mirror that here
            fs.delete(tmp_p, True)
            return
        if not fs.rename(tmp_p, tgt) and not fs.exists(tgt):
            raise IOError(
                f"index store recovery: could not install {tmp_p} -> "
                f"{target_dir}"
            )


def compact_segments(spark: SparkSession, target_dir: str) -> None:
    """Offline segment compaction: rewrite the many per-batch files as
    ONE merged (term, doc_id, tf) segment — the same merge plan
    ``read_inverted_index`` runs on read, executed once and persisted,
    so subsequent reads skip the per-read collapse (Lucene's merge
    policy, as a job). Readers before/after see identical indexes
    because the store's grain is unchanged; only the file layout is.
    Run only while the stream is STOPPED after a clean commit: folding
    an uncommitted batch's subdir into the segment and then replaying
    that batch id would re-add its partials alongside the compacted
    copy (streaming/partial_store.py documents the family rule).

    Failure safety: the merged segment is written to a temporary
    sibling directory first, then swapped into place with two
    filesystem renames (old store -> ``.old``, tmp -> store). At no
    point is the store's only copy an executor-resident checkpoint —
    if the job dies mid-swap, either the original directory or its
    ``.old`` sibling still holds the complete index on disk.
    """
    from pyspark.sql import functions as F

    _recover_store(spark, target_dir)
    merged = (
        read_partials(spark, target_dir)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").cast("long").alias("tf"))
    )
    tmp_dir = target_dir.rstrip("/") + ".compact-tmp"
    old_dir = target_dir.rstrip("/") + ".old"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp_dir)

    fs, hpath = _fs(spark, target_dir)
    fs.delete(hpath(old_dir), True)
    if not fs.rename(hpath(target_dir), hpath(old_dir)):
        raise IOError(f"compact_segments: could not stage {target_dir}")
    if not fs.rename(hpath(tmp_dir), hpath(target_dir)):
        # roll back so readers keep a live store at the original path,
        # and report a double-failure instead of silently leaving no
        # store (next open would also self-heal via _recover_store)
        restored = fs.rename(hpath(old_dir), hpath(target_dir))
        fs.delete(hpath(tmp_dir), True)
        raise IOError(
            f"compact_segments: could not install {tmp_dir}"
            + ("" if restored else
               f"; ROLLBACK ALSO FAILED — store left at {old_dir}, "
               "next read recovers it")
        )
    fs.delete(hpath(old_dir), True)
