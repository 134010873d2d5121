"""Streaming inverted index = batch inverted index, exactly.

The index segment store (streaming/index_sink.py) appends per-batch
(term, doc_id, tf) rows; the merged read must be BIT-IDENTICAL to the
batch inverted_index over the full corpus — the (term, doc) grain is
additive and the posting cap is applied only at read time."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.textstats import inverted_index
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.index_sink import (
    index_append_sink,
    read_inverted_index,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"


def test_streamed_index_equals_batch(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "segments")
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(index_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # Multiple segments must exist so the merge is exercised.
    n_segment_rows = read_partials(spark, target).count()
    streamed = {
        r.term: r for r in read_inverted_index(spark, target).collect()
    }
    batch = {r.term: r for r in inverted_index(docs).collect()}
    assert n_segment_rows > len(batch)  # segment grain > index grain
    assert set(streamed) == set(batch)
    for t in batch:
        assert streamed[t].asDict() == batch[t].asDict(), t


def test_segment_compaction_preserves_index(spark, tmp_path):
    """compact_segments rewrites many per-batch files as one merged
    segment; the index read before and after must be identical, and
    the file count must actually drop."""
    import glob

    from scala_data_pipeline_spark.streaming.index_sink import (
        compact_segments,
    )

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "segments")
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(index_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)

    before = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}
    n_files_before = len(glob.glob(f"{target}/**/part-*", recursive=True))
    compact_segments(spark, target)
    n_files_after = len(glob.glob(f"{target}/**/part-*", recursive=True))
    after = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}
    assert n_files_after < n_files_before
    assert after == before


def test_crash_window_recovery(spark, tmp_path):
    """The round-8 advisor's crash window: a compaction that died after
    rename(target -> .old) leaves no store at the target path. The next
    open (read_inverted_index or compact_segments) must restore it —
    from .old preferentially, else from a fully-written .compact-tmp —
    and the recovered index must read identically."""
    import shutil

    docs = load_table(spark, SF, "documents")
    target = str(tmp_path / "segments")
    docs.selectExpr(
        "doc_id", "explode(split(lower(text), ' ')) AS term"
    ).groupBy("term", "doc_id").count().withColumnRenamed(
        "count", "tf"
    ).write.parquet(target)
    want = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}

    # crash after staging: target gone, .old holds the store
    shutil.move(target, target + ".old")
    got = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}
    assert got == want
    import os
    assert os.path.isdir(target) and not os.path.isdir(target + ".old")

    # crash after staging AND .old lost, tmp fully written
    shutil.move(target, target + ".compact-tmp")
    got = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}
    assert got == want
    assert os.path.isdir(target) and not os.path.isdir(target + ".compact-tmp")

    # compaction itself self-heals too, then still compacts correctly
    shutil.move(target, target + ".old")
    from scala_data_pipeline_spark.streaming.index_sink import compact_segments

    compact_segments(spark, target)
    got = {r.term: r.asDict() for r in read_inverted_index(spark, target).collect()}
    assert got == want
