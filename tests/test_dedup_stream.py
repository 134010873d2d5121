"""Streaming exact-dedup digest index (streaming/dedup_sink.py):
merge-on-read over micro-batch partials must be bit-identical to the
batch operator over the full corpus, however the stream was sliced."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.dedup import exact_dedup_groups
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.dedup_sink import (
    dedup_append_sink,
    flag_new_batch,
    merged_groups,
)


def _build_store(spark, docs, tmp_path):
    src = str(tmp_path / "stream_src")
    # 4 files + maxFilesPerTrigger=1 → 4 micro-batches, so digests
    # genuinely fragment across partial files before the merge.
    docs.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(dedup_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive
    return target


def test_streaming_dedup_merge_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    # Plant cross-batch duplicates: the fixture has no exact-dup texts
    # at test SFs, so clone 20 docs under new ids. The clones land in
    # arbitrary micro-batches; min-keeper must still win globally.
    max_id = docs.agg(F.max("doc_id")).first()[0]
    clones = docs.limit(20).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(max_id + 1)).cast("long")
    )
    corpus = docs.unionByName(clones)
    target = _build_store(spark, corpus, tmp_path)

    got = {
        r.digest: (r.keeper_id, r.n_copies)
        for r in merged_groups(spark, target).collect()
    }
    want = {
        r.digest: (r.keeper_id, r.n_copies)
        for r in exact_dedup_groups(corpus).collect()
    }
    assert got == want  # bit-identity: keeper AND count per digest
    assert any(n > 1 for _, n in want.values())  # clones actually dup


def test_streaming_dedup_flags_new_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    target = _build_store(spark, docs, tmp_path)

    # A probe batch: 5 docs re-sent verbatim (dups of history, keeper =
    # their own id — the fixture has no intra-corpus dups) + 2 novel.
    seen = docs.limit(5)
    novel = seen.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" genuinely novel suffix")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    flags = {
        r.doc_id: (r.is_dup_of_history, r.history_keeper)
        for r in flag_new_batch(
            spark, target, seen.unionByName(novel)
        ).collect()
    }
    for r in seen.select("doc_id").collect():
        assert flags[r.doc_id] == (True, r.doc_id)
    for r in novel.select("doc_id").collect():
        assert flags[r.doc_id] == (False, None)


def test_streaming_dedup_retry_idempotent(spark, sf_dir, tmp_path):
    """At-least-once safety: re-delivering a micro-batch under the
    SAME batch_id (crash between write and checkpoint commit) must not
    double-count n_copies — the per-batch_id overwrite absorbs it."""
    docs = load_table(spark, sf_dir, "documents").limit(100)
    target = str(tmp_path / "partials")
    sink = dedup_append_sink(target)
    sink(docs, 0)
    once = {
        r.digest: (r.keeper_id, r.n_copies)
        for r in merged_groups(spark, target).collect()
    }
    sink(docs, 0)  # the retry
    twice = {
        r.digest: (r.keeper_id, r.n_copies)
        for r in merged_groups(spark, target).collect()
    }
    assert once == twice
    sink(docs, 1)  # a genuinely NEW batch with the same docs does add
    thrice = {
        r.digest: r.n_copies
        for r in merged_groups(spark, target).collect()
    }
    assert all(thrice[d] == n * 2 for d, (_, n) in once.items())


def test_streaming_dedup_empty_store_all_novel(spark, sf_dir, tmp_path):
    """Serving before the first micro-batch commits (or against a
    just-provisioned path) reports every doc novel, not an error."""
    docs = load_table(spark, sf_dir, "documents").limit(5)
    flags = flag_new_batch(
        spark, str(tmp_path / "never_written"), docs
    ).collect()
    assert len(flags) == 5
    assert all(
        (r.is_dup_of_history, r.history_keeper) == (False, None)
        for r in flags
    )
