"""Per-batch-id overwrite retry idempotence across the partial-store
family (streaming/partial_store.py — the round-11 retrofit of the
dedup store's design onto the older rollup/drift/HDR/index/CDC/
heavy-hitter/fingerprint stores).

foreachBatch delivery is at-least-once: a crash between the parquet
write and the streaming checkpoint commit replays the SAME batch id.
For every store in the family, writing a batch TWICE with the same id
must leave the merged read identical to writing it once — the old
``mode("append")`` write path double-counted the additive grains
(long/decimal sums, tf counts, SpaceSaving est/err) under exactly
this replay.

Each case drives the sink function directly (the foreachBatch
callable is plain Python — no stream needed to simulate a replay) and
compares the merged serving read before/after the duplicate write.
"""

from __future__ import annotations

import pytest

from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def _assert_replay_invariant(spark, sink_fn, read_fn, batches):
    """Write each batch once, snapshot the merged read, then replay
    batch 0 (same id) and assert the merged read is unchanged."""
    for i, b in enumerate(batches):
        sink_fn(b, i)
    before = _rows(read_fn())
    sink_fn(batches[0], 0)  # at-least-once replay of a committed write
    after = _rows(read_fn())
    assert after == before, "replayed batch changed the merged read"
    return before


def test_rollup_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.rollup_sink import (
        merged_hourly,
        rollup_append_sink,
    )

    events = load_table(spark, SF, "events")
    half1 = events.filter("user_id % 2 = 0")
    half2 = events.filter("user_id % 2 = 1")
    target = str(tmp_path / "store")
    merged = _assert_replay_invariant(
        spark,
        rollup_append_sink(target),
        # sketches are non-deterministic binary blobs; compare the
        # additive stats (the replay-damage surface)
        lambda: merged_hourly(spark, target).select(
            "bucket_hour", "revenue_partial", "n_events", "n_purchases"
        ),
        [half1, half2],
    )
    assert merged  # non-vacuous


def test_drift_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.drift_sink import (
        drift_append_sink,
        merged_value_counts,
    )

    events = load_table(spark, SF, "events")
    target = str(tmp_path / "store")
    merged = _assert_replay_invariant(
        spark,
        drift_append_sink(target),
        lambda: merged_value_counts(spark, target),
        [events.filter("user_id % 2 = 0"), events.filter("user_id % 2 = 1")],
    )
    assert merged


def test_hdr_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.hdr_sink import (
        hdr_append_sink,
        merged_histogram,
    )

    events = load_table(spark, SF, "events").selectExpr(
        "cast(value as long) as value"
    ).filter("value is not null")
    target = str(tmp_path / "store")
    merged = _assert_replay_invariant(
        spark,
        hdr_append_sink(target),
        lambda: merged_histogram(spark, target),
        [events.limit(200), events.limit(500)],
    )
    assert merged


def test_index_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.index_sink import (
        index_append_sink,
        read_inverted_index,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    target = str(tmp_path / "store")
    merged = _assert_replay_invariant(
        spark,
        index_append_sink(target),
        lambda: read_inverted_index(spark, target),
        [docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")],
    )
    assert merged


def test_cdc_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.cdc_sink import (
        cdc_append_sink,
        compacted_log,
    )
    from pyspark.sql import functions as F

    orders = load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("cust_key"),
        F.lit("upsert").alias("op"),
        F.col("o_totalprice").alias("new_acctbal"),
        "o_orderdate",
        "o_orderkey",
    )
    target = str(tmp_path / "store")
    # latest-wins was already replay-SAFE semantically; the family
    # contract additionally keeps the stored row count flat
    _assert_replay_invariant(
        spark,
        cdc_append_sink(target),
        lambda: compacted_log(spark, target),
        [orders.filter("o_orderkey % 2 = 0"),
         orders.filter("o_orderkey % 2 = 1")],
    )


def test_heavyhitters_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.heavyhitters_sink import (
        heavyhitters_append_sink,
        merged_summary,
        stream_guarantee,
    )

    docs = load_table(spark, SF, "documents").select("text")
    target = str(tmp_path / "store")
    sink = heavyhitters_append_sink(target, m=64)
    batches = [docs.limit(100), docs.limit(300)]
    for i, b in enumerate(batches):
        sink(b, i)
    before = _rows(merged_summary(spark, target))
    g_before = stream_guarantee(spark, target, m=64)
    sink(batches[0], 0)
    assert _rows(merged_summary(spark, target)) == before
    # the detection guarantee must not inflate under replay either
    assert stream_guarantee(spark, target, m=64) == pytest.approx(g_before)


def test_fingerprint_store_replay(spark, tmp_path):
    from scala_data_pipeline_spark.streaming.fingerprint_sink import (
        fingerprint_append_sink,
        read_fingerprint,
    )

    orders = load_table(spark, SF, "orders")
    target = str(tmp_path / "store")
    merged = _assert_replay_invariant(
        spark,
        fingerprint_append_sink(target),
        lambda: read_fingerprint(spark, target),
        [orders.filter("o_orderkey % 2 = 0"),
         orders.filter("o_orderkey % 2 = 1")],
    )
    assert merged[0][0] > 0  # n_rows
