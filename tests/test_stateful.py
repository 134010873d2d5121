"""Custom stateful streaming (applyInPandasWithState), RocksDB state
store, and foreachBatch — the T7-adjacent custom-operator surface."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.stateful import running_user_stats


@pytest.fixture(scope="module")
def stream_src(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stateful_src"))
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).repartition(3).write.mode("overwrite").parquet(path)
    return path


def test_running_user_stats_final_state(spark, sf_dir, stream_src):
    """Final per-user state across micro-batches == batch aggregate."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    q = (
        running_user_stats(sdf)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    emitted = spark.sql("SELECT * FROM user_stats").toPandas()
    # last emission per user = final running state
    final = (
        emitted.groupby("user_id").last().reset_index().sort_values("user_id")
    )
    want = (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
        )
        .toPandas()
        .sort_values("user_id")
    )
    assert list(final["n_events"]) == list(want["n_events"])
    assert list(final["n_purchases"]) == list(want["n_purchases"])


def test_rocksdb_state_store(spark, sf_dir, stream_src, tmp_path):
    """The 100 TB-keyspace state config: RocksDB provider runs the same
    windowed agg and produces identical results."""
    from scala_data_pipeline_spark.streaming.windowed import revenue_window_agg

    events = load_table(spark, sf_dir, "events")
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    spark.conf.set(provider_key, rocksdb)  # session conf, read at query start
    try:
        sdf = spark.readStream.schema(events.schema).parquet(stream_src)
        q = (
            revenue_window_agg(sdf, "60 minutes")
            .writeStream.format("memory")
            .queryName("rocks_win")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        progress = q.lastProgress
    finally:
        spark.conf.unset(provider_key)
    # the state operator must actually report RocksDB metrics
    assert progress is not None
    state_ops = progress["stateOperators"]
    assert state_ops and any(
        "rocksdb" in str(op.get("customMetrics", {})).lower() for op in state_ops
    ), state_ops
    got = spark.sql("SELECT COUNT(*) c FROM rocks_win").first()["c"]
    want = revenue_window_agg(
        events.filter(F.col("user_id").isNotNull()), "60 minutes"
    ).count()
    assert got == want


def test_foreach_batch_sink(spark, sf_dir, stream_src, tmp_path):
    """foreachBatch: arbitrary batch-sink logic per micro-batch (absent
    from the reference; standard custom-sink escape hatch)."""
    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "fb_out")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        batch_df.groupBy("event_type").count().write.mode("append").parquet(out)

    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )
    q = sdf.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(timeout=120)
    assert len(seen) >= 2  # one call per micro-batch
    total = (
        spark.read.parquet(out).agg(F.sum("count").alias("s")).first()["s"]
    )
    assert total == load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).count()
