"""Streaming KS drift = batch KS drift, exactly.

The drift partial store (streaming/drift_sink.py) maintains per-value
click/view count partials from micro-batches; the KS statistic read
from the merged store must be BIT-IDENTICAL to the batch query over
the full history — long counts are exactly additive and both paths
finish through the same ks_from_value_counts code."""

from __future__ import annotations

from scala_data_pipeline_spark.queries.tsstats_infer import (
    ks_from_value_counts,
    ks_value_counts,
)
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.drift_sink import (
    drift_append_sink,
    merged_value_counts,
    read_ks_drift,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"


def test_streamed_ks_equals_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(drift_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # More than one partial fragment must exist for the merge to be
    # exercised (4 source files -> 4 micro-batches).
    frags = read_partials(spark, target).count()
    merged = merged_value_counts(spark, target).count()
    assert frags > merged

    streamed = read_ks_drift(spark, target).collect()
    batch = ks_from_value_counts(ks_value_counts(events)).collect()
    assert len(streamed) == len(batch) == 1
    assert streamed[0].asDict() == batch[0].asDict()  # bit-identical
