"""Streaming HDR histogram = batch HDR histogram, exactly.

The HDR partial store (streaming/hdr_sink.py) appends per-batch
(e, sub, cnt) bucket partials; the quantile estimates read from the
merged store must be BIT-IDENTICAL to the batch query over the full
history — integer bucketing is partitioning-independent, long counts
are exactly additive, and both paths finish through the same
hdr_quantiles code."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.hdrhist import (
    hdr_histogram,
    hdr_quantiles,
)
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.hdr_sink import (
    hdr_append_sink,
    merged_histogram,
    read_hdr_quantiles,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"


def test_streamed_hdr_equals_batch(spark, tmp_path):
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
        sdf.writeStream.foreachBatch(hdr_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # multiple per-batch fragments must exist so the merge is exercised
    n_partial_rows = read_partials(spark, target).count()
    batch_hist = {
        (r["e"], r["sub"]): r["cnt"]
        for r in hdr_histogram(events, "value").collect()
    }
    merged = {
        (r["e"], r["sub"]): r["cnt"]
        for r in merged_histogram(spark, target).collect()
    }
    assert n_partial_rows > len(batch_hist)  # fragment grain > bucket grain
    assert merged == batch_hist

    streamed_q = {
        r["q"]: r["est_cents"]
        for r in read_hdr_quantiles(spark, target).collect()
    }
    batch_q = {
        r["q"]: r["est_cents"]
        for r in hdr_quantiles(hdr_histogram(events, "value")).collect()
    }
    assert streamed_q == batch_q
