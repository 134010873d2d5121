"""Streaming anomaly detection = batch anomaly detection, exactly.

The continuous-aggregate store (streaming/rollup_sink.py) maintains
daily DECIMAL revenue partials from micro-batches; composing the
rolling z-score (queries/tsstats.py zscore_daily) over the merged
store must give BIT-IDENTICAL rows to the same z-score computed over
the full batch history — the payoff of exact decimal partials: the
anomaly monitor needs no batch backfill to agree with offline
analytics."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.operators.rollup import daily_rollup
from scala_data_pipeline_spark.queries.tsstats import zscore_daily
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.rollup_sink import (
    read_daily_rollup,
    rollup_append_sink,
)

SF = "/root/testdata/sf0.001"


def _to_daily_series(rollup_df):
    return rollup_df.select(
        F.datediff(
            F.col("bucket_day").cast("date"), F.lit("1970-01-01")
        )
        .cast("long")
        .alias("day"),
        F.col("revenue").cast("decimal(18,4)").alias("rev"),
    )


def test_streamed_anomalies_equal_batch(spark, tmp_path):
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
        sdf.writeStream.foreachBatch(rollup_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    streamed = zscore_daily(
        _to_daily_series(read_daily_rollup(spark, target))
    ).collect()
    batch = zscore_daily(_to_daily_series(daily_rollup(events))).collect()
    assert len(streamed) > 0
    s = {r.day: (r.revenue, r.z28, r.is_anomaly) for r in streamed}
    b = {r.day: (r.revenue, r.z28, r.is_anomaly) for r in batch}
    assert s == b
