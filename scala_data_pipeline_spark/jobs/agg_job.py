"""The ``agg`` module (agg/agg.scala): Kafka → 60-min tumbling revenue
aggregate → Kafka, update mode, 10-s processing-time trigger.

Fully wired from the reusable pieces: kafka builders (streaming/kafka)
+ the unified windowed agg (streaming/windowed). Runs as-is on a
cluster with the Kafka connector jar; the file-source twin in
tests/test_streaming.py exercises identical plan shapes without a
broker.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..streaming.kafka import kafka_stream_reader, kafka_stream_writer, parse_kafka_json
from ..streaming.windowed import revenue_window_agg

EVENT_SCHEMA = (
    "event_type STRING, category STRING, item_id STRING, "
    "item_price INT, uid STRING, timestamp LONG"
)


def run(
    spark: SparkSession,
    bootstrap_servers: str,
    in_topic: str,
    out_topic: str,
    checkpoint: str,
    window: str = "60 minutes",
    trigger_seconds: int = 10,
    watermark: str | None = None,
):
    """Returns the started StreamingQuery (caller awaitTermination's —
    agg.scala:82)."""
    from pyspark.sql import functions as F

    from ..functions.timefn import epoch_ms_to_timestamp

    raw = kafka_stream_reader(spark, bootstrap_servers, in_topic).load()
    events = parse_kafka_json(raw, EVENT_SCHEMA)
    # Reference event shape → the engine's events shape: epoch-ms uid/
    # item_price become ts/user_id/value (agg.scala:41-58 parse chain).
    shaped = events.select(
        F.col("uid").alias("user_id"),
        F.when(F.col("event_type") == "buy", "purchase")
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.col("item_price").cast("double").alias("value"),
        epoch_ms_to_timestamp(F.col("timestamp")).alias("ts"),
    )
    windowed = revenue_window_agg(shaped, window, watermark=watermark)
    writer = kafka_stream_writer(
        windowed,
        bootstrap_servers,
        out_topic,
        checkpoint,
        output_mode="update",
        trigger_seconds=trigger_seconds,
    )
    return writer.start()
