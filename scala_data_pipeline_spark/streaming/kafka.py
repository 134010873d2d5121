"""Kafka source/sink builders (SURVEY.md §2.1 S6/S7/S12, §2.9 T4-T6).

Reference parity:
- batch-bounded Kafka read with ``startingOffsets`` either ``earliest``
  or a per-partition JSON map (filter/filter.scala:28-36) —
  ``offsets_json`` builds the ``{"topic": {"0": N}}`` form;
- streaming read (agg/agg.scala:31-38);
- streaming write of ``to_json(struct(*))`` payloads with checkpoint,
  update mode, processing-time trigger, failOnDataLoss=false
  (agg/agg.scala:69-82).

The spark-sql-kafka connector jar is not bundled in this container, so
these builders construct fully-configured readers/writers but are
exercised only for option plumbing in tests; on a cluster with the jar
present they run as-is.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def offsets_json(topic: str, partition_offsets: dict[int, int]) -> str:
    """Per-partition starting offsets, the hand-built JSON of
    filter/filter.scala:31-33."""
    return json.dumps({topic: {str(p): o for p, o in partition_offsets.items()}})


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Bounded Kafka read (S6). Returns the configured DataFrameReader;
    ``.load()`` executes it."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", "latest")
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    fail_on_data_loss: bool = False,
):
    """Unbounded micro-batch Kafka read (S7, T6)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )


def parse_kafka_json(df: DataFrame, schema: StructType | str) -> DataFrame:
    """value(binary) → cast string → from_json(schema) → star-expand —
    the parse chain every reference consumer runs
    (filter/filter.scala:39-52, agg/agg.scala:41-55)."""
    return (
        df.select(F.col("value").cast("string").alias("json"))
        .select(F.from_json("json", schema).alias("value"))
        .select("value.*")
    )


def kafka_stream_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "update",
    trigger_seconds: int = 10,
) -> DataStreamWriter:
    """to_json(struct(*)) → Kafka sink with checkpoint + processing-time
    trigger (S12, T3-T5). Returns the configured writer; ``.start()``
    launches the query."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
