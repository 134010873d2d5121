"""The ``mlproject`` module: train (mlproject/train.scala) and real-time
serve (mlproject/test.scala).

Train: logs → per-user domain lists → fit the 4-stage pipeline → save.
Serve: Kafka stream → per-user collect_list state (T7) → model.transform
per micro-batch (T8) → JSON back to Kafka (update mode, 5-s trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.pipeline import train_model
from ..streaming.kafka import kafka_stream_reader, kafka_stream_writer, parse_kafka_json

SERVE_SCHEMA = "uid STRING, visits ARRAY<STRUCT<timestamp: LONG, url: STRING>>"


def train(train_frame: DataFrame, model_path: str, vocab_size: int = 1000) -> None:
    """train_frame: (doc_id|uid, tokens array<string>, label_str) — see
    ml.pipeline.prepare_training_frame for the documents-table shape."""
    model = train_model(train_frame, vocab_size)
    model.write().overwrite().save(model_path)  # S14


def serve(
    spark: SparkSession,
    model_path: str,
    bootstrap_servers: str,
    in_topic: str,
    out_topic: str,
    checkpoint: str,
    trigger_seconds: int = 5,
):
    """Streaming inference (test.scala:49-88): parse visits, extract
    domains, stateful per-uid collect_list, transform, emit."""
    from pyspark.ml import PipelineModel

    from ..functions.text import extract_domain

    model = PipelineModel.load(model_path)
    raw = kafka_stream_reader(spark, bootstrap_servers, in_topic).load()
    parsed = parse_kafka_json(raw, SERVE_SCHEMA)
    domains = parsed.select(
        "uid", F.explode("visits.url").alias("url")
    ).select("uid", F.lower(extract_domain(F.col("url"))).alias("domain"))
    # T7: unbounded keyed state — list grows per uid, update mode emits
    # changed uids each trigger.
    per_user = domains.groupBy("uid").agg(
        F.array_sort(F.collect_list("domain")).alias("tokens")
    )
    scored = model.transform(per_user).select("uid", "category")
    writer = kafka_stream_writer(
        scored,
        bootstrap_servers,
        out_topic,
        checkpoint,
        output_mode="update",
        trigger_seconds=trigger_seconds,
    )
    return writer.start()
