"""The ``dashboard`` module (dashboard/dashboard.scala): batch inference
of the saved pipeline over logs; predictions written for dashboarding.

The reference's sink is Elasticsearch (S13); the writer here is
format-pluggable with parquet as the harness default — the ES options
builder lives in sources/connectors.py.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_logs(model: PipelineModel, frame: DataFrame) -> DataFrame:
    """transform + projection to (id, predicted category, scored_at)
    (dashboard.scala:34-57)."""
    scored = model.transform(frame)
    return scored.select(
        "doc_id",
        F.col("category").alias("predicted"),
        F.current_timestamp().alias("scored_at"),
    )


def run(
    model_path: str,
    frame: DataFrame,
    out_path: str,
    fmt: str = "parquet",
) -> None:
    model = PipelineModel.load(model_path)  # S14 load
    score_logs(model, frame).write.mode("append").format(fmt).save(out_path)
