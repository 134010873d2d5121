"""ML-pipeline query (M1-M5): train on documents (text→lang), batch-
infer, return the confusion matrix. Training is not SQL-expressible →
no oracle; the driver records a rows-only check (SURVEY.md §5 note),
and tests/test_ml.py covers save/load + streaming inference."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.pipeline import prepare_training_frame, train_model
from ..sources import load_table


def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    train_df = prepare_training_frame(docs)
    model = train_model(train_df, vocab_size=256)
    predictions = model.transform(train_df)
    return (
        predictions.groupBy(
            F.col("label_str").alias("actual"),
            F.col("category").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


QUERIES = {"ml_confusion_matrix": ml_confusion_matrix}
ORACLES: dict[str, str] = {}
