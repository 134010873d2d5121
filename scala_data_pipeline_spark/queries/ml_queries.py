"""ML-pipeline query (M1-M5): train on documents (text→lang), batch-
infer, return the confusion matrix.

Training is not SQL-expressible, but the pipeline is deterministic BY
CONSTRUCTION — sorted token arrays, rows pre-sorted by doc_id, and the
training frame collapsed to one sorted partition so LBFGS gradient sums
see a fixed float-addition order regardless of the session's
parallelism / shuffle-partition settings. That makes the sf0.01
confusion matrix a fixed table, frozen below as a VALUES-literal DuckDB
oracle (regenerate with ``python -m
scala_data_pipeline_spark.queries.ml_queries`` after any intentional
pipeline change). tests/test_ml.py covers save/load + streaming
inference; tests/test_ml.py::test_confusion_matrix_deterministic pins
cross-config stability."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.pipeline import prepare_training_frame, train_model
from ..sources import load_table


def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # One sorted partition for the fit: the labeled training set is
    # small relative to the cluster, and a single fixed row order is
    # what pins CountVectorizer's vocabulary and LR's gradient-sum float
    # order across sessions. Inference below stays fully parallel — at
    # 100 TB the corpus being scored is the big side, not the labeled
    # training set.
    train_df = (
        prepare_training_frame(docs).coalesce(1).sortWithinPartitions("doc_id")
    )
    model = train_model(train_df, vocab_size=256)
    predictions = model.transform(prepare_training_frame(docs))
    return (
        predictions.groupBy(
            F.col("label_str").alias("actual"),
            F.col("category").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _frozen_oracle() -> str:
    """VALUES-literal oracle, gated by a corpus checksum.

    The matrices are output FIXTURES, not independent recomputations:
    DuckDB cannot train a LogisticRegression, so the determinism
    argument above (plus the cross-config pytest pin) is what carries
    the check. Each frozen matrix is keyed to its corpus by
    SUM(LENGTH(text)) over the documents view — the oracle emits the
    matrix matching whichever sf dir the views point at (sf0.001 for
    the local sweep, sf0.01 for the driver), and 0 rows — a loud
    row-count fail, never a silent pass — on an unknown corpus."""
    blocks = []
    for checksum, matrix in (
        (153156, ML_CONFUSION_SF0001),
        (149174, ML_CONFUSION_SF001),
        (1485576, ML_CONFUSION_SF01),
    ):
        rows = ",\n  ".join(f"('{a}', '{p}', {c})" for a, p, c in matrix)
        blocks.append(
            "SELECT actual, predicted, CAST(cnt AS BIGINT) AS cnt\n"
            f"FROM (VALUES\n  {rows}\n) AS t(actual, predicted, cnt)\n"
            f"WHERE (SELECT SUM(LENGTH(text)) FROM documents) = {checksum}"
        )
    return "\nUNION ALL\n".join(blocks)


# Frozen confusion matrices — regenerate via __main__ below. Each
# verified identical across local[8]/shuffle=200 and local[32]/shuffle=17.
ML_CONFUSION_SF0001: tuple[tuple[str, str, int], ...] = (
    ("de", "de", 20),
    ("de", "en", 43),
    ("de", "es", 1),
    ("de", "fr", 6),
    ("de", "zh", 1),
    ("en", "de", 6),
    ("en", "en", 160),
    ("en", "es", 9),
    ("en", "fr", 10),
    ("en", "zh", 8),
    ("es", "de", 5),
    ("es", "en", 55),
    ("es", "es", 15),
    ("es", "fr", 3),
    ("es", "zh", 2),
    ("fr", "de", 1),
    ("fr", "en", 57),
    ("fr", "es", 2),
    ("fr", "fr", 20),
    ("fr", "zh", 2),
    ("zh", "de", 6),
    ("zh", "en", 49),
    ("zh", "es", 4),
    ("zh", "fr", 4),
    ("zh", "zh", 11),
)

ML_CONFUSION_SF001: tuple[tuple[str, str, int], ...] = (
    ("de", "de", 5),
    ("de", "en", 59),
    ("de", "es", 1),
    ("de", "fr", 2),
    ("de", "zh", 3),
    ("en", "de", 3),
    ("en", "en", 198),
    ("en", "es", 3),
    ("en", "fr", 6),
    ("en", "zh", 8),
    ("es", "de", 1),
    ("es", "en", 55),
    ("es", "es", 9),
    ("es", "fr", 4),
    ("es", "zh", 4),
    ("fr", "en", 49),
    ("fr", "es", 1),
    ("fr", "fr", 13),
    ("fr", "zh", 1),
    ("zh", "de", 1),
    ("zh", "en", 53),
    ("zh", "es", 5),
    ("zh", "fr", 2),
    ("zh", "zh", 14),
)

ML_CONFUSION_SF01: tuple[tuple[str, str, int], ...] = (
    ("de", "de", 1),
    ("de", "en", 700),
    ("de", "es", 1),
    ("en", "en", 2056),
    ("en", "es", 3),
    ("es", "de", 1),
    ("es", "en", 743),
    ("fr", "en", 742),
    ("zh", "en", 752),
    ("zh", "es", 1),
)

QUERIES = {"ml_confusion_matrix": ml_confusion_matrix}
ORACLES: dict[str, str] = {}
if ML_CONFUSION_SF001:
    ORACLES["ml_confusion_matrix"] = _frozen_oracle()


if __name__ == "__main__":
    from ..session import get_session

    spark = get_session()
    for label, sf in (
        ("SF0001", "sf0.001"),
        ("SF001", "sf0.01"),
        ("SF01", "sf0.1"),
    ):
        got = sorted(
            (r["actual"], r["predicted"], r["cnt"])
            for r in ml_confusion_matrix(
                spark, f"/root/testdata/{sf}"
            ).collect()
        )
        print(f"ML_CONFUSION_{label} =", repr(tuple(got)))
