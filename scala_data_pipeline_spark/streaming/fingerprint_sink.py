"""Streaming maintenance of the table fingerprint
(queries/frontier.py::table_fingerprint) — continuous integrity
checking of an append-only table without ever rescanning it.

Each micro-batch writes ONE partial row (its row count plus the
additive decimal sum of the shared per-row hash term) into its own
``batch-{batch_id}/`` subdir; readers sum partials on read. The fold
is an exact decimal addition, so the merged fingerprint is
bit-identical to one batch pass over the full table regardless of how
rows were sliced into batches (test_fingerprint_stream.py asserts
this). Per-batch overwrite follows the family contract in
streaming/partial_store.py: a replayed batch rewrites its own subdir
instead of appending a second partial that would shift the hash sum.

At 100 TB the store holds one ~100-byte row per micro-batch — the
integrity check of an unbounded ingest costs a sum over partial rows,
never a table rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries.frontier import orders_row_hash
from .partial_store import per_batch_writer, read_partials

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n_rows", T.LongType()),
        T.StructField("partial", T.DecimalType(38, 0)),
    ]
)


def fingerprint_append_sink(target_dir: str):
    """``foreachBatch`` function: write this micro-batch's (n_rows,
    hash-sum partial) row into ``batch-{batch_id}/`` (overwrite →
    retry-idempotent). Uses the IDENTICAL per-row hash expression the
    batch operator folds, so the store can never drift from the batch
    semantics."""

    def partial(batch_df: DataFrame) -> DataFrame:
        return batch_df.select(orders_row_hash().alias("h")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("decimal(38,0)").alias("partial"),
        )

    return per_batch_writer(target_dir, partial)


def read_fingerprint(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: the exact full-history fingerprint (same output
    columns as the batch ``table_fingerprint``). An absent store reads
    as the empty table's fingerprint (0 rows, NULL sum)."""
    partials = read_partials(spark, target_dir, schema=_PARTIAL_SCHEMA)
    return partials.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        F.sum("partial").cast("decimal(38,0)").cast("string").alias(
            "fingerprint"
        ),
    )
