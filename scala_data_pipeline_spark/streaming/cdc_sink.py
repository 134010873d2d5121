"""Streaming maintenance of a type-1 CDC changelog — the MERGE-ingest
analogue of the drift/index/HDR partial stores, same contract.

Design note (why the store holds the COMPACTED LOG, not applied
state): applying a changelog in two sequential MERGEs is NOT
equivalent to one MERGE of the concatenated log — a delete in batch 1
followed by an upsert in batch 2 resurrects the key as a synthesized
insert, while the one-shot apply sees latest-op = upsert and keeps the
base row. Latest-change-per-key, by contrast, IS associative: the
latest of per-batch latests equals the latest over the full log
(max-by on the total (seq, tiebreak) order). So each micro-batch
appends its own latest-change-per-key partials (bounded by keys-seen
x batches, not rows), and the reader compacts once more and applies
ONE MERGE through the same ``cdc_latest_wins`` code path the batch
query uses — bit-identical to a single batch apply over the whole
history (test_cdc_stream.py asserts this, delete/upsert interleavings
included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .partial_store import per_batch_writer, read_partials

SEQ_COLS = ("o_orderdate", "o_orderkey")
LOG_COLS = ("cust_key", "op", "new_acctbal", *SEQ_COLS)


def _latest_per_key(log: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("cust_key").orderBy(
        *[F.col(c).desc() for c in SEQ_COLS]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*LOG_COLS)
    )


def cdc_append_sink(target_dir: str):
    """``foreachBatch`` function: write this micro-batch's
    latest-change-per-key partials (columns ``LOG_COLS``) into
    ``batch-{batch_id}/``. The latest-wins grain is already
    replay-SAFE under append (max-by is idempotent over duplicates);
    per-batch overwrite is still the family contract — it keeps a
    replayed batch from doubling the store's row count
    (see streaming/partial_store.py)."""
    return per_batch_writer(target_dir, _latest_per_key)


def compacted_log(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: latest change per key across all batch partials
    (associative latest-of-latests)."""
    return _latest_per_key(read_partials(spark, target_dir))


def read_cdc_state(
    spark: SparkSession, target_dir: str, base: DataFrame
) -> DataFrame:
    """The ingest's query surface: current table state = ONE MERGE of
    the compacted log onto ``base``, through the batch operator's own
    code path (operators/scd.py::cdc_latest_wins)."""
    from ..operators.scd import cdc_latest_wins

    return cdc_latest_wins(base, compacted_log(spark, target_dir))
