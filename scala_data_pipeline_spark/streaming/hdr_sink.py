"""Streaming maintenance of the HDR quantile histogram — the latency/
value-distribution analogue of the KS drift store
(streaming/drift_sink.py), same partial-store contract:

each micro-batch appends its own (e, sub, cnt) bucket partials as
immutable parquet files; readers merge on read by summation. Bucket
counts are exactly additive longs and the bucketing itself is pure
integer arithmetic (ext/hdrhist.py), so the merged histogram — and the
quantile estimates computed from it via the SAME ``hdr_quantiles``
code path the batch query uses — is bit-identical to one batch pass
over the full history (test_hdr_stream.py asserts this). At 100 TB
the store is bounded by buckets x batches ((64-M)*2^M per batch,
~1,900 rows), never by the event count: a p99 monitor that never
rescans raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .partial_store import per_batch_writer, read_partials


def hdr_append_sink(target_dir: str, value_col: str = "value"):
    """``foreachBatch`` function: write this micro-batch's bucket
    count partials into ``batch-{batch_id}/`` (overwrite →
    retry-idempotent; a replayed append would double-count the bucket
    longs, see streaming/partial_store.py)."""
    from ..ext.hdrhist import hdr_histogram

    return per_batch_writer(
        target_dir, lambda batch_df: hdr_histogram(batch_df, value_col)
    )


def merged_histogram(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: collapse per-batch bucket fragments into one row
    per (e, sub) bucket (exact long sums)."""
    from pyspark.sql import functions as F

    partials = read_partials(spark, target_dir)
    return partials.groupBy("e", "sub").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def read_hdr_quantiles(spark: SparkSession, target_dir: str) -> DataFrame:
    """The monitor's query surface: quantile estimates from the
    maintained bucket store, through the batch operator's own finisher."""
    from ..ext.hdrhist import hdr_quantiles

    return hdr_quantiles(merged_histogram(spark, target_dir))
