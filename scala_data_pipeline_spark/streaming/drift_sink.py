"""Streaming maintenance of the KS drift monitor's per-value counts —
the distribution-drift analogue of the revenue rollup store
(streaming/rollup_sink.py).

Each micro-batch appends its own (value, c_click, c_view) count
partials as immutable parquet files; readers merge on read by
summation. Longs are exactly additive, so the merged frame — and
therefore the KS statistic computed from it via the SAME
``ks_from_value_counts`` code path the batch query uses — is
bit-identical to a single batch pass over the full history
(test_drift_stream.py asserts this). At 100 TB the partial store is
bounded by the distinct value domain per batch, not the event count:
a drift monitor that never rescans raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .partial_store import per_batch_writer, read_partials


def drift_append_sink(target_dir: str):
    """``foreachBatch`` function: write this micro-batch's per-value
    click/view count partials into ``batch-{batch_id}/`` (overwrite →
    retry-idempotent; a replayed append would double-count the long
    sums, see streaming/partial_store.py)."""
    from ..queries.tsstats_infer import ks_value_counts

    return per_batch_writer(target_dir, ks_value_counts)


def merged_value_counts(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: collapse per-batch count fragments into one row
    per distinct value (exact long sums)."""
    from pyspark.sql import functions as F

    partials = read_partials(spark, target_dir)
    return partials.groupBy("v").agg(
        F.sum("c_click").cast("long").alias("c_click"),
        F.sum("c_view").cast("long").alias("c_view"),
    )


def read_ks_drift(spark: SparkSession, target_dir: str) -> DataFrame:
    """The monitor's query surface: the exact KS statistic from the
    maintained partial store."""
    from ..queries.tsstats_infer import ks_from_value_counts

    return ks_from_value_counts(merged_value_counts(spark, target_dir))
