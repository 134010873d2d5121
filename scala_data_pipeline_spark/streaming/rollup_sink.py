"""Streaming maintenance of the multi-granularity rollup
(operators/rollup.py) — the continuous-aggregate write path.

Each micro-batch appends its own hourly DECIMAL partials as immutable
parquet files; readers merge partials on read (hour groups collapse
per-batch fragments, then days merge hours). Append-only maintenance
means no read-modify-write races, no coordination between the stream
and readers, and object-store-friendly immutable files — the same
segment model Druid/TimescaleDB-style continuous aggregates use.
Because the partials are exactly mergeable (associative decimal sums,
see operators/rollup.py), the merged result is bit-identical to a
batch rollup over the full history, which the streaming test asserts.

A compaction job (rewrite many small partial files into one partial
per hour) is the same ``read → hourly-merge → overwrite`` plan run
offline; at 100 TB the partial files are tiny compared to raw events,
so compaction pressure is low.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import hourly_rollup, hourly_user_sketches
from .partial_store import per_batch_writer, read_partials


def _batch_partials(batch_df: DataFrame) -> DataFrame:
    return hourly_rollup(batch_df).join(
        hourly_user_sketches(batch_df), on="bucket_hour"
    )


def rollup_append_sink(target_dir: str):
    """``foreachBatch`` function: write this micro-batch's hourly
    partials — additive stats AND the HLL distinct-user sketch (a
    binary column; sketches survive parquet and merge with
    ``hll_union_agg``, so the non-additive statistic rolls up too) —
    into ``batch-{batch_id}/`` (overwrite → retry-idempotent under
    foreachBatch's at-least-once delivery; a replayed append would
    double-count the additive partials, see streaming/partial_store.py)."""
    return per_batch_writer(target_dir, _batch_partials)


def merged_hourly(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge-on-read: collapse per-batch partial fragments into one
    partial row per hour (decimal sums stay exact; sketches union)."""
    from pyspark.sql import functions as F

    partials = read_partials(spark, target_dir)
    return partials.groupBy("bucket_hour").agg(
        F.sum("revenue_partial").alias("revenue_partial"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("n_purchases").cast("long").alias("n_purchases"),
        F.hll_union_agg("users_sketch").alias("users_sketch"),
    )


def read_daily_rollup(spark: SparkSession, target_dir: str) -> DataFrame:
    """The continuous aggregate's query surface: daily rollup from the
    maintained partial store, including the sketch-estimated distinct
    users (exact in the sparse regime — see operators/rollup.py)."""
    from pyspark.sql import functions as F

    hourly = merged_hourly(spark, target_dir)
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("bucket_hour")).alias("bucket_day")
        )
        .agg(
            F.sum("revenue_partial").cast("double").alias("revenue"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("n_purchases").cast("long").alias("n_purchases"),
            F.count("*").cast("long").alias("n_active_hours"),
            F.hll_sketch_estimate(F.hll_union_agg("users_sketch"))
            .cast("long")
            .alias("n_distinct_users_est"),
        )
    )
