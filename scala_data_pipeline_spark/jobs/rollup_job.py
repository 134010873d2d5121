"""Continuous-aggregate job: build and serve multi-granularity rollups.

Not a reference module — the reference aggregates at one granularity
only (agg/agg.scala:58-63). This job packages the engine's
continuous-aggregate machinery (operators/rollup.py +
streaming/rollup_sink.py) into the same thin-job shape as the seven
reference-mirroring jobs:

- ``run_batch``: raw events → hourly DECIMAL partials (+ HLL
  distinct-user sketch) written as the partial store — the initial
  backfill of a continuous aggregate.
- ``run_stream``: micro-batches append immutable partial files to the
  same store (foreachBatch; exactly the segment model of the batch
  path, so backfill and live maintenance produce one unified store).
- ``read_daily``: the query surface — merge-on-read to daily grain
  with exact additive stats and sketch-estimated distinct users.

At 100 TB: the backfill is one scan + one hour-grain shuffle; the
partial store is ~(hours × sources) rows, orders of magnitude smaller
than raw; streaming appends touch only each micro-batch's hours; and
compaction (collapse per-batch fragments) is ``read → hourly-merge →
overwrite`` run offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import hourly_rollup, hourly_user_sketches
from ..streaming.rollup_sink import read_daily_rollup, rollup_append_sink


def run_batch(
    spark: SparkSession,
    events: DataFrame,
    target_dir: str,
    backfill_id: str = "default",
) -> None:
    """Backfill the partial store from a batch of raw events. Writes
    into a ``batch-backfill-{backfill_id}/`` subdir with overwrite, so
    a RE-RUN of the same backfill replaces itself instead of
    double-counting (the same retry-idempotence rule the streaming
    path keys by batch id, see streaming/partial_store.py), while
    DISTINCT backfills — different event slices under different ids —
    coexist as separate segments (advisor round-11: a single fixed
    subdir silently discarded the first of two incremental backfills).
    """
    if not backfill_id or "/" in backfill_id:
        raise ValueError(f"invalid backfill_id: {backfill_id!r}")
    partials = hourly_rollup(events).join(
        hourly_user_sketches(events), on="bucket_hour"
    )
    partials.write.mode("overwrite").parquet(
        f"{target_dir}/batch-backfill-{backfill_id}"
    )


def run_stream(
    spark: SparkSession,
    events_stream: DataFrame,
    target_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain the partial store from a streaming source. Returns the
    started StreamingQuery (caller awaits)."""
    writer = (
        events_stream.writeStream.foreachBatch(rollup_append_sink(target_dir))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_daily(spark: SparkSession, target_dir: str) -> DataFrame:
    """Serve the daily grain from the maintained store."""
    return read_daily_rollup(spark, target_dir)
