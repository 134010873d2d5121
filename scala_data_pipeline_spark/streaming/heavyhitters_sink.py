"""Streaming maintenance of SpaceSaving heavy-hitter summaries.

Same segment model as the continuous-aggregate sink
(streaming/rollup_sink.py): each micro-batch appends its own
per-partition SpaceSaving summaries (ext/heavyhitters.py) as immutable
parquet files tagged with the batch id; readers merge on read with one
groupBy over summary rows. No read-modify-write state, no coordination
— and the merged estimate keeps the mergeable-summaries contract
(Agarwal et al., PODS 2012):

- any token whose total stream frequency exceeds the detection
  guarantee Σ_{batch,partition} n/m is certainly present, and
- merged est never exceeds true + merged err.

The guarantee threshold is itself derivable from the partial store
(one row per (batch, partition) carries that stream's item count), so
the reader can report "everything above N is guaranteed in here"
without any side channel. State growth is m rows per (batch,
partition) of SUMMARY data — KBs per batch against an unbounded token
stream; compaction = re-running the merge and writing one summary
back, which is again a valid SpaceSaving summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.heavyhitters import M_COUNTERS, spacesaving_summaries
from .partial_store import per_batch_writer, read_partials


def heavyhitters_append_sink(target_dir: str, m: int = M_COUNTERS):
    """``foreachBatch`` function: write this micro-batch's
    per-partition SpaceSaving summaries (tagged with the batch id)
    into ``batch-{batch_id}/`` via the shared per-batch writer
    (retry-idempotent atomic install; a replayed append would
    double-count est/err AND inflate the detection guarantee Σ n/m,
    see streaming/partial_store.py)."""

    def summaries(batch_df: DataFrame, batch_id: int) -> DataFrame:
        return spacesaving_summaries(batch_df, m).withColumn(
            "batch_id", F.lit(batch_id)
        )

    return per_batch_writer(target_dir, summaries)


def merged_heavy_hitters(
    spark: SparkSession, target_dir: str, k: int = 20
) -> DataFrame:
    """Merge-on-read: approximate top-k over the whole stream so far."""
    partials = read_partials(spark, target_dir)
    return (
        partials.groupBy("token")
        .agg(F.sum("est").alias("est"), F.sum("err").alias("err"))
        .orderBy(F.desc("est"), "token")
        .limit(k)
        .select("token", "est", "err")
    )


def stream_guarantee(
    spark: SparkSession, target_dir: str, m: int = M_COUNTERS
) -> float:
    """Detection threshold Σ n/m across every (batch, partition)
    stream summarized into the store."""
    partials = read_partials(spark, target_dir)
    row = (
        partials.select("batch_id", "pid", "n_part")
        .distinct()
        .agg(F.sum(F.col("n_part") / m).alias("g"))
        .collect()[0]
    )
    return float(row.g or 0.0)


def merged_summary(spark: SparkSession, target_dir: str) -> DataFrame:
    """Full merged summary (for bound checks / compaction): token,
    summed est and err over every partial."""
    partials = read_partials(spark, target_dir)
    return partials.groupBy("token").agg(
        F.sum("est").alias("est"), F.sum("err").alias("err")
    )
