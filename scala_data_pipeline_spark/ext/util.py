"""Shared helpers for the extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition a compute-bound frame up to the session's
    default parallelism — a no-op whenever the scan already produced at
    least that many partitions (the cluster / 100 TB case, where inputs
    split into thousands of tasks).

    Exists for the opposite case: a small single-file scan (one parquet
    row group = one unsplittable task) feeding CPU-heavy per-row work
    (regex shingling, md5, vector math) would otherwise run on ONE core.
    The extra shuffle moves only that small frame, by definition of the
    trigger condition.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
