"""Small-file compaction: rewrite a (possibly partitioned) parquet
dataset into ~``target_bytes`` files — the lakehouse maintenance job
that keeps 100 TB table scans from drowning in file-open overhead
(streaming sinks and frequent small appends both produce file counts
that grow without bound).

Sizing uses the dataset's ACTUAL on-disk bytes (Hadoop FS walk — no
data read), so the rewrite is one repartition whose width is
data-driven, not guessed. Round-robin repartition gives uniform output
sizes; partitioned layouts compact per partition directory via
``files_per_partition`` instead (repartition on the partition key would
put each Hive partition in one task regardless of size).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from ..sources.sinks import write_partitioned

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` (driver-side FS metadata walk)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Read ``src`` parquet, rewrite to ``dst`` with ~target-sized
    files. Returns the compacted frame (lazy; the write has run)."""
    df = spark.read.parquet(src)
    n_files = max(1, math.ceil(dataset_bytes(spark, src) / target_bytes))
    if partition_cols:
        write_partitioned(
            df, dst, partition_cols, files_per_partition=n_files
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)
