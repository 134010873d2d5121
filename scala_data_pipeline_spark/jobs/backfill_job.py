"""Partition backfill: recompute and atomically replace ONLY the
affected Hive partitions of a partitioned mart — the repair job a
daily pipeline runs when late data or a bug fix invalidates a day.

The load-bearing Spark feature is DYNAMIC partition-overwrite mode
(``spark.sql.sources.partitionOverwriteMode=dynamic``): an
``INSERT OVERWRITE``-style write replaces exactly the partitions the
incoming frame contains and leaves every other partition's files
untouched on disk — at 100 TB the difference between rewriting one
day directory and rewriting the table. Static mode (the default)
would truncate the whole table first; this job force-sets dynamic for
the write and restores the caller's conf after.

tests/test_backfill.py asserts the two invariants that make this a
safe repair primitive: the target partitions carry the recomputed
rows, and the untouched partitions' FILES are byte-identical (not
just value-equal — they were never rewritten).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

PARTITION_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


def backfill_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    recompute: Callable[[SparkSession], DataFrame],
) -> None:
    """Overwrite only the partitions present in ``recompute``'s output.

    ``recompute`` returns the corrected rows for the partitions being
    repaired (and ONLY those partitions — dynamic overwrite replaces
    every partition the frame touches).
    """
    old = spark.conf.get(PARTITION_MODE_KEY, "static")
    spark.conf.set(PARTITION_MODE_KEY, "dynamic")
    try:
        (
            recompute(spark)
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_path)
        )
    finally:
        spark.conf.set(PARTITION_MODE_KEY, old)
