"""backfill_partitions: dynamic partition overwrite replaces exactly
the recomputed partitions and leaves every other partition's files
byte-identical on disk."""

from __future__ import annotations

import glob
import hashlib
import os

import pyspark.sql.functions as F

from scala_data_pipeline_spark.jobs.backfill_job import (
    backfill_partitions,
)
from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _file_hashes(root: str) -> dict[str, str]:
    out = {}
    for p in glob.glob(f"{root}/**/part-*", recursive=True):
        with open(p, "rb") as fh:
            out[os.path.relpath(p, root)] = hashlib.md5(
                fh.read()
            ).hexdigest()
    return out


def test_backfill_touches_only_target_partitions(spark, tmp_path):
    table = str(tmp_path / "mart")
    daily = (
        load_table(spark, SF, "orders")
        .withColumn("day", F.to_date("o_orderdate"))
        .groupBy("day", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )
    daily.write.partitionBy("o_orderstatus").parquet(table)
    before = _file_hashes(table)
    statuses = sorted(
        r["o_orderstatus"]
        for r in daily.select("o_orderstatus").distinct().collect()
    )
    assert len(statuses) >= 2
    target = statuses[0]

    mode_before = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )

    def recompute(s):
        # the "fix": target partition's revenue re-derived doubled
        return daily.filter(
            F.col("o_orderstatus") == target
        ).withColumn("revenue", F.col("revenue") * 2)

    backfill_partitions(
        spark, table, partition_col="o_orderstatus", recompute=recompute
    )
    after = _file_hashes(table)

    untouched_before = {
        k: v for k, v in before.items() if f"={target}" not in k
    }
    untouched_after = {
        k: v for k, v in after.items() if f"={target}" not in k
    }
    assert untouched_before == untouched_after  # byte-identical files

    got = spark.read.parquet(table)
    fixed = {
        (str(r["day"]), round(r["revenue"], 4))
        for r in got.filter(F.col("o_orderstatus") == target).collect()
    }
    want = {
        (str(r["day"]), round(r["revenue"] * 2, 4))
        for r in daily.filter(F.col("o_orderstatus") == target).collect()
    }
    assert fixed == want
    # caller's conf restored after the forced-dynamic write
    assert (
        spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        == mode_before
    )
