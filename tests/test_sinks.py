"""Sink layouts: partitioned pruning and bucketed shuffle-free joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.plans import plan_audit
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.sources.sinks import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "p_date", F.date_format("ts", "yyyyMMdd")
    )
    out = str(tmp_path / "events_part")
    write_partitioned(events, out, ["p_date"], files_per_partition=1)
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("p_date") == "20240115")
    plan = plan_audit(one_day)["plan"]
    # partition pruning: the scan location narrows to the matching dir
    assert one_day.count() == events.filter(F.col("p_date") == "20240115").count()
    assert "PartitionFilters" in plan


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    left = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    right = events.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.count(F.lit(1)).alias("n_buys"))
    write_bucketed(left, "t_left", "user_id", 4)
    write_bucketed(right, "t_right", "user_id", 4)
    joined = read_bucketed(spark, "t_left").join(
        read_bucketed(spark, "t_right"), on="user_id"
    )
    audit = plan_audit(joined)
    # bucketed-on-same-key join: zero shuffle exchanges in the plan
    assert audit["n_shuffle_exchanges"] == 0, audit["plan"]
    assert joined.count() == right.count()
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")
