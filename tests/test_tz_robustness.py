"""Session-timezone robustness: load_table pins UTC per call, so a
caller (or driver) that has set a different session timezone still
gets oracle-identical timestamp results — the failure mode where a
cluster's default TZ silently shifts every date boundary."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_events_ts_invariant_under_foreign_session_tz(spark):
    baseline = {
        (r.event_id, str(r.ts), str(r.d))
        for r in load_table(spark, SF, "events")
        .select("event_id", "ts", F.col("ts").cast("date").alias("d"))
        .collect()
    }
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        again = {
            (r.event_id, str(r.ts), str(r.d))
            for r in load_table(spark, SF, "events")
            .select("event_id", "ts", F.col("ts").cast("date").alias("d"))
            .collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert baseline == again


def test_daily_boundaries_invariant_under_foreign_tz(spark):
    def daily(spark_):
        return {
            (str(r.d), r.n)
            for r in load_table(spark_, SF, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("d"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    base = daily(spark)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        shifted = daily(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert base == shifted
