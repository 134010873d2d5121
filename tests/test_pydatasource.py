"""Custom Python DataSource: batch partitioning + streaming offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import pydatasource


def test_batch_read_partitioned(spark):
    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numPartitions", "4")
        .option("totalRows", "1000")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    # ids are a complete 0..999 range exactly once
    agg = df.agg(
        F.countDistinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).first()
    assert (agg["d"], agg["lo"], agg["hi"]) == (1000, 0, 999)


def test_stream_read_microbatches(spark):
    pydatasource.register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", "100")
        .option("totalRows", "500")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = spark.sql("SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM pyds_stream").first()
    assert got["c"] == 500 and got["d"] == 500


def test_jsonl_sink_roundtrip_with_manifest(spark, tmp_path):
    """Writer contract: unique per-task files, driver-side manifest
    commit, row-exact roundtrip through an independent reader."""
    import json
    import os

    from scala_data_pipeline_spark.sources.pydatasource import register_sink

    register_sink(spark)
    target = str(tmp_path / "out")
    src = spark.range(100).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    )
    src.repartition(4).write.format("jsonl_sink").option(
        "path", target
    ).mode("append").save()

    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest["total_rows"] == 100
    assert len(manifest["files"]) >= 2  # multiple tasks wrote
    for f in manifest["files"]:
        assert os.path.exists(f["path"])

    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 100
    got = {(r.id, r.bucket) for r in back.collect()}
    want = {(r.id, r.bucket) for r in src.collect()}
    assert got == want
