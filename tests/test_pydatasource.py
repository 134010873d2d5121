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


def test_jsonl_sink_publishes_only_on_commit(spark, tmp_path):
    """Two-phase commit actually two-phase: tasks write dot-prefixed
    .tmp names, commit() renames to part-*.jsonl — so an orphaned file
    from a task that died without committing is invisible to both the
    part-glob and the manifest."""
    import glob
    import json
    import os

    from scala_data_pipeline_spark.sources.pydatasource import register_sink

    register_sink(spark)
    target = str(tmp_path / "out")
    spark.range(50).write.format("jsonl_sink").option("path", target).mode(
        "append"
    ).save()

    # no temp residue after a successful commit
    assert glob.glob(os.path.join(target, ".part-*.tmp")) == []

    # simulate a task that died mid-write: its temp file must be
    # ignored by the part-glob and absent from the manifest
    orphan = os.path.join(target, ".part-deadbeef.jsonl.tmp")
    with open(orphan, "w") as fh:
        fh.write('{"id": 999999}\n')
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert all("deadbeef" not in f["path"] for f in manifest["files"])
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.where("id = 999999").count() == 0
    assert back.count() == 50


def test_jsonl_sink_append_merges_manifest_overwrite_sweeps(spark, tmp_path):
    """Save modes are honored (round-13 review): a second APPEND merges
    the manifest (prior files stay visible, totals add); an OVERWRITE
    replaces both manifest and files, sweeping stale part files so a
    glob reader agrees with the manifest."""
    import glob
    import json
    import os

    from scala_data_pipeline_spark.sources.pydatasource import register_sink

    register_sink(spark)
    target = str(tmp_path / "out")

    spark.range(100).write.format("jsonl_sink").option("path", target).mode(
        "append"
    ).save()
    spark.range(100, 150).write.format("jsonl_sink").option(
        "path", target
    ).mode("append").save()
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest["total_rows"] == 150
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 150

    spark.range(200, 230).write.format("jsonl_sink").option(
        "path", target
    ).mode("overwrite").save()
    manifest = json.load(open(os.path.join(target, "_SUCCESS")))
    assert manifest["total_rows"] == 30
    files_on_disk = set(glob.glob(os.path.join(target, "part-*.jsonl")))
    assert files_on_disk == {f["path"] for f in manifest["files"]}
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 30
    assert back.agg({"id": "min"}).first()[0] == 200


def test_stream_max_rows_per_trigger_rate_limits(spark):
    """maxRowsPerTrigger is real admission control (round-13 review:
    the whole source previously landed in micro-batch 0): with a
    processing-time trigger each micro-batch plans at most that many
    rows, and the stream still drains the source exactly once."""
    import time

    from scala_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", "50")
        .option("totalRows", "300")
        .option("maxRowsPerTrigger", "100")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("pyds_ratelimited")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            got = spark.sql(
                "SELECT COUNT(*) c FROM pyds_ratelimited"
            ).first()["c"]
            if got >= 300:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql(
        "SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM pyds_ratelimited"
    ).first()
    assert got["c"] == 300 and got["d"] == 300
    batches = [
        p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert batches and max(batches) <= 100
    assert len(batches) >= 3  # genuinely incremental
