"""Live JDBC round-trip (S3 + S8) against embedded Derby.

Spark ships Derby on its own classpath (it backs the Hive metastore), so
the jdbc_writer/jdbc_reader builders can be executed for real with zero
extra jars: write → read back → value-compare. Embedded Derby is
single-JVM, which is exactly what local-mode tests are — on a cluster
the same builders take a server-side URL (PostgreSQL in the reference,
data_mart.scala:78-85,138-146) and run unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.sources.connectors import jdbc_reader, jdbc_writer

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, sf_dir, derby_url):
    src = (
        load_table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    jdbc_writer(
        src, derby_url, "nation_mart", user="app", password="app",
        driver=DERBY_DRIVER,
    ).save()
    back = jdbc_reader(
        spark, derby_url, "nation_mart", user="app", password="app",
        driver=DERBY_DRIVER,
    ).load()
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.collect())
    assert got == want


def test_jdbc_overwrite_mode_replaces(spark, sf_dir, derby_url):
    first = spark.range(5).select(F.col("id").cast("int").alias("v"))
    second = spark.range(3).select((F.col("id") + 100).cast("int").alias("v"))
    for frame in (first, second):
        jdbc_writer(
            frame, derby_url, "overwrite_probe", user="app", password="app",
            driver=DERBY_DRIVER,
        ).save()
    back = jdbc_reader(
        spark, derby_url, "overwrite_probe", user="app", password="app",
        driver=DERBY_DRIVER,
    ).load()
    assert sorted(r["v"] for r in back.collect()) == [100, 101, 102]


def test_streaming_upsert_into_derby(spark, sf_dir, derby_url, tmp_path):
    """Streaming update-mode aggregation upserted into a LIVE JDBC
    store per micro-batch (foreachBatch stage + delete/insert): the
    executed twin of the reference's streaming ES sink
    (dashboard.scala:46-60). Final table state must equal the batch
    aggregation exactly."""
    from scala_data_pipeline_spark.streaming.jdbc_sink import jdbc_upsert_sink

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    src = str(tmp_path / "events_src")
    events.repartition(4).write.mode("overwrite").parquet(src)

    agg = lambda df: df.groupBy("event_type").agg(  # noqa: E731
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches → several upserts
        .parquet(src)
    )
    q = (
        agg(sdf)
        .writeStream.outputMode("update")
        .foreachBatch(
            jdbc_upsert_sink(
                spark, derby_url, "evt_counts", ("event_type",),
                user="app", password="app", driver=DERBY_DRIVER,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive
    back = jdbc_reader(
        spark, derby_url, "evt_counts", user="app", password="app",
        driver=DERBY_DRIVER,
    ).load()
    got = {r["event_type"]: r["cnt"] for r in back.collect()}
    want = {r["event_type"]: r["cnt"] for r in agg(events).collect()}
    assert got == want
