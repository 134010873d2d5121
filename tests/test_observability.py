"""Observability surfaces a 100 TB operator needs around its queries:

- ``df.observe``: accumulator-style metrics collected DURING the one
  pass the query already makes — row counts / sums / null counts with
  zero extra scans (vs a .count() that re-runs the plan).
- the Spark 4 state data source: offline inspection of a streaming
  query's checkpointed state (what IS in the window store?) without
  touching the running query — the debugging path when a 100 TB
  stream's state grows unexpectedly.
- parquet schema evolution via mergeSchema: v2 files add a column,
  old files read as nulls — the contract long-lived tables rely on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_observe_metrics_single_pass(spark):
    obs = Observation("orders_metrics")
    orders = load_table(spark, SF, "orders")
    df = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_keys"),
    ).filter(F.col("o_orderstatus") == "F")
    filtered = df.count()
    got = obs.get
    # observed metrics cover the PRE-filter scan: the whole table in
    # the same single pass that produced the filtered count
    assert got["n"] == orders.count()
    assert got["null_keys"] == 0
    exact = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("r")
    ).collect()[0].r
    assert got["revenue"] == exact
    assert 0 < filtered <= got["n"]


def test_state_store_reader(spark, sf_dir, tmp_path):
    """Run a watermarked windowed agg to completion, then read its
    state store offline with the Spark 4 state data source."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.orderBy("ts").coalesce(4).write.mode("overwrite").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("state_probe")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    state = spark.read.format("statestore").load(ckpt)
    n_state = state.count()
    assert n_state > 0
    # state rows carry (key = window struct, value = running count):
    # every live window's count must match a batch count of its slice
    rows = state.collect()
    assert {"key", "value"} <= set(state.columns)
    batch = {
        (r.w.start, r.w.end): r.n
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        win = (r.key.window.start, r.key.window.end)
        # the value struct's field carries the internal agg name
        # ("count"); index it positionally (Row.count is the method)
        assert batch.get(win) == r.value[0], (win, r.value)


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    base = str(tmp_path / "tbl")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(
        f"{base}/v1"
    )
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS a", "CAST(id AS STRING) AS b"
    ).write.parquet(f"{base}/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/v1", f"{base}/v2"
    )
    assert set(merged.columns) == {"id", "a", "b"}
    assert merged.count() == 10
    assert merged.filter(F.col("b").isNull()).count() == 5
