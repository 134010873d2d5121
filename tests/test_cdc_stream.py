"""Streaming CDC ingest = batch CDC apply, exactly.

The CDC partial store (streaming/cdc_sink.py) appends per-batch
latest-change-per-key partials; the state read from the merged store
must be BIT-IDENTICAL to one batch cdc_latest_wins over the full
changelog — including delete-then-upsert interleavings ACROSS batches,
the case that breaks naive sequential-MERGE designs (the store holds
the compacted log, which is associative, not applied state, which is
not)."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.operators.scd import cdc_latest_wins
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.cdc_sink import (
    cdc_append_sink,
    read_cdc_state,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"


def _base(spark):
    return load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )


def _log(spark):
    return load_table(spark, SF, "orders").select(
        F.col("o_custkey").alias("cust_key"),
        F.when(F.col("o_orderstatus") == "F", "D")
        .otherwise("U")
        .alias("op"),
        F.round("o_totalprice", 2).alias("new_acctbal"),
        "o_orderdate",
        "o_orderkey",
    )


def test_streamed_cdc_equals_batch(spark, tmp_path):
    log = _log(spark)
    src = str(tmp_path / "src")
    # random split across files → delete/upsert interleavings for the
    # same key land in different micro-batches
    log.repartition(6).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")
    sdf = (
        spark.readStream.schema(log.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(cdc_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # partial grain: keys-seen x batches > distinct keys → merge real
    n_partial = read_partials(spark, target).count()
    n_keys = log.select("cust_key").distinct().count()
    assert n_partial > n_keys

    base = _base(spark)
    streamed = {
        r["cust_key"]: (r["name"], str(r["acctbal"]), r["last_op"])
        for r in read_cdc_state(spark, target, base).collect()
    }
    batch = {
        r["cust_key"]: (r["name"], str(r["acctbal"]), r["last_op"])
        for r in cdc_latest_wins(base, log).collect()
    }
    assert streamed == batch
    # the fixture must actually exercise deletes (absent keys)
    assert len(batch) < base.count() + 1
