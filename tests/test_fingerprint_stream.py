"""Streaming maintenance of the table fingerprint: per-micro-batch
partial hash sums (the fold is additive decimal arithmetic) merge to
EXACTLY the batch fingerprint — continuous integrity checking of an
append-only table without ever rescanning it."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.queries.frontier import (
    orders_row_hash,
    table_fingerprint,
)
from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_streamed_partials_merge_to_batch_fingerprint(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    src = str(tmp_path / "src")
    orders.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")

    def append_partial(batch_df, batch_id):
        batch_df.select(orders_row_hash().alias("h")).agg(
            F.lit(batch_id).alias("batch_id"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("decimal(38,0)").alias("partial"),
        ).write.mode("append").parquet(target)

    sdf = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(append_partial)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    partials = spark.read.parquet(target)
    assert partials.select("batch_id").distinct().count() >= 2
    merged = partials.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("partial").cast("decimal(38,0)").cast("string").alias("fp"),
    ).collect()[0]
    batch = table_fingerprint(spark, SF).collect()[0]
    assert (merged.n_rows, merged.fp) == (batch.n_rows, batch.fingerprint)
