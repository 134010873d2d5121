"""Streaming maintenance of the table fingerprint
(streaming/fingerprint_sink.py): per-micro-batch partial hash sums
merge to EXACTLY the batch fingerprint — continuous integrity checking
of an append-only table without ever rescanning it."""

from __future__ import annotations

from scala_data_pipeline_spark.queries.frontier import table_fingerprint
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.fingerprint_sink import (
    fingerprint_append_sink,
    read_fingerprint,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"


def test_streamed_partials_merge_to_batch_fingerprint(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    src = str(tmp_path / "src")
    orders.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")

    sdf = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(fingerprint_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # >1 partial must exist for the merge to be exercised.
    assert read_partials(spark, target).count() >= 2
    merged = read_fingerprint(spark, target).collect()[0]
    batch = table_fingerprint(spark, SF).collect()[0]
    assert (merged.n_rows, merged.fingerprint) == (
        batch.n_rows,
        batch.fingerprint,
    )


def test_absent_store_reads_as_empty_fingerprint(spark, tmp_path):
    merged = read_fingerprint(spark, str(tmp_path / "nowhere")).collect()[0]
    assert merged.n_rows == 0 and merged.fingerprint is None
