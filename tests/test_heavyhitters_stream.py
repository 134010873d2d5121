"""Streaming SpaceSaving maintenance: availableNow file stream over the
documents corpus, per-batch summary appends, merge-on-read bounds
asserted against exact counts (same contract as the batch tests in
tests/test_heavyhitters.py, now across micro-batch boundaries)."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.heavyhitters_sink import (
    heavyhitters_append_sink,
    merged_heavy_hitters,
    merged_summary,
    stream_guarantee,
)
from scala_data_pipeline_spark.streaming.partial_store import read_partials

SF = "/root/testdata/sf0.001"
M = 64


def test_streamed_summaries_keep_bounds(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("text")
    src = str(tmp_path / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    target = str(tmp_path / "partials")
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(heavyhitters_append_sink(target, M))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    # multiple batches actually ran (one per source file)
    n_batches = (
        read_partials(spark, target).select("batch_id").distinct().count()
    )
    assert n_batches >= 2, n_batches

    exact = {
        r.token: r["count"]
        for r in docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("token")
        )
        .groupBy("token")
        .count()
        .collect()
    }
    got = {
        r.token: (r.est, r.err)
        for r in merged_summary(spark, target).collect()
    }
    g = stream_guarantee(spark, target, M)
    # detection: everything above the derivable threshold is present
    for tok, true in exact.items():
        if true > g:
            assert tok in got, (tok, true, g)
    # merged est stays an overestimate bounded by the merged error
    for tok, (est, err) in got.items():
        assert est <= exact.get(tok, 0) + err, (tok, est, err)
    # top-k surface returns k rows ordered by est
    top = merged_heavy_hitters(spark, target, k=10).collect()
    assert len(top) == 10
    assert [r.est for r in top] == sorted(
        [r.est for r in top], reverse=True
    )
