"""Kill-and-resume soak across the round-13 streaming hardening
(verdict item 8): the partial-store write path (hidden-tmp + rename
install, per-batch-id overwrite — 18802ff) and the Python DataSource's
maxRowsPerTrigger admission control (0b9963f + this round's
checkpoint-restore high-water fix) must both survive a REAL engine
stop/restart mid-stream, not just a simulated foreachBatch replay.

Both tests stop the query while batches are still flowing, restart on
the same checkpoint, run to completion, and assert the final serving
read equals the batch twin exactly.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _wait_until(pred, timeout_s: float = 120.0, poll_s: float = 0.3):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(poll_s)
    return False


def test_rollup_store_survives_midstream_kill_and_resume(spark, tmp_path):
    """Windowed rollup through the partial store: stop the stream after
    SOME batch subdirs exist (mid-stream — possibly between a parquet
    install and its checkpoint commit, the at-least-once replay window),
    resume on the same checkpoint, drain, and assert the merged store
    equals the batch rollup over the full history — nothing lost,
    nothing double-counted."""
    from scala_data_pipeline_spark.operators.rollup import hourly_rollup
    from scala_data_pipeline_spark.streaming.partial_store import (
        read_partials,
    )
    from scala_data_pipeline_spark.streaming.rollup_sink import (
        merged_hourly,
        rollup_append_sink,
    )

    events = load_table(spark, SF, "events")
    src = str(tmp_path / "src")
    events.repartition(8).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(rollup_append_sink(target))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    import glob

    q = start()
    # Kill once at least 2 batch subdirs are installed but (usually)
    # before all 8 — a genuinely mid-stream stop.
    assert _wait_until(
        lambda: len(glob.glob(f"{target}/batch-*")) >= 2
    ), "stream never installed two batches"
    q.stop()
    q.awaitTermination(timeout=60)
    n_before = len(glob.glob(f"{target}/batch-*"))

    q2 = start()  # resume from the checkpoint, drain the rest
    q2.awaitTermination(timeout=180)
    assert not q2.isActive
    n_after = len(glob.glob(f"{target}/batch-*"))
    assert n_after >= n_before  # resumed, never rolled the store back
    # no orphaned hidden-tmp install dirs after a clean drain
    assert glob.glob(f"{target}/.batch-*.tmp") == []

    merged = {
        r.bucket_hour: (r.revenue_partial, r.n_events, r.n_purchases)
        for r in merged_hourly(spark, target).collect()
    }
    batch = {
        r.bucket_hour: (r.revenue_partial, r.n_events, r.n_purchases)
        for r in hourly_rollup(events).collect()
    }
    assert merged == batch
    # fragments from BOTH runs are present (the merge is exercised)
    assert read_partials(spark, target).count() > len(batch)


def test_rate_limited_pydatasource_resumes_from_checkpoint(spark, tmp_path):
    """synthetic_events with maxRowsPerTrigger: stop mid-stream, then
    restart on the same checkpoint and drain. The restarted reader is a
    FRESH instance (in-memory admission state lost) whose first
    latestOffset runs before any commit() — the exact restore path the
    high-water fix covers. Output must be the complete 0..N-1 id range
    exactly once: a lost offset would duplicate, a regressed one would
    stall in empty sentinel batches."""
    from scala_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    total = 5000
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("synthetic_events")
            .option("totalRows", str(total))
            .option("rowsPerBatch", "250")
            .option("maxRowsPerTrigger", "500")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    def rows_out() -> int:
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    q = start()
    assert _wait_until(lambda: 0 < rows_out() < total), (
        "stream finished before it could be killed mid-flight "
        f"(rows={rows_out()}) — lower maxRowsPerTrigger"
    )
    q.stop()
    q.awaitTermination(timeout=60)
    assert 0 < rows_out() < total  # genuinely mid-stream

    q2 = start()
    assert _wait_until(lambda: rows_out() >= total, timeout_s=180), (
        f"restarted stream stalled at {rows_out()}/{total} rows — "
        "offset regression after restore?"
    )
    q2.stop()
    q2.awaitTermination(timeout=60)

    got = spark.read.parquet(out)
    agg = got.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).first()
    assert (agg["n"], agg["d"], agg["lo"], agg["hi"]) == (
        total,
        total,
        0,
        total - 1,
    )
