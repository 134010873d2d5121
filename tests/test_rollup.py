"""Multi-granularity rollup: merging hourly partials must equal a
direct daily aggregation (operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.operators.rollup import (
    daily_from_hourly,
    hourly_rollup,
)
from scala_data_pipeline_spark.sources import load_table


def test_rollup_matches_direct_daily(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    via_hourly = daily_from_hourly(hourly_rollup(events))
    purchase_value = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(F.lit(0.0))
    direct = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket_day")
    ).agg(
        F.sum(purchase_value.cast("decimal(18,2)")).cast("double").alias("revenue"),
        F.count("*").cast("long").alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1)))
        .cast("long")
        .alias("n_purchases"),
    )
    merged = {r.bucket_day: r for r in via_hourly.collect()}
    base = {r.bucket_day: r for r in direct.collect()}
    assert set(merged) == set(base)
    for day, row in base.items():
        got = merged[day]
        # Decimal partial merge is exact — equality, not approx.
        assert got.revenue == row.revenue
        assert got.n_events == row.n_events
        assert got.n_purchases == row.n_purchases
        assert 1 <= got.n_active_hours <= 24


def test_hourly_rollup_partials_are_decimal(spark, sf_dir):
    hourly = hourly_rollup(load_table(spark, sf_dir, "events"))
    field = dict(hourly.dtypes)["revenue_partial"]
    assert field.startswith("decimal"), field


def test_streaming_rollup_maintenance(spark, sf_dir, tmp_path):
    """foreachBatch-appended hourly partials merge to the exact batch
    rollup (streaming/rollup_sink.py)."""
    from scala_data_pipeline_spark.operators.rollup import daily_rollup
    from scala_data_pipeline_spark.streaming.rollup_sink import (
        read_daily_rollup,
        rollup_append_sink,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "stream_src")
    events.repartition(4).write.mode("overwrite").parquet(src)
    target = str(tmp_path / "partials")
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sdf.writeStream.foreachBatch(rollup_append_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    got = {r.bucket_day: r for r in read_daily_rollup(spark, target).collect()}
    want = {r.bucket_day: r for r in daily_rollup(events).collect()}
    assert set(got) == set(want)
    for day, w in want.items():
        g = got[day]
        assert (g.revenue, g.n_events, g.n_purchases, g.n_active_hours) == (
            w.revenue, w.n_events, w.n_purchases, w.n_active_hours
        )
    # The sketch column rolls up through the same partial store: daily
    # distinct-user estimates match exact distincts in the sparse
    # regime (test SF cardinalities are far below the dense switch).
    exact_users = {
        r.d: r.x
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count_distinct("user_id").alias("x")).collect()
    }
    for day, g in got.items():
        assert g.n_distinct_users_est == exact_users[day]


def test_hll_sketch_rollup_accuracy(spark, sf_dir):
    """Merged hourly HLL sketches vs exact daily distincts: exact in
    the sparse regime (test SF), <2% relative error at bench scale."""
    from scala_data_pipeline_spark.operators.rollup import (
        daily_distinct_users,
        hourly_user_sketches,
    )

    events = load_table(spark, sf_dir, "events")
    est = {
        r.bucket_day: r.n_distinct_users_est
        for r in daily_distinct_users(hourly_user_sketches(events)).collect()
    }
    exact = {
        r.d: r.x
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("d")
        ).agg(F.count_distinct("user_id").alias("x")).collect()
    }
    assert set(est) == set(exact)
    for day, x in exact.items():
        if x <= 512:
            assert est[day] == x, (day, est[day], x)
        else:
            assert abs(est[day] - x) / x < 0.02


def test_rollup_job_backfill_plus_stream_unified(spark, sf_dir, tmp_path):
    """jobs/rollup_job.py e2e: batch backfill of half the data + stream
    maintenance of the other half land in ONE store whose daily read
    equals the all-batch rollup exactly."""
    from scala_data_pipeline_spark.jobs import rollup_job
    from scala_data_pipeline_spark.operators.rollup import daily_rollup

    events = load_table(spark, sf_dir, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    target = str(tmp_path / "store")

    rollup_job.run_batch(spark, first, target)

    src = str(tmp_path / "stream_src")
    second.repartition(3).write.mode("overwrite").parquet(src)
    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = rollup_job.run_stream(
        spark, sdf, target, str(tmp_path / "ckpt")
    )
    q.awaitTermination(timeout=120)
    assert not q.isActive

    got = {
        r.bucket_day: r for r in rollup_job.read_daily(spark, target).collect()
    }
    want = {r.bucket_day: r for r in daily_rollup(events).collect()}
    assert set(got) == set(want)
    for day, w in want.items():
        g = got[day]
        assert (g.revenue, g.n_events, g.n_purchases) == (
            w.revenue, w.n_events, w.n_purchases
        )


def test_rollup_job_distinct_backfills_coexist(spark, sf_dir, tmp_path):
    """Two incremental backfills of DIFFERENT event slices under
    different backfill ids must both survive in the store (advisor
    round-11: a single fixed subdir silently discarded the first),
    while re-running the SAME id stays idempotent."""
    import pytest

    from scala_data_pipeline_spark.jobs import rollup_job
    from scala_data_pipeline_spark.operators.rollup import daily_rollup

    events = load_table(spark, sf_dir, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    target = str(tmp_path / "store")

    rollup_job.run_batch(spark, first, target, backfill_id="slice-even")
    rollup_job.run_batch(spark, second, target, backfill_id="slice-odd")
    # Re-run of an id overwrites itself — no double counting.
    rollup_job.run_batch(spark, second, target, backfill_id="slice-odd")

    got = {
        r.bucket_day: r for r in rollup_job.read_daily(spark, target).collect()
    }
    want = {r.bucket_day: r for r in daily_rollup(events).collect()}
    assert set(got) == set(want)
    for day, w in want.items():
        g = got[day]
        assert (g.revenue, g.n_events, g.n_purchases) == (
            w.revenue, w.n_events, w.n_purchases
        )

    with pytest.raises(ValueError):
        rollup_job.run_batch(spark, first, target, backfill_id="a/b")


def test_mau_sliding_hll_exact_in_sparse_regime(spark, sf_dir):
    """28-day sliding HLL MAU == exact sliding distinct at test-SF
    cardinalities (sketch is exact in the sparse regime), checked
    against a band-join exact twin."""
    from scala_data_pipeline_spark.queries.streaming_batch import mau_28d_hll

    got = {r.day: r.mau_28d for r in mau_28d_hll(spark, sf_dir).collect()}
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    day = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
    pairs = events.select(day.alias("d"), "user_id").distinct()
    days = pairs.select(F.col("d").alias("day")).distinct()
    exact = {
        r.day: r.x
        for r in days.join(
            pairs,
            (pairs.d <= days.day) & (pairs.d >= days.day - 27),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("x"))
        .collect()
    }
    assert got == exact
