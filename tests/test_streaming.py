"""True Structured-Streaming checks (SURVEY.md §2.9 T1-T9) via a
file-source micro-batch pipeline — no Kafka broker needed; the Kafka
builders share the same downstream plan (parse → window agg → sink)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.streaming.kafka import offsets_json, parse_kafka_json
from scala_data_pipeline_spark.streaming.windowed import revenue_window_agg


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Events split into 4 parquet files — each becomes one micro-batch."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(
        path
    )
    return path


def _run_stream(spark, src_dir, schema, transform, mode: str, name: str):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force incremental micro-batches
        .parquet(src_dir)
    )
    query = (
        transform(sdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout=120)
    assert not query.isActive
    return spark.sql(f"SELECT * FROM {name}")


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_windowed_agg_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """T1+T2: watermark-less 60-min tumbling agg over micro-batches ends
    at the same state as the batch run (complete mode exposes it)."""
    batch_events = load_table(spark, sf_dir, "events")
    want = _sorted_pdf(revenue_window_agg(batch_events, "60 minutes"))
    got_df = _run_stream(
        spark,
        events_stream_dir,
        batch_events.schema,
        lambda sdf: revenue_window_agg(sdf, "60 minutes"),
        mode="complete",
        name="win_complete",
    )
    got = _sorted_pdf(got_df)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9)


def test_windowed_agg_update_mode_emits(spark, sf_dir, events_stream_dir):
    """T3: update mode re-emits changed windows per micro-batch — total
    emitted rows ≥ distinct windows, final values match batch."""
    batch_events = load_table(spark, sf_dir, "events")
    got_df = _run_stream(
        spark,
        events_stream_dir,
        batch_events.schema,
        lambda sdf: revenue_window_agg(sdf, "60 minutes"),
        mode="update",
        name="win_update",
    )
    emitted = got_df.count()
    n_windows = revenue_window_agg(batch_events, "60 minutes").count()
    assert emitted >= n_windows


def test_stateful_collect_list_stream(spark, sf_dir, events_stream_dir):
    """T7: streaming groupBy(uid).agg(collect_list) — unbounded keyed
    state; end state matches batch collect_list sizes."""
    batch_events = load_table(spark, sf_dir, "events")

    def collect_types(df):
        return (
            df.filter(F.col("user_id").isNotNull())
            .groupBy("user_id")
            .agg(F.size(F.collect_list("event_type")).alias("n"))
        )

    got = _sorted_pdf(
        _run_stream(
            spark,
            events_stream_dir,
            batch_events.schema,
            collect_types,
            mode="complete",
            name="collect_state",
        )
    )
    want = _sorted_pdf(collect_types(batch_events))
    pd.testing.assert_frame_equal(got, want)


@pytest.fixture(scope="module")
def ordered_events_dir(spark, sf_dir, tmp_path_factory):
    """Events written as weekly files in event-time order (distinct
    mtimes → the file source processes them in order), so watermark-based
    append-mode tests see no artificial late data."""
    import time

    batch_events = load_table(spark, sf_dir, "events")
    path = str(tmp_path_factory.mktemp("events_ordered"))
    for week in range(5):
        lo, hi = 1 + 7 * week, 1 + 7 * (week + 1)
        chunk = batch_events.filter(
            (F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") < hi)
        )
        chunk.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
    return path


def test_watermarked_append_mode(spark, sf_dir, ordered_events_dir):
    """The idiomatic escape hatch (SURVEY.md T2 note): with a watermark,
    append mode emits only finalized windows. Files must arrive in event-
    time order — out-of-order arrival would advance the watermark past
    windows whose data is still in later files (late-data drop, which
    test_windowed_agg_stream_equals_batch's watermark-less run tolerates
    by design)."""
    batch_events = load_table(spark, sf_dir, "events")
    path = ordered_events_dir
    got_df = _run_stream(
        spark,
        path,
        batch_events.schema,
        lambda sdf: revenue_window_agg(sdf, "60 minutes", watermark="2 hours"),
        mode="append",
        name="win_append",
    )
    got = got_df.toPandas().set_index("window_start")
    want = (
        revenue_window_agg(batch_events, "60 minutes")
        .toPandas()
        .set_index("window_start")
    )
    assert len(got) <= len(want)
    for ws, row in got.iterrows():
        assert row["visitors"] == want.loc[ws, "visitors"]
        assert row["revenue"] == pytest.approx(want.loc[ws, "revenue"])


def test_kafka_builder_plumbing(spark):
    """S6/S12 option construction (no broker in the container): offsets
    JSON shape and the value→json→struct parse chain on a static frame."""
    assert offsets_json("t", {0: 5, 1: 7}) == '{"t": {"0": 5, "1": 7}}'
    raw = spark.createDataFrame(
        [(bytearray(b'{"event_type": "buy", "item_price": 3}'),)], ["value"]
    )
    parsed = parse_kafka_json(raw, "event_type STRING, item_price INT")
    row = parsed.collect()[0]
    assert row.event_type == "buy" and row.item_price == 3


def test_streaming_session_windows(spark, sf_dir, ordered_events_dir):
    """Streaming twin of the session_windows batch query (SURVEY.md
    §2.9 extension): watermarked session_window agg in append mode —
    sessions finalize when the watermark passes their close, and every
    finalized session matches the batch gaps-and-islands result
    exactly."""
    from scala_data_pipeline_spark.operators.temporal import session_agg

    batch_events = load_table(spark, sf_dir, "events")

    def sessions(df, watermark=None):
        return session_agg(
            df.filter(F.col("user_id").isNotNull()),
            key="user_id",
            ts_col="ts",
            gap="30 minutes",
            aggs=[F.count(F.lit(1)).alias("n_events")],
            watermark=watermark,
        )

    got_df = _run_stream(
        spark,
        ordered_events_dir,
        batch_events.schema,
        lambda sdf: sessions(sdf, watermark="2 hours"),
        mode="append",
        name="session_append",
    )
    got = got_df.toPandas().set_index(["user_id", "session_start"])
    want = sessions(batch_events).toPandas().set_index(
        ["user_id", "session_start"]
    )
    # every finalized session agrees with batch; only the stream tail
    # (sessions not yet closed by the watermark) may be missing
    assert 0 < len(got) <= len(want)
    for idx, row in got.iterrows():
        assert row["n_events"] == want.loc[idx, "n_events"]
        assert row["session_end"] == want.loc[idx, "session_end"]


def test_stream_stream_interval_join(spark, sf_dir, ordered_events_dir):
    """Watermarked stream-stream inner join (absent from the reference):
    purchases joined to the same user's views in the preceding hour.
    The streaming result must be a subset of the batch twin (watermark
    eviction may drop tail matches) with identical values where emitted,
    and must be non-trivially populated."""
    from scala_data_pipeline_spark.streaming.joins import interval_join

    batch_events = load_table(spark, sf_dir, "events")

    def split(df):
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("buy_ts"), F.col("value").alias("buy_value")
        )
        views = df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user_id"), F.col("ts").alias("view_ts")
        )
        return buys, views

    def joined(df, watermark=None):
        buys, views = split(df)
        return interval_join(
            buys.withColumnRenamed("user_id", "u"),
            views.withColumnRenamed("v_user_id", "u"),
            key="u",
            left_ts="buy_ts",
            right_ts="view_ts",
            band="1 HOUR",
            watermark=watermark,
        )

    sdf = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    query = (
        joined(sdf, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout=120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM ss_join").collect()}
    want = {tuple(r) for r in joined(batch_events).collect()}
    assert len(got) > 0
    assert got <= want
    # ordered arrival + generous watermark: the stream should see nearly
    # everything the batch join produces
    assert len(got) >= 0.9 * len(want)


def test_streaming_dedup_with_watermark(spark, sf_dir, events_stream_dir):
    """Streaming dropDuplicates with watermark (absent from the
    reference — SURVEY.md §2.9 note): exactly-once per event_id within
    the watermark horizon, state bounded."""
    batch_events = load_table(spark, sf_dir, "events")

    def dedup(sdf):
        return (
            sdf.withWatermark("ts", "2 hours")
            .dropDuplicates(["event_id"])
            .select("event_id")
        )

    got_df = _run_stream(
        spark,
        events_stream_dir,
        batch_events.schema,
        dedup,
        mode="append",
        name="dedup_stream",
    )
    got = got_df.count()
    want = batch_events.select("event_id").distinct().count()
    # out-of-order arrival can drop late duplicates' FIRST sighting too,
    # but every surviving id is unique and no id is emitted twice
    assert got_df.groupBy("event_id").count().filter("count > 1").count() == 0
    assert got <= want


def test_streaming_drop_duplicates_within_watermark(
    spark, sf_dir, ordered_events_dir
):
    """dropDuplicatesWithinWatermark (Spark 3.5+): unlike plain
    dropDuplicates — which keys state forever within the job — this
    dedups only occurrences whose event times land within the watermark
    delay of each other, and may legitimately re-emit a key later.
    Ordered arrival (the append-mode fixture) matters: under
    out-of-order input the operator DROPS late events outright (first
    sightings included), which the unordered twin of this test
    confirmed. Contract checked here: with in-order arrival and unique
    fixture ids, every id is emitted exactly once."""
    batch_events = load_table(spark, sf_dir, "events")

    def dedup(sdf):
        return (
            sdf.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )

    got_df = _run_stream(
        spark,
        ordered_events_dir,
        batch_events.schema,
        dedup,
        mode="append",
        name="dedup_within_wm_stream",
    )
    arrived = {
        r.event_id
        for r in batch_events.select("event_id").distinct().collect()
    }
    emitted = got_df.groupBy("event_id").count().collect()
    assert {r.event_id for r in emitted} == arrived  # none vanish
    # fixture event_ids are unique, so nothing may be emitted twice
    assert all(r["count"] == 1 for r in emitted)


def test_rate_source_windowed_agg(spark, tmp_path):
    """Built-in rate source (timestamp, value) — the jar-free streaming
    source for load/throughput tests; drives the same windowed-agg
    operator the file/Kafka paths use."""
    from scala_data_pipeline_spark.streaming.windowed import revenue_window_agg

    sdf = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .selectExpr(
            "timestamp AS ts",
            "value AS user_id",
            "'purchase' AS event_type",
            "CAST(value % 10 AS DOUBLE) AS value",
        )
    )
    q = (
        revenue_window_agg(sdf, "10 seconds")
        .writeStream.format("memory")
        .queryName("rate_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "rate_ckpt"))
        .start()
    )
    try:
        # wait until at least one batch with data lands
        import time

        for _ in range(60):
            if spark.sql("SELECT count(*) c FROM rate_win").first()["c"] > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM rate_win").collect()
    assert rows, "rate source produced no windows"


def test_streaming_dedup_within_watermark(spark, sf_dir, events_stream_dir):
    """dropDuplicatesWithinWatermark: unlike dropDuplicates, duplicates
    with DIFFERENT event times still dedup as long as they arrive within
    the watermark delay — the right tool when producers re-stamp
    retries. Same bounded-state guarantee."""
    batch_events = load_table(spark, sf_dir, "events")

    def dedup(sdf):
        return (
            sdf.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )

    got_df = _run_stream(
        spark,
        events_stream_dir,
        batch_events.schema,
        dedup,
        mode="append",
        name="dedup_within_stream",
    )
    assert got_df.groupBy("event_id").count().filter("count > 1").count() == 0
    assert 0 < got_df.count() <= batch_events.select("event_id").distinct().count()


def test_streaming_chunk_pipeline(spark, sf_dir, tmp_path):
    """The chunking operator runs UNCHANGED on a stream (pure per-row
    transform): documents stream in, token-window chunks append out —
    the streaming ingest half of the training-data export flow."""
    from scala_data_pipeline_spark.ext.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "chunks_out")
    q = (
        chunk_documents(sdf)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = spark.read.parquet(out)
    assert got.count() == chunk_documents(docs).count()


def test_checkpoint_restart_no_reprocessing(spark, sf_dir, tmp_path):
    """Kill-and-resume durability: a restarted query continues from the
    checkpoint — rows ingested before the stop are not re-emitted, rows
    added while down are picked up."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = events.limit(2000)
    first.repartition(2).write.mode("overwrite").parquet(src)

    def start():
        return (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select("event_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination(timeout=120)
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()
    # new files land while the query is DOWN
    second = events.subtract(first)
    second.repartition(2).write.mode("append").parquet(src)
    q2 = start()
    q2.awaitTermination(timeout=120)
    got = spark.read.parquet(out)
    # resumed run appended exactly the new rows — nothing reprocessed
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stream_static_antijoin_dedup(spark, sf_dir, tmp_path):
    """Stream-static LEFT ANTI join: arriving documents are deduped
    against a STATIC digest index (the streaming half of incremental
    dedup — ext.dedup.lsh_incremental_pairs is the batch half). The
    static side is a plain DataFrame re-read per micro-batch; no state
    store involved. Result must equal the batch anti-join exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    index = (
        docs.filter(~F.col("source").isin("src18", "src19"))
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def fresh_only(stream_df):
        return stream_df.withColumn("digest", F.md5("text")).join(
            index, on="digest", how="left_anti"
        ).select("doc_id")

    got_df = _run_stream(
        spark, src, docs.schema, fresh_only, mode="append",
        name="ss_anti_dedup",
    )
    want = (
        docs.withColumn("digest", F.md5("text"))
        .join(index, on="digest", how="left_anti")
        .select("doc_id")
    )
    assert {r["doc_id"] for r in got_df.collect()} == {
        r["doc_id"] for r in want.collect()
    }
    assert got_df.count() == want.count()


def test_incremental_transitions_match_batch(spark, sf_dir):
    """Folding event-time-ordered micro-batches through the carried-
    state update yields EXACTLY the batch transition matrix: every
    cross-batch edge is completed by the later batch via the state row,
    and no edge is counted twice."""
    from scala_data_pipeline_spark.queries.stats import event_transitions
    from scala_data_pipeline_spark.sources import load_table
    from scala_data_pipeline_spark.streaming.transitions import (
        merge_deltas,
        transitions_batch_update,
    )

    events = load_table(spark, sf_dir, "events")
    # Event-time split at global ts terciles: all equal-ts rows land in
    # the same batch, so per-user (ts, event_id) order is preserved.
    sec = F.unix_timestamp("ts")
    t1, t2 = events.select(sec.alias("s")).approxQuantile(
        "s", [1 / 3, 2 / 3], 0.0
    )
    batches = [
        events.filter(sec < t1),
        events.filter((sec >= t1) & (sec < t2)),
        events.filter(sec >= t2),
    ]
    state = None
    deltas = []
    for b in batches:
        delta, state = transitions_batch_update(b, state)
        # Materialize: state feeds the next update (same role as a
        # state-store checkpoint between micro-batches).
        state = state.localCheckpoint(eager=True)
        deltas.append(delta.localCheckpoint(eager=True))
    got = {
        (r["cur_type"], r["next_type"]): r["n_transitions"]
        for r in merge_deltas(deltas).collect()
    }
    want = {
        (r["cur_type"], r["next_type"]): r["n_transitions"]
        for r in event_transitions(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_stream_left_outer_join(spark, sf_dir, ordered_events_dir):
    """Watermarked stream-stream LEFT OUTER join: purchases with no
    view in the preceding hour emit NULL-padded once the watermark
    passes their band. Emitted nulls must be exactly batch-unmatched
    purchases; matched rows must agree with the inner join."""
    from scala_data_pipeline_spark.streaming.joins import interval_join

    batch_events = load_table(spark, sf_dir, "events")

    def joined(df, watermark=None, how="inner"):
        buys = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("u"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )
        views = df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("u"), F.col("ts").alias("view_ts")
        )
        return interval_join(
            buys,
            views,
            key="u",
            left_ts="buy_ts",
            right_ts="view_ts",
            band="1 HOUR",
            watermark=watermark,
            how=how,
        )

    sdf = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ordered_events_dir)
    )
    query = (
        joined(sdf, watermark="30 minutes", how="left_outer")
        .writeStream.format("memory")
        .queryName("ss_louter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout=120)
    got = spark.sql("SELECT * FROM ss_louter").collect()
    got_null = {
        (r.u, r.buy_ts) for r in got if r.view_ts is None
    }
    got_matched = {tuple(r) for r in got if r.view_ts is not None}

    batch_outer = joined(batch_events, how="left_outer").collect()
    batch_null = {
        (r.u, r.buy_ts) for r in batch_outer if r.view_ts is None
    }
    batch_matched = {
        tuple(r) for r in batch_outer if r.view_ts is not None
    }
    # every streamed NULL row is a genuinely unmatched purchase, and the
    # ordered arrival means most of them get their eviction-time emit
    assert got_null <= batch_null
    assert len(got_null) >= 0.5 * len(batch_null) > 0
    # matched rows agree with batch semantics
    assert got_matched <= batch_matched
    assert len(got_matched) > 0
