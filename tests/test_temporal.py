"""Temporal operators: as-of join edge cases, approx-count error bound."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scala_data_pipeline_spark.operators.temporal import asof_join
from scala_data_pipeline_spark.sources import load_table


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_edges(spark):
    """Exact-tie timestamps match (>= semantics); keys with no prior
    right row get null; later right rows never leak backward."""
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c"), (3, _ts(30), "d")],
        "k INT, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(15), 150.0), (2, _ts(6), 60.0)],
        "k INT, rts TIMESTAMP, v DOUBLE",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"]
    )
    # output keeps the caller's timestamp name (round-13 review fix)
    assert "ts" in out.columns and "_left_ts" not in out.columns
    got = {(r["k"], r["tag"]): r["v"] for r in out.collect()}
    assert got[(1, "a")] == 100.0  # exact tie included
    assert got[(1, "b")] == 150.0  # latest at-or-before
    assert got[(2, "c")] is None  # right row is later → no leak backward
    assert got[(3, "d")] is None  # key absent on right


def test_asof_join_preserves_null_from_latest_right_row(spark):
    """When the most recent matching right row carries a NULL value, the
    join must return that NULL — not fall back to an older non-null row
    (DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame(
        [(1, _ts(20), "x")], "k INT, ts TIMESTAMP, tag STRING"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(15), None)],
        "k INT, rts TIMESTAMP, v DOUBLE",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"]
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["v"] is None


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """HLL estimate within the configured rsd (2%, allow 4 sigma) of the
    exact distinct count per group."""
    events = load_table(spark, sf_dir, "events")
    joined = (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.08 * r["exact"]), r


def test_events_ts_is_session_tz_timestamp(spark, sf_dir):
    """Testdata-drift lock (round-4 postmortem): the driver has shipped
    events.ts as TIMESTAMP(NANOS) and as naive timestamp[us] in
    different generations. Whatever the physical shape, load_table must
    yield session-TZ TimestampType - TIMESTAMP_NTZ would break every
    withWatermark path (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and
    bigint casts - and ts predicates must still push into the scan."""
    from pyspark.sql.types import TimestampType

    from scala_data_pipeline_spark.plans import explain_str
    from scala_data_pipeline_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, TimestampType)
    plan = explain_str(events.filter("ts > timestamp'2020-01-01'"))
    assert "PushedFilters" in plan and "GreaterThan(ts" in plan
