"""Tumbling-window aggregation (SURVEY.md §2.9 T1-T3).

Reference parity: agg/agg.scala:58-67 — 60-minute tumbling event-time
windows over a Kafka stream computing revenue / visitors / purchases /
AOV, emitted in ``update`` output mode with NO watermark (unbounded
state, T2).

The aggregation is defined once over a DataFrame and works unchanged on
a batch or a streaming input — that is the point of Structured
Streaming's unified model, and it is what lets the DuckDB oracle check
the streaming semantics via the batch twin.

Scale notes: watermark-less streaming aggregation keeps every window's
state forever — reproduced for parity, but ``watermark=`` is the knob
real deployments set (bounds state; RocksDB state store holds the rest:
``spark.sql.streaming.stateStore.providerClass`` →
RocksDBStateStoreProvider, config not code).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """groupBy(window(ts, duration)).agg(...) with optional watermark.

    Emits ``window_start`` / ``window_end`` flattened from the window
    struct (agg.scala:65-66 exposes them as unix seconds; we keep
    timestamps and let callers cast).
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    windowed = df.groupBy(F.window(F.col(ts_col), window_duration)).agg(*aggs)
    return windowed.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in windowed.columns if c != "window"],
    )


def revenue_window_agg(
    events: DataFrame,
    window_duration: str = "60 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """The agg-module aggregate (agg/agg.scala:58-64) on the events
    schema: revenue = sum of purchase values, visitors = rows with a
    uid, purchases = purchase count, aov = revenue / purchases."""
    out = windowed_agg(
        events,
        ts_col="ts",
        window_duration=window_duration,
        aggs=[
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                ),
                2,
            ).alias("revenue"),
            F.sum(
                F.when(F.col("user_id").isNotNull(), 1).otherwise(0)
            ).alias("visitors"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        ],
        watermark=watermark,
    )
    return out.withColumn(
        "aov",
        F.when(F.col("purchases") > 0, F.col("revenue") / F.col("purchases")),
    )
