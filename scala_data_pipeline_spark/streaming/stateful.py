"""Custom stateful streaming operators via ``applyInPandasWithState``
(the modern form of the reference era's flatMapGroupsWithState —
SURVEY.md T7 note).

``running_user_stats`` maintains per-user running counters across
micro-batches: total events, purchases, revenue — emitting the updated
row for each user seen in a batch. Unlike the plain streaming
``groupBy.agg`` (bounded to what Catalyst's agg state supports), this
pattern holds ARBITRARY Python state per key — the escape hatch for
operators Spark lacks natively.

Scale notes: state lives in the state store (per shuffle partition);
with ``spark.sql.streaming.stateStore.providerClass =
...RocksDBStateStoreProvider`` it spills to local RocksDB instead of
JVM heap — the 100 TB-keyspace configuration (tests exercise it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_purchases", LongType()),
        StructField("revenue", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_purchases", LongType()),
        StructField("revenue", DoubleType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_events, n_purchases, revenue = (
        state.get if state.exists else (0, 0, 0.0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        buys = pdf[pdf["event_type"] == "purchase"]
        n_purchases += len(buys)
        revenue += float(buys["value"].sum())
    # State keeps the UNROUNDED running sum; rounding happens only in
    # the emitted row. Rounding state each batch baked up to 0.005 of
    # error into the accumulator per micro-batch (sub-cent purchases
    # could never move it at all), diverging from the batch twin over
    # thousands of batches (round-13 review finding).
    state.update((n_events, n_purchases, revenue))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "n_purchases": [n_purchases],
            "revenue": [round(revenue, 2)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events (streaming or batch-tested via micro-batches) → per-user
    running counters, one updated row per user per micro-batch."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
