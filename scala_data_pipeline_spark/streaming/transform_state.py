"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``
(the successor to ``applyInPandasWithState`` — typed, composable state
primitives instead of one opaque tuple; see streaming/stateful.py for
the older form the reference era maps to, SURVEY.md T7).

``user_profile_stream`` keeps a per-user profile across micro-batches
using all three state primitives:

- **ValueState** ``totals`` — (n_events, revenue) running counters;
- **MapState** ``type_counts`` — per-event-type counts (distinct-type
  cardinality emitted per batch);
- **ListState** ``recent`` — a capped list of the most recent purchase
  values (emitted as an average).

Environment note: the transformWithState Python protocol needs
``google.protobuf`` (the state server speaks protobuf to the worker),
which is not installed in this container — the e2e test skips with a
documented probe and the processor logic is unit-tested against fake
state primitives instead (tests/test_transform_state.py). The
``applyInPandasWithState`` twin in streaming/stateful.py runs e2e.

Scale notes: transformWithState requires the RocksDB state store
provider, which is exactly the 100 TB-keyspace configuration — state
lives off-heap per shuffle partition and is snapshotted to the
checkpoint. Keys shuffle once (hash on user_id); each micro-batch
touches only the keys it contains, so steady-state cost is O(batch),
not O(keyspace). TTL knobs on each state primitive bound unbounded
keyspaces (drop-off users expire instead of accumulating forever).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

RECENT_CAP = 5

OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_types long, revenue double, "
    "avg_recent_purchase double"
)


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile over an events stream."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n_events long, revenue double"
        )
        self._type_counts = handle.getMapState(
            "type_counts", "event_type string", "n long"
        )
        self._recent = handle.getListState("recent", "value double")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n_events, revenue = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n_events += len(pdf)
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._type_counts.getValue((etype,))[0]
                    if self._type_counts.containsKey((etype,))
                    else 0
                )
                self._type_counts.updateValue((etype,), (prev + int(cnt),))
            buys = pdf[pdf["event_type"] == "purchase"]
            revenue += float(buys["value"].sum())
            for v in buys["value"]:
                self._recent.appendValue((float(v),))
        # Unrounded running sum in state; round only in the output row
        # (same round-13 fix as stateful.py — per-batch rounding
        # accumulates error across micro-batches).
        self._totals.update((n_events, revenue))
        # keep only the newest RECENT_CAP purchase values
        recent = [r[0] for r in self._recent.get()][-RECENT_CAP:]
        self._recent.put([(v,) for v in recent])
        n_types = sum(1 for _ in self._type_counts.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_types": [n_types],
                "revenue": [round(revenue, 2)],
                "avg_recent_purchase": [
                    round(sum(recent) / len(recent), 6) if recent else None
                ],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events stream → one updated profile row per user per micro-batch."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
