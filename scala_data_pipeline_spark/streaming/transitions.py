"""Incremental maintenance of the Markov transition matrix
(queries/stats.py::event_transitions) — the carried-state pattern for
ORDER-DEPENDENT incremental views.

The continuous rollup (rollup_sink.py) maintains a commutative
aggregate: any batch's partial merges into the total in any order. The
transition matrix is different — a transition pairs each event with its
user's PREVIOUS event, so a micro-batch cannot be scored in isolation:
the first event a user shows in this batch pairs with the last event
they showed in any earlier batch. The standard fix is a tiny carried
state — one (last_ts, last_type) row per user — folded in ahead of each
batch:

    delta, new_state = transitions_batch_update(batch, state)

``delta`` is the batch's transition counts (exactly mergeable —
additive), ``new_state`` replaces the state store. Because event-time
ordered arrival preserves each user's sequence, the accumulated deltas
are IDENTICAL to the batch query over the full history — asserted
exactly in tests/test_streaming.py.

Scale shape: state is one row per user (orders of magnitude smaller
than events); each update is one window pass over |batch| + |active
users| rows and one aggregate. In Structured Streaming this state is
what ``applyInPandasWithState``/``transformWithState`` would hold
per-key; the explicit frame formulation here keeps the whole update
inside Catalyst (no Python state handles on the hot path) and doubles
as the deterministic batch-fold harness the oracle check needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transitions_batch_update(
    batch: DataFrame, state: DataFrame | None
) -> tuple[DataFrame, DataFrame]:
    """One incremental step.

    ``batch``: events (user_id, ts, event_type, event_id), event-time
    ordered arrival (all of a user's rows in this batch are later than
    any in previous batches). ``state``: (user_id, last_ts, last_type,
    last_event_id) or None for the first batch.

    Returns (delta_counts, new_state): delta_counts is
    (cur_type, next_type, n_transitions) for transitions COMPLETED by
    this batch; new_state carries each user's latest event forward.
    """
    ev = batch.filter(F.col("user_id").isNotNull()).select(
        "user_id", "ts", "event_type", "event_id", F.lit(True).alias("fresh")
    )
    if state is not None:
        prior = state.select(
            "user_id",
            F.col("last_ts").alias("ts"),
            F.col("last_type").alias("event_type"),
            F.col("last_event_id").alias("event_id"),
            F.lit(False).alias("fresh"),
        )
        ev = ev.unionByName(prior)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        "ts",
        "event_type",
        "event_id",
        "fresh",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("fresh").over(w).alias("next_fresh"),
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        ).alias("rev_rank"),
    )
    # A transition counts when its LATER endpoint arrived in this batch
    # (the earlier endpoint may be carried state) — each edge is counted
    # by exactly one batch, ever.
    delta = (
        stepped.filter(F.col("next_fresh"))
        .groupBy(
            F.col("event_type").alias("cur_type"),
            F.col("next_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    new_state = stepped.filter(F.col("rev_rank") == 1).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("event_id").alias("last_event_id"),
    )
    return delta, new_state


def merge_deltas(deltas: list[DataFrame]) -> DataFrame:
    """Additive merge of per-batch deltas (the exactly-mergeable half)."""
    out = deltas[0]
    for d in deltas[1:]:
        out = out.unionByName(d)
    return out.groupBy("cur_type", "next_type").agg(
        F.sum("n_transitions").cast("long").alias("n_transitions")
    )
