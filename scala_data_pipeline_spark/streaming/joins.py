"""Stream-stream joins (beyond the reference's inventory — SURVEY.md
§2.9 has no stream joins; an engine claiming Spark's streaming surface
needs them).

A watermarked stream-stream inner join buffers both sides in the state
store and can only evict once (a) both sides carry a watermark and
(b) the join condition bounds how far apart matching events can be in
event time — hence the mandatory time-band predicate here. Without the
band, state grows forever; with it, state per key is bounded by
(watermark + band) of events. RocksDB holds the buffers at scale.

Semantically the streaming join converges to the identical batch join —
which is how the test value-checks it (unified-model twin, same pattern
as streaming/windowed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` restricted to ``right_ts`` within
    ``[left_ts - band, left_ts]`` (e.g. "a purchase joins the same
    user's views from the preceding hour").

    Works unchanged on batch frames (watermark=None) and on streams
    (pass ``watermark``; it is applied to BOTH sides, and the band makes
    the state evictable). Column names must already be disjoint apart
    from ``key``.

    ``how="left_outer"`` adds the unmatched left rows: on a stream the
    NULL-padded row for a left event is emitted only once the watermark
    passes its join band (before that a match could still arrive) — so
    tail rows whose band the final watermark never crosses stay
    unemitted, the documented stream-outer-join semantics.
    """
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {band}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return left.join(right, on=cond, how=how).drop(right[key])
