"""Time / date scalar functions (SURVEY.md §2.8 F8-F13).

Reference parity: epoch-ms → seconds → timestamp conversions
(filter/filter.scala:53, features/features.scala:43), weekday-name and
hour-of-day derivations (features/features.scala:66-68 — Spark 2.4
pattern ``E`` becomes ``EEE`` on Spark 3+/4, SURVEY.md §7.5 risk 2),
``yyyyMMdd`` date round-trips (users_items/users_items.scala:28).
All functions assume the session timezone is pinned UTC (T10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WEEKDAYS = ("mon", "tue", "wed", "thu", "fri", "sat", "sun")
WORK_HOURS = (9, 18)  # [9, 18) — features/features.scala:73
EVENING_HOURS = (18, 24)  # [18, 24) — features/features.scala:74


def epoch_ms_to_timestamp(col: Column) -> Column:
    """Epoch milliseconds → TimestampType (filter/filter.scala:53 does
    ``timestamp/1000`` then casts; timestamp_millis is the exact form)."""
    return F.timestamp_millis(col.cast("long"))


def weekday_name(ts: Column) -> Column:
    """Lowercased 3-letter weekday ('mon'..'sun') — the reference's
    ``lower(from_unixtime(ts, "E"))`` (features/features.scala:66)."""
    return F.lower(F.date_format(ts, "EEE"))


def hour_of_day(ts: Column) -> Column:
    return F.hour(ts)


def in_hour_range(ts: Column, lo: int, hi: int) -> Column:
    h = hour_of_day(ts)
    return (h >= lo) & (h < hi)


def yyyymmdd(ts: Column) -> Column:
    return F.date_format(ts, "yyyyMMdd")
