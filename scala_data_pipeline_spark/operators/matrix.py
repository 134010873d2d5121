"""Matrix operators: users×items count matrix + incremental merge and
the per-user feature matrix (SURVEY.md §2 A2/A4/A5/F18/F19, W1).

Reference parity:
- ``users_items_matrix`` rebuilds users_items/users_items.scala:31-82:
  project (uid, prefixed item key) from view/buy events, union, pivot to
  a wide 0/N count matrix. The reference discovers pivot values with an
  eager distinct job; we take explicit value lists (schema stability +
  no extra full scan at 100 TB).
- ``merge_matrix`` is the incremental mode (users_items.scala:56-96):
  un-pivot the previous matrix to long form, union the new long-form
  counts, re-pivot with SUM. Long form is the scalable merge
  representation — the wide matrix is a presentation format; merging in
  long form is a plain shuffle-on-(uid,item) aggregation that AQE can
  size, with no data-dependent schema step.
- ``user_time_matrix`` rebuilds features/features.scala:50-100: hour-of-
  day and weekday count pivots left-joined onto per-user work/evening
  fractions (J6 chain), with the packed feature vector (F18) emitted as
  an ``array<bigint>``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timefn import WEEKDAYS, in_hour_range, weekday_name
from .aggregates import pivot_counts

ITEM_IDS = tuple(str(i) for i in range(100))  # events props.k domain, all SFs


def event_items_long(events: DataFrame) -> DataFrame:
    """(user_id, item) rows from view/purchase events — the projection
    users_items.scala:31-45 does per source dir, union built in."""
    typed = events.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isin("view", "purchase")
    )
    prefix = F.when(F.col("event_type") == "view", "view_item").otherwise("buy_item")
    k = F.from_json("props", "k INT")["k"]
    return typed.select(
        "user_id", F.concat(prefix, k.cast("string")).alias("item")
    )


def item_values(item_ids: Sequence[str] = ITEM_IDS) -> list[str]:
    return [f"view_item{i}" for i in item_ids] + [f"buy_item{i}" for i in item_ids]


def users_items_matrix(events: DataFrame) -> DataFrame:
    return pivot_counts(
        event_items_long(events), key="user_id", pivot_col="item",
        values=item_values(),
    )


def unpivot_matrix(matrix: DataFrame) -> DataFrame:
    """Wide matrix → (user_id, item, cnt>0) long form (F19, native
    unpivot instead of generated stack SQL)."""
    value_cols = [c for c in matrix.columns if c != "user_id"]
    return (
        matrix.unpivot(
            ids=["user_id"], values=value_cols,
            variableColumnName="item", valueColumnName="cnt",
        )
        .filter(F.col("cnt") > 0)
    )


def merge_matrix(old_matrix: DataFrame, new_events: DataFrame) -> DataFrame:
    """Incremental users×items update: old matrix ∪ new events, merged in
    long form, re-pivoted (users_items.scala:56-96 semantics)."""
    old_long = unpivot_matrix(old_matrix)
    new_long = event_items_long(new_events).withColumn("cnt", F.lit(1).cast("long"))
    merged = old_long.unionByName(new_long)
    return pivot_counts(
        merged, key="user_id", pivot_col="item", values=item_values(),
        agg_col="cnt",
    )


def user_time_matrix(events: DataFrame) -> DataFrame:
    """Per-user time-features: visits, work/evening fractions, hour and
    weekday count pivots, packed hour vector (features.scala:50-100)."""
    visits = events.filter(F.col("user_id").isNotNull())
    fractions = (
        visits.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("visits"),
            F.count(F.when(in_hour_range(F.col("ts"), 9, 18), 1)).alias("work_cnt"),
            F.count(F.when(in_hour_range(F.col("ts"), 18, 24), 1)).alias("evening_cnt"),
        )
        .select(
            "user_id",
            "visits",
            (F.col("work_cnt") / F.col("visits")).alias("web_fraction_work_hours"),
            (F.col("evening_cnt") / F.col("visits")).alias(
                "web_fraction_evening_hours"
            ),
        )
    )
    hours = [str(h) for h in range(24)]
    hour_pivot = pivot_counts(
        visits.withColumn("hr", F.hour("ts").cast("string")),
        key="user_id", pivot_col="hr", values=hours, prefix="web_hour_",
    )
    day_pivot = pivot_counts(
        visits.withColumn("wd", weekday_name(F.col("ts"))),
        key="user_id", pivot_col="wd", values=list(WEEKDAYS), prefix="web_day_",
    )
    # J6 chain: left joins on uid; same-key joins reuse one shuffle
    # partitioning on user_id.
    wide = fractions.join(hour_pivot, on="user_id", how="left").join(
        day_pivot, on="user_id", how="left"
    ).na.fill(0)
    # F18: pack the 24 hour counts into one array<bigint> feature vector.
    return wide.withColumn(
        "hour_vector", F.array(*[F.col(f"web_hour_{h}") for h in hours])
    )
