"""The ``filter`` module (filter/filter.scala): bounded read of an event
stream, JSON payload parse, split into view/buy, date-partitioned JSON
output (S10).

The reference reads Kafka batch (S6) — here the source is pluggable: any
DataFrame with the event schema works (the Kafka builder in
streaming/kafka.py produces one when the connector jar is present).

Scale notes: the output is partitioned by ``p_date`` so downstream
readers (users_items) prune partitions. The reference writes one job per
day-batch; file counts per partition follow the upstream parallelism —
no ``coalesce(1)`` (SURVEY.md §4.2: single-file outputs are catastrophic
at 100 TB; file count is the caller's knob via ``target_files``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """view/buy split with the p_date derivation (filter.scala:53-62).
    events.ts is already a timestamp here; the reference divides epoch-ms
    by 1000 first (covered by functions/timefn.epoch_ms_to_timestamp)."""
    with_date = events.withColumn(
        "p_date", F.regexp_replace(F.to_date("ts").cast("string"), "-", "")
    )
    views = with_date.filter(F.col("event_type") == "view")
    buys = with_date.filter(F.col("event_type") == "purchase")
    return views, buys


def write_partitioned_json(
    df: DataFrame, path: str, target_files: int | None = None
) -> None:
    """mode(overwrite).partitionBy(p_date).json(path) (filter.scala:59,64).
    ``target_files`` repartitions WITHIN partitions by the partition key
    so each p_date directory gets bounded file counts."""
    if target_files:
        df = df.repartition(target_files, "p_date")
    # sortWithinPartitions keeps the repartition's hash placement (a
    # global orderBy would replace it with a range shuffle and void the
    # target_files knob) while still writing time-ordered files.
    df.sortWithinPartitions("ts").write.mode("overwrite").partitionBy(
        "p_date"
    ).json(path)


def run(events: DataFrame, out_dir: str, target_files: int | None = None) -> None:
    views, buys = split_events(events)
    write_partitioned_json(views, f"{out_dir}/view", target_files)
    write_partitioned_json(buys, f"{out_dir}/buy", target_files)
