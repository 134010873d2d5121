"""The ``users_items`` module (users_items/users_items.scala): build or
incrementally update the users×items matrix, output under a
max-date-derived path.

The reference stamps the dataset-wide max date via a single-partition
window (W1) — replaced by a scalar ``agg(max)`` (SURVEY.md §2.5 note:
the empty-partitionBy window serializes the dataset through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.matrix import merge_matrix, users_items_matrix


def max_date_str(events: DataFrame) -> str:
    """Driver-side scalar pull of the max event date (users_items.scala:
    48-53 does it with a window + distinct + collect; A8's idiomatic
    form is one agg)."""
    return events.agg(F.date_format(F.max("ts"), "yyyyMMdd")).first()[0]


def run(
    events: DataFrame,
    out_base: str,
    update: bool = False,
    prev_matrix: DataFrame | None = None,
    output_files: int = 8,
) -> str:
    """Build (or merge-update) and write the matrix; returns the output
    path ``{out_base}/{max_date}`` (users_items.scala:85-100). Output
    file count is a parameter — the reference's coalesce(1) is not a
    default we keep."""
    matrix = (
        merge_matrix(prev_matrix, events)
        if update and prev_matrix is not None
        else users_items_matrix(events)
    )
    path = f"{out_base}/{max_date_str(events)}"
    matrix.repartition(output_files).write.mode("overwrite").parquet(path)
    return path
