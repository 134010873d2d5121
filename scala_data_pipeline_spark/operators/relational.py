"""Relational core: CASE-bucketing, filters, joins (SURVEY.md §2.2-2.3).

Reference parity:
- ``bucket_column`` reproduces the 5-branch age-bucket CASE chain of
  data_mart/data_mart.scala:58-63 (P7) generically over numeric bounds.
- Join shapes J1-J8 (inner / left / multi-key full-outer) are expressed
  through plain ``DataFrame.join`` — Catalyst picks broadcast-hash for
  dimension-sized sides (we raise the broadcast threshold in session.py)
  and sort-merge for fact-fact joins. No hand-scheduled join strategy.

Scale notes: dimension joins (nation/region/part at any SF; top-k sets)
must broadcast — a shuffle of the 100 TB fact side against a 5-row
dimension would be absurd. We add an explicit ``F.broadcast`` hint where
the small side is known small by construction, so the plan survives even
with conservative thresholds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_column(
    col: Column, bounds: Sequence[float], labels: Sequence[str]
) -> Column:
    """CASE-WHEN chain bucketing ``col`` by ascending upper bounds.

    len(labels) == len(bounds) + 1; the last label is the OTHERWISE
    branch. Mirrors the reference's age bucketing
    (data_mart/data_mart.scala:58-63) as a reusable operator.
    """
    if len(labels) != len(bounds) + 1:
        raise ValueError("need one more label than bounds")
    expr = F.when(col < bounds[0], labels[0])
    for bound, label in zip(bounds[1:], labels[1:-1]):
        expr = expr.when(col < bound, label)
    return expr.otherwise(labels[-1])


ACCTBAL_BOUNDS = (0.0, 2500.0, 5000.0, 7500.0)
ACCTBAL_LABELS = ("neg", "low", "mid", "high", "top")


def bucket_sql_case(col: str, bounds: Sequence[float], labels: Sequence[str]) -> str:
    """DuckDB twin of :func:`bucket_column` for oracle SQL."""
    branches = " ".join(
        f"WHEN {col} < {b} THEN '{lab}'" for b, lab in zip(bounds, labels[:-1])
    )
    return f"CASE {branches} ELSE '{labels[-1]}' END"


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Fact ⋈ dimension with an explicit broadcast hint on the dimension.

    At 100 TB the fact side never moves for a dimension join; the hint
    guarantees broadcast-hash even if statistics are missing/stale.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)
