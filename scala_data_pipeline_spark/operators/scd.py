"""Slowly-Changing-Dimension type-2 merge: apply an update batch to a
versioned dimension table (the data-mart history pattern; engines with
``MERGE INTO`` express this as one statement — here it is one
full-outer join + conditional row emission, no table format required).

Single-pass design: the dimension and the update batch each scan ONCE
and meet in one full-outer join on the business key; every joined row
emits 0-2 output rows via an exploded CASE array:

- key only in dim            → unchanged row passes through;
- key only in updates        → new current row (first version);
- both, attributes equal     → unchanged row passes through;
- both, attributes differ    → the old row closed out
  (``effective_to`` = load date, ``is_current`` = false) PLUS the new
  current row.

At scale this is one shuffle of each side on the key (or zero if both
are bucketed on it) — the branch-and-union formulation most hand-rolled
SCD jobs use scans the dimension 2-3×.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    load_date: str,
) -> DataFrame:
    """dim columns: key, *attrs, effective_from, effective_to,
    is_current; updates columns: key, *attrs. Only current dim rows are
    eligible for close-out (history rows pass through untouched)."""

    def row_struct(
        src: str, eff_from: Column, eff_to: Column, current: Column
    ) -> Column:
        return F.struct(
            F.col(f"{src}.{key}").alias(key),
            *[F.col(f"{src}.{a}").alias(a) for a in attrs],
            eff_from.alias("effective_from"),
            eff_to.alias("effective_to"),
            current.alias("is_current"),
        )

    d = dim.alias("d")
    u = updates.alias("u")
    in_dim = F.col(f"d.{key}").isNotNull()
    in_upd = F.col(f"u.{key}").isNotNull()
    changed = ~F.reduce(
        F.array(
            *[F.col(f"d.{a}").eqNullSafe(F.col(f"u.{a}")) for a in attrs]
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    passthrough = row_struct(
        "d",
        F.col("d.effective_from"),
        F.col("d.effective_to"),
        F.col("d.is_current"),
    )
    closed = row_struct(
        "d", F.col("d.effective_from"), F.lit(load_date), F.lit(False)
    )
    opened = row_struct(
        "u", F.lit(load_date), F.lit(OPEN_END), F.lit(True)
    )
    emitted = (
        F.when(in_dim & ~in_upd, F.array(passthrough))
        .when(~in_dim & in_upd, F.array(opened))
        .when(in_dim & in_upd & ~changed, F.array(passthrough))
        .otherwise(F.array(closed, opened))
    )
    # History rows never join updates (join restricted to current rows
    # upstream); callers pass the full dim — split here so the union is
    # inside one plan.
    current = d.filter(F.col("d.is_current"))
    history = dim.filter(~F.col("is_current"))
    merged = (
        current.join(u, on=F.col(f"d.{key}") == F.col(f"u.{key}"), how="full_outer")
        .select(F.explode(emitted).alias("r"))
        .select("r.*")
    )
    return merged.unionByName(history)


def scd2_apply_sql(
    dim_sql: str, updates_sql: str, key: str, attrs: Sequence[str], load_date: str
) -> str:
    """DuckDB twin (branch-union formulation for clarity; same rows)."""
    cols = ", ".join([key, *attrs])
    eq = " AND ".join(
        f"(d.{a} = u.{a} OR (d.{a} IS NULL AND u.{a} IS NULL))" for a in attrs
    )
    d_cols = ", ".join([f"d.{key}"] + [f"d.{a}" for a in attrs])
    u_cols = ", ".join([f"u.{key}"] + [f"u.{a}" for a in attrs])
    return f"""
WITH dim AS ({dim_sql}), upd AS ({updates_sql}),
cur AS (SELECT * FROM dim WHERE is_current),
hist AS (SELECT * FROM dim WHERE NOT is_current),
changed_keys AS (
  SELECT d.{key} FROM cur d JOIN upd u USING ({key}) WHERE NOT ({eq})
)
SELECT {cols}, effective_from, effective_to, is_current FROM hist
UNION ALL
SELECT {cols}, effective_from, effective_to, is_current FROM cur
WHERE {key} NOT IN (SELECT {key} FROM changed_keys)
UNION ALL
SELECT {d_cols}, d.effective_from, '{load_date}' AS effective_to,
       FALSE AS is_current
FROM cur d WHERE d.{key} IN (SELECT {key} FROM changed_keys)
UNION ALL
SELECT {u_cols}, '{load_date}' AS effective_from,
       '{OPEN_END}' AS effective_to, TRUE AS is_current
FROM upd u
WHERE u.{key} IN (SELECT {key} FROM changed_keys)
   OR u.{key} NOT IN (SELECT {key} FROM cur)
"""
