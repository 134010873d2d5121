"""Incremental view maintenance for a JOIN aggregate (round 7).

The rollup store maintains a single-table aggregate incrementally;
this operator extends the idea to the join-aggregate mart shape
(fact ⋈ dims → groupBy): because the dimensions are unchanged between
refreshes, the delta of the view is just the delta FACT rows pushed
through the same join-aggregate plan —

    Δ(orders ⋈ dims → agg)  =  (Δorders ⋈ dims) → agg

— and the merge is a per-key sum of DECIMAL partials (associative,
order-independent), so the incrementally-maintained mart is
BIT-IDENTICAL to a full rebuild. That identity is this operator's
oracle: the registry query computes the mart via base+delta merge in
Spark while DuckDB rebuilds from scratch — a cross-algorithm check,
not a replay.

At 100 TB: a daily refresh touches |Δ| fact rows + broadcast dims
instead of re-scanning the corpus; the merge reads the (nation-grain)
mart, not the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_mart(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue-by-nation mart: orders ⋈ customer ⋈ nation (dims
    broadcast) → per-nation decimal partials (sum kept as DECIMAL so
    marts stay mergeable — cast to double only at presentation)."""
    joined = orders.join(
        F.broadcast(
            customer.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            )
        ),
        on="o_custkey",
    ).join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("c_nationkey"),
                F.col("n_name").alias("nation"),
            )
        ),
        on="c_nationkey",
    )
    return joined.groupBy("nation").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
            "revenue_partial"
        ),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


def merge_marts(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Per-key merge of two mart partial frames (exact decimal sums)."""
    return (
        old.unionByName(delta)
        .groupBy("nation")
        .agg(
            F.sum("revenue_partial").alias("revenue_partial"),
            F.sum("n_orders").cast("long").alias("n_orders"),
        )
    )


def present_mart(mart: DataFrame) -> DataFrame:
    """Presentation projection: double revenue, stable column set."""
    return mart.select(
        "nation",
        F.col("revenue_partial").cast("double").alias("revenue"),
        "n_orders",
    )
