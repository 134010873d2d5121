"""The ``features`` module (features/features.scala): per-user ML
feature matrix = top-k domain visit vector + time-of-day/weekday counts
+ work/evening fractions, full-outer joined with the users×items matrix
(J7/J8).

Scale notes vs the reference: the top-k domain set is computed with
TakeOrderedAndProject and then BROADCAST into a semi-join — the
reference uses a full-outer join against the top-1000 list producing a
null pivot column it drops afterwards (features.scala:47-58, SURVEY.md
J5 note); a broadcast semi-join keeps the same result without shuffling
the fact side. All coalesce(5)/coalesce(1) caps are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import pivot_counts, sanitize_label, topk
from ..operators.matrix import user_time_matrix


def top_domains(visits: DataFrame, k: int = 1000) -> DataFrame:
    """Top-k domains by visit count (features.scala:31-38), deterministic
    tiebreak on the domain value."""
    counts = visits.groupBy("domain").agg(F.count(F.lit(1)).alias("cnt"))
    return topk(counts, order_col="cnt", k=k, tiebreak="domain")


def domain_feature_matrix(
    visits: DataFrame, domains: list[str]
) -> DataFrame:
    """Per-user visit counts over the top-domain set, packed into an
    ordered array<bigint> (features.scala:50-59). ``domains`` must be
    the sorted top-k list — explicit values keep the pivot single-pass."""
    filtered = visits.filter(F.col("domain").isin(domains))  # semi-join shape
    wide = pivot_counts(
        filtered, key="uid", pivot_col="domain", values=domains, prefix="d_"
    )
    ordered_cols = [F.col(f"d_{sanitize_label(d)}") for d in domains]
    return wide.select("uid", F.array(*ordered_cols).alias("domain_features"))


def build_features(
    visits: DataFrame,
    users_items: DataFrame,
    k: int = 1000,
) -> DataFrame:
    """visits: (uid, domain, ts). users_items: wide matrix keyed uid.
    Returns the J7/J8 full-outer assembly (features.scala:93-108)."""
    domains = sorted(r["domain"] for r in top_domains(visits, k).collect())
    dom_matrix = domain_feature_matrix(visits, domains)
    time_matrix = user_time_matrix(
        visits.withColumnRenamed("uid", "user_id")
    ).withColumnRenamed("user_id", "uid")
    web = time_matrix.join(dom_matrix, on="uid", how="outer")
    out = web.join(users_items, on="uid", how="outer")
    num_cols = [
        c for c, t in out.dtypes if t in ("bigint", "int") and c != "uid"
    ]
    return out.na.fill(0, num_cols)
