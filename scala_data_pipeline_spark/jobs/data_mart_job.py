"""The ``data_mart`` module (data_mart/data_mart.scala): four-source
batch ETL into one wide per-user mart.

Source-agnostic: takes the four DataFrames (the reference pulls them
from Cassandra/ES/PostgreSQL/HDFS — sources/connectors.py builds those
readers; tests feed testdata-shaped frames).

Shape (data_mart.scala:58-135):
  clients       → age bucketing (CASE chain)
  web logs      → explode visits, URL-decode, domain extract, join
                  domain→category dim, pivot to web_<cat> counts
  shop visits   → pivot to shop_<cat> counts
  final         → clients ⟕ web-pivot ⟕ shop-pivot, merged full-outer
                  on (uid, gender, age_cat), na.fill(0)

Scale notes vs the reference: the category dimension joins broadcast
(J1's dim is tiny); pivots take explicit value lists (no eager distinct
scan); the reference's repartition(2)/repartition(5) parallelism caps
are dropped — AQE sizes the exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import extract_domain, url_decode_pandas
from ..operators.aggregates import pivot_counts
from ..operators.relational import bucket_column, dim_join

AGE_BOUNDS = (25, 35, 45, 55)
AGE_LABELS = ("18-24", "25-34", "35-44", "45-54", ">=55")


def bucket_clients(clients: DataFrame) -> DataFrame:
    """uid/gender/age → uid/gender/age_cat (data_mart.scala:58-64)."""
    return clients.select(
        "uid",
        "gender",
        bucket_column(F.col("age"), AGE_BOUNDS, AGE_LABELS).alias("age_cat"),
    )


def weblog_categories(
    logs: DataFrame, domain_cats: DataFrame
) -> DataFrame:
    """Explode visits, decode+extract domains, attach categories
    (data_mart.scala:88-113). domain_cats: (domain, category)."""
    visits = logs.select(
        "uid", F.explode("visits").alias("visit")
    ).filter(F.col("uid").isNotNull())
    domains = visits.select(
        "uid",
        extract_domain(url_decode_pandas(F.col("visit.url"))).alias("domain"),
    )
    return dim_join(domains, domain_cats, on="domain").select(
        "uid", F.concat(F.lit("web_"), F.lower("category")).alias("cat")
    )


def build_data_mart(
    clients: DataFrame,
    shop_visits: DataFrame,
    domain_cats: DataFrame,
    logs: DataFrame,
    web_cat_values: Sequence[str],
    shop_cat_values: Sequence[str],
) -> DataFrame:
    """The full mart (data_mart.scala:114-135)."""
    buckets = bucket_clients(clients)
    web = pivot_counts(
        weblog_categories(logs, domain_cats),
        key="uid", pivot_col="cat",
        values=[f"web_{c}" for c in web_cat_values],
    )
    shop = pivot_counts(
        shop_visits.filter(F.col("uid").isNotNull()).select(
            "uid",
            F.concat(
                F.lit("shop_"),
                F.lower(F.regexp_replace(F.col("category"), "[ -]", "_")),
            ).alias("cat"),
        ),
        key="uid", pivot_col="cat",
        values=[f"shop_{c}" for c in shop_cat_values],
    )
    web_side = buckets.join(web, on="uid", how="left")
    shop_side = buckets.join(shop, on="uid", how="left")
    merged = shop_side.join(
        web_side, on=["uid", "gender", "age_cat"], how="outer"
    )
    return merged.na.fill(0)
