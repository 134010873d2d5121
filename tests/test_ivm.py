"""Incremental view maintenance: merged base+delta mart must equal a
one-shot rebuild bit-exactly (decimal partials are associative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.operators.ivm import (
    merge_marts,
    present_mart,
    revenue_mart,
)
from scala_data_pipeline_spark.sources import load_table


def test_incremental_mart_equals_rebuild(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = orders.filter(F.col("o_orderkey") % 10 < 8)
    delta = orders.filter(F.col("o_orderkey") % 10 >= 8)
    merged = present_mart(
        merge_marts(
            revenue_mart(base, customer, nation),
            revenue_mart(delta, customer, nation),
        )
    )
    rebuilt = present_mart(revenue_mart(orders, customer, nation))
    got = {r.nation: (r.revenue, r.n_orders) for r in merged.collect()}
    want = {r.nation: (r.revenue, r.n_orders) for r in rebuilt.collect()}
    assert got == want
    # a second delta merge stays exact (associativity in practice)
    d2 = orders.filter(F.col("o_orderkey") % 10 == 9)
    d1 = orders.filter(F.col("o_orderkey") % 10 == 8)
    twice = present_mart(
        merge_marts(
            merge_marts(
                revenue_mart(base, customer, nation),
                revenue_mart(d1, customer, nation),
            ),
            revenue_mart(d2, customer, nation),
        )
    )
    got2 = {r.nation: (r.revenue, r.n_orders) for r in twice.collect()}
    assert got2 == want
