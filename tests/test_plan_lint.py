"""plan_lint flags the cluster-scale failure modes and stays quiet on
clean plans — the API that lets a pipeline gate its own queries with
the same checks the registry's plan locks apply."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from scala_data_pipeline_spark.plans.inspect import plan_lint
from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _rules(findings):
    return {f["rule"] for f in findings}


def test_clean_plan_is_clean(spark):
    orders = load_table(spark, SF, "orders")
    df = (
        orders.where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert plan_lint(df) == []


def test_cartesian_flagged(spark):
    # a tiny side compiles to a (broadcast) nested-loop join, not a
    # CartesianProduct — disable auto-broadcast so the planner emits
    # the true cartesian the lint exists to catch
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = load_table(spark, SF, "orders")
        b = load_table(spark, SF, "lineitem")
        df = a.crossJoin(b)
        assert "cartesian-product" in _rules(plan_lint(df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_python_udf_flagged(spark):
    from pyspark.sql.types import StringType

    shout = F.udf(lambda s: s.upper() if s else s, StringType())
    df = load_table(spark, SF, "nation").select(shout("n_name"))
    found = plan_lint(df)
    assert "python-in-plan" in _rules(found)


def test_global_window_flagged(spark):
    w = Window.orderBy("o_orderkey")
    df = load_table(spark, SF, "orders").select(
        F.row_number().over(w).alias("rn")
    )
    assert "global-window" in _rules(plan_lint(df))


def test_partitioned_window_not_flagged(spark):
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    df = load_table(spark, SF, "orders").select(
        F.row_number().over(w).alias("rn")
    )
    assert "global-window" not in _rules(plan_lint(df))
