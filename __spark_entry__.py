"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the ``scala_data_pipeline_spark`` package: the registry in
``scala_data_pipeline_spark.queries`` holds one ``(spark, sf_dir) ->
DataFrame`` callable per implemented operator from SURVEY.md §2 plus the
matching DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scala_data_pipeline_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from scala_data_pipeline_spark.queries.core import flagship_datamart

    return flagship_datamart(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
