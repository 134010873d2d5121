"""Oracle-diff parity for every registered query (the driver's t2 check,
run locally at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from scala_data_pipeline_spark.queries import (
    all_oracles,
    all_queries,
    extra_oracles,
    extra_queries,
)

from .oracle_harness import compare, duckdb_run

# Driver-facing registry plus the locally-verified extras — the full
# sweep covers both so a demoted variant keeps its oracle check.
QUERIES = {**all_queries(), **extra_queries()}
ORACLES = {**all_oracles(), **extra_oracles()}


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle = duckdb_run(ORACLES[name], sf_dir)
    compare(spark_df, oracle, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
