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


# ---------------------------------------------------------------------------
# Bounded-error oracle checks for HLL estimates (round 10, verdict r9
# item 7): the estimate has no value-hash twin by design, but the EXACT
# COUNT(DISTINCT) is SQL-expressible — assert every day's estimate
# within the sketch's error envelope (default lgConfigK=12 → std err
# ~1.6%; 5% ≈ 3σ) with keys matching one-to-one. Upgrades two rows-only
# registry entries to checked rows.
# ---------------------------------------------------------------------------

_MAU_EXACT_SQL = """
WITH du AS (
  SELECT DISTINCT
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         user_id
  FROM events WHERE user_id IS NOT NULL
), days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS exact_v
FROM days d JOIN du ON du.day BETWEEN d.day - 27 AND d.day
GROUP BY 1
"""

_DAILY_USERS_EXACT_SQL = """
SELECT date_trunc('day', ts) AS bucket_day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_v
FROM events GROUP BY 1
"""

# name -> (exact sql, key col, estimate col, relative bound)
HLL_BOUNDED = {
    "mau_28d_hll": (_MAU_EXACT_SQL, "day", "mau_28d", 0.05),
    "rollup_daily_users_hll": (
        _DAILY_USERS_EXACT_SQL,
        "bucket_day",
        "n_distinct_users_est",
        0.05,
    ),
}


@pytest.mark.parametrize("name", sorted(HLL_BOUNDED))
def test_hll_estimate_within_bound_of_exact_oracle(spark, sf_dir, name):
    sql, key, est_col, bound = HLL_BOUNDED[name]
    got = {
        r[key]: r[est_col]
        for r in QUERIES[name](spark, sf_dir).collect()
    }
    exact_pdf = duckdb_run(sql, sf_dir)
    exact = dict(zip(exact_pdf[key], exact_pdf["exact_v"]))
    # pandas timestamps vs Spark datetimes: normalize via isoformat
    if key == "bucket_day":
        got = {k.isoformat(): v for k, v in got.items()}
        exact = {k.isoformat(): v for k, v in exact.items()}
    assert set(got) == set(exact), f"{name}: key sets differ"
    for k in exact:
        e, g = exact[k], got[k]
        assert abs(g - e) <= max(1, bound * e), (
            f"{name}[{k}]: estimate {g} outside {bound:.0%} of exact {e}"
        )
