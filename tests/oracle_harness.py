"""Local replica of the driver's oracle-diff check.

Runs a registered Spark query and its DuckDB oracle on the same sf dir,
normalizes both results (columns sorted by name, rows sorted by all
columns), and asserts EXACT equality — floats included, matching the
driver's value-hash semantics. Catching a mismatch here
is much cheaper than waiting for the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v,
                na_action="ignore",
            )
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "query") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch\n spark={list(got.columns)}\n oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # Exact equality, like the driver's value hash. Any slack here
            # (round / isclose) masks real driver hash-fails — round 1's
            # pricing_summary decimal-tie drift passed locally for exactly
            # that reason.
            ok = [
                (a == b) or (pd.isna(a) and pd.isna(b))
                for a, b in zip(g, w)
            ]
            assert all(ok), f"{name}: value mismatch in float col {c}: " + str(
                [(a, b) for a, b, o in zip(g, w, ok) if not o][:5]
            )
        else:
            mismatch = g[~(g.eq(w) | (g.isna() & w.isna()))]
            assert mismatch.empty, (
                f"{name}: value mismatch in col {c} at rows {list(mismatch.index[:5])}: "
                f"spark={list(g[mismatch.index[:5]])} oracle={list(w[mismatch.index[:5]])}"
            )
