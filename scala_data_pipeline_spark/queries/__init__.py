"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable with (where SQL-expressible) a
DuckDB oracle twin. ``__spark_entry__.py`` re-exports this registry for
the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = [
    "core",
    "core2",
    "core3",
    "pyds",
    "sql_api",
    "stats",
    "functions_batch",
    "matrix",
    "streaming_batch",
    "ml_queries",
    "ext_corpus",
    "ext_dedup",
    "ext_similarity",
    "ext_text",
]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        try:
            mod = import_module(f"{__name__}.{m}")
        except ModuleNotFoundError:
            continue
        dupes = set(out) & set(mod.QUERIES)
        if dupes:
            raise RuntimeError(f"duplicate query names {dupes} in {m}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        try:
            mod = import_module(f"{__name__}.{m}")
        except ModuleNotFoundError:
            continue
        out.update(getattr(mod, "ORACLES", {}))
    return out
