"""Thin job entrypoints mirroring the reference's 7 spark-submit modules
(SURVEY.md §3). Each job is a pure function over DataFrames plus an I/O
wrapper; configuration arrives as keyword args instead of the
reference's ``spark.<module>.<key>`` conf strings, but a ``conf_get``
helper supports that convention too."""

from __future__ import annotations

from pyspark.sql import SparkSession


def conf_get(spark: SparkSession, key: str, default: str | None = None) -> str:
    """The reference's runtime-parameter convention:
    ``spark.conf.get("spark.<module>.<key>")`` (filter/filter.scala:23-25)."""
    return spark.conf.get(key, default)
