"""Curation-operator queries: deterministic sampling, benchmark
decontamination, per-source quota — locally oracle-checked extras (the
driver registry is capped at 50; see queries/__init__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.curation import (
    decontaminate,
    decontaminate_sql,
    deterministic_sample,
    deterministic_sample_sql,
    source_quota,
)
from ..ext.textstats import quality_score_sql
from ..sources import load_table

SAMPLE_FRACTION = 0.25
BENCH_CUTOFF = 25  # doc_id < cutoff plays the benchmark/eval set
QUOTA_N = 5


def curation_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, SAMPLE_FRACTION).select(
        "doc_id", "lang", "source"
    )


SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE {deterministic_sample_sql(SAMPLE_FRACTION)}
"""


def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < BENCH_CUTOFF)
    corpus = docs.filter(F.col("doc_id") >= BENCH_CUTOFF)
    return decontaminate(corpus, bench).select("doc_id", "lang", "source")


DECON_ORACLE = decontaminate_sql(
    docs_pred=f"doc_id >= {BENCH_CUTOFF}",
    bench_pred=f"doc_id < {BENCH_CUTOFF}",
)


def curation_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_quota(load_table(spark, sf_dir, "documents"), QUOTA_N)


QUOTA_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, {quality_score_sql()} AS quality_score
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY quality_score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, source, quality_score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {QUOTA_N}
"""


QUERIES: dict = {}
ORACLES: dict[str, str] = {}

EXTRA_QUERIES = {
    "curation_sample": curation_sample,
    "curation_decontaminate": curation_decontaminate,
    "curation_source_quota": curation_source_quota,
}

EXTRA_ORACLES = {
    "curation_sample": SAMPLE_ORACLE,
    "curation_decontaminate": DECON_ORACLE,
    "curation_source_quota": QUOTA_ORACLE,
}
