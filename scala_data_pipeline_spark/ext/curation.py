"""Corpus-curation operators beyond dedup: deterministic sampling,
benchmark decontamination, per-source quota selection.

All three are standard large-scale training-data steps and all stay
JVM-side:

- **deterministic_sample** — hash-threshold sampling: keep a row iff a
  hex prefix of md5(key) is below the fraction's threshold. Unlike
  ``DataFrame.sample`` it is reproducible across runs, partitionings
  and engines (the DuckDB oracle computes the identical predicate), and
  it composes: the same fraction on the same keys always selects the
  same subset, so incremental re-runs are stable. Pure scan predicate —
  no shuffle, fully pushable.
- **decontaminate** — drop documents sharing any word n-gram with a
  benchmark/eval set. The benchmark's n-gram digests are broadcast
  (eval sets are small by definition); the corpus explodes its n-grams
  once, hash-joins against the broadcast, and the contaminated doc ids
  anti-join back. Cost: one corpus scan + one broadcast join, no
  corpus-sized shuffle.
- **source_quota** — top-n documents per source by quality score with a
  deterministic tiebreak: the data-mixing primitive ("at most N pages
  per domain"). One shuffle on source; rank + filter, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles, shingles_sql
from .textstats import quality_features


def sample_threshold_hex(fraction: float) -> str:
    """4-hex-char threshold t such that P[substr(md5(k),1,4) < t] ≈
    fraction (md5 hex digits are uniform)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 65536), 65535), "04x")


def deterministic_sample(
    docs: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected by md5(salt||key) hex-prefix
    threshold — reproducible and engine-independent (string comparison
    on lowercase hex, no hex→int parse). ``salt`` decorrelates
    independent samples over the same keys."""
    digest = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return docs.filter(
        F.substring(digest, 1, 4) < sample_threshold_hex(fraction)
    )


def deterministic_sample_sql(
    fraction: float, key_col: str = "doc_id", salt: str = ""
) -> str:
    """DuckDB twin of the sampling predicate (WHERE-clause fragment)."""
    return (
        f"substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 4)"
        f" < '{sample_threshold_hex(fraction)}'"
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Remove from ``docs`` every document sharing at least one word
    ``n``-gram with ``benchmark`` (the eval-set leakage guard)."""
    doc_grams = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), n)).alias("g")
    ).select("doc_id", F.md5("g").alias("h"))
    bench_grams = (
        benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), on="h").select("doc_id").distinct()
    )
    return docs.join(contaminated, on="doc_id", how="left_anti")


def decontaminate_sql(
    docs_pred: str, bench_pred: str, table: str = "documents", n: int = 8
) -> str:
    """DuckDB twin: documents matching ``docs_pred`` that share no
    n-gram digest with documents matching ``bench_pred``."""
    return f"""
WITH bench_grams AS (
  SELECT DISTINCT md5(g) AS h
  FROM (SELECT unnest({shingles_sql('text', n)}) AS g
        FROM {table} WHERE {bench_pred})
), contaminated AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, md5(unnest({shingles_sql('text', n)})) AS h
        FROM {table} WHERE {docs_pred})
  WHERE h IN (SELECT h FROM bench_grams)
)
SELECT doc_id, lang, source
FROM {table}
WHERE {docs_pred}
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def source_quota(docs: DataFrame, n_per_source: int) -> DataFrame:
    """At most ``n_per_source`` documents per source, best quality
    first, doc_id as the deterministic tiebreak."""
    scored = docs.join(
        quality_features(docs).select("doc_id", "quality_score"), on="doc_id"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n_per_source)
        .select("doc_id", "source", "quality_score", "rank")
    )
