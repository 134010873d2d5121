"""Training-data export: the tail of the LLM-data flow, downstream of
corpus_job.curate —

    curated documents → PII redaction → chunk to token windows
                      → pack chunks into token-budget bins
                      → partitioned parquet (shard=source / bin)

Composes the session-2 operators into one write job. The whole path is
per-row work (redact, chunk) plus one shard-local window (pack) and the
sink repartition — at 100 TB: scan → one shuffle on the shard key →
partitioned write, no corpus-wide sort or collect. Output layout gives
trainers partition pruning on (shard, bin) and each bin's files hold
~``budget`` tokens of sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ext.chunking import STRIDE, WINDOW, chunk_documents, pack_sequences
from ..ext.curation import pii_redact
from ..sources import load_table
from ..sources.sinks import write_partitioned
from .corpus_job import curate


def build_export(
    docs: DataFrame,
    budget: int = 512,
    window: int = WINDOW,
    stride: int = STRIDE,
) -> DataFrame:
    """documents → (shard, bin_id, doc_id, chunk_idx, chunk, n_tokens).

    The cleaned frame feeds TWO consumers (chunks and bins) that meet in
    a join; Catalyst does not deduplicate common subtrees, so the input
    ``docs`` subtree evaluates once per branch. Persist ``docs`` before
    calling when its upstream is expensive (run() persists the curated
    corpus for exactly this reason — measured 2× wall-clock otherwise)."""
    clean = pii_redact(docs).select(
        "doc_id", F.col("redacted").alias("text")
    ).join(docs.select("doc_id", "source"), on="doc_id")
    bins = pack_sequences(clean, budget=budget).select(
        "doc_id", "shard", "bin_id"
    )
    chunks = chunk_documents(clean, window=window, stride=stride)
    return chunks.join(bins, on="doc_id").select(
        "shard", "bin_id", "doc_id", "chunk_idx", "chunk", "n_tokens"
    )


def run(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    budget: int = 512,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    kept = curate(docs, min_quality=min_quality, langs=langs).select("doc_id")
    curated = (
        docs.join(kept, on="doc_id")
        .select("doc_id", "text", "source")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        export = build_export(curated, budget=budget)
        write_partitioned(export, out_path, ["shard"], files_per_partition=1)
    finally:
        curated.unpersist()
    return export
