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
from ..ext.curation import pii_redacted_col
from ..sources import load_table
from ..sources.sinks import write_partitioned
from .corpus_job import gated_corpus


def build_export(
    docs: DataFrame,
    budget: int = 512,
    window: int = WINDOW,
    stride: int = STRIDE,
) -> DataFrame:
    """documents → (shard, bin_id, doc_id, chunk_idx, chunk, n_tokens).

    The cleaned frame feeds TWO consumers (chunks and bins) that meet in
    a join; Catalyst does not deduplicate common subtrees, so without a
    barrier the input ``docs`` subtree would evaluate once per branch
    (measured 2× wall-clock when the upstream is the curated corpus).
    ``clean`` is therefore localCheckpoint'ed (lazy): the scan → redact
    pipeline materializes once on first action and both branches read
    the materialized rows — the production shape is persisting the
    cleaned corpus between the redaction and packing stages.

    Fault-tolerance tradeoff (r19 advisor): localCheckpoint storage is
    NOT replayable — an executor lost mid-export fails the job instead
    of recomputing from lineage, and the blocks free when the frame is
    GC'd rather than at a deterministic unpersist. The right dial at
    100 TB is a reliable ``checkpoint()`` to the checkpoint dir (or a
    write + read-back of the cleaned corpus, which a multi-stage
    production export does anyway); localCheckpoint is the
    local/bench-run shape. Redaction
    itself is a bare column expression (curation.pii_redacted_col), not
    the pii_redact frame self-joined back on doc_id (r19: that join
    re-evaluated ``docs`` a second time per branch)."""
    clean = docs.select(
        "doc_id",
        pii_redacted_col(F.col("text")).alias("text"),
        "source",
    ).localCheckpoint(eager=False)
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
    docs = load_table(spark, sf_dir, "documents")
    # gated_corpus is the kept set curate() computes MINUS the
    # fingerprint enrichment the export never reads (fingerprint() emits
    # exactly one row per doc — shingles() yields ≥1 shingle for every
    # document — so dropping that inner join cannot change membership).
    # build_export materializes its cleaned frame itself (localCheckpoint
    # in build_export), so no caller-side persist is needed anymore.
    curated = gated_corpus(docs, min_quality=min_quality, langs=langs).select(
        "doc_id", "text", "source"
    )
    export = build_export(curated, budget=budget)
    write_partitioned(export, out_path, ["shard"], files_per_partition=1)
    return export
