"""Training-corpus curation pipeline — the end-to-end LLM-data flow the
extension operators exist for:

    documents → exact dedup (md5 keeper) → quality gate → language gate
              → enriched output (token counts + fingerprint)

Every stage is a pure DataFrame transform from ext/ (dedup, textstats),
so the whole pipeline is ONE Catalyst plan: the scan streams through
dedup's digest-groupBy, the quality/lang filters collapse into the same
stage, and the fingerprint join is the only second shuffle. At 100 TB
this runs as: full scan → digest shuffle → (broadcast of nothing) →
fingerprint shuffle — two passes over the (shrinking) data, no
driver-side loops.

A near-dup stage (MinHash-LSH candidates → Jaccard verify → drop b-side)
slots between dedup and the quality gate; it is kept optional because
the pair-join cost is workload-dependent (``near_dup=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ext.dedup import (
    exact_dedup_groups,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
)
from ..ext.textstats import fingerprint, quality_score_col, tokens_col


def gated_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    near_dup: bool = False,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """The kept rows BEFORE fingerprint enrichment: exact-dedup keepers
    passing the quality and language gates, carrying every input column
    plus (n_tokens, quality_score).

    The quality gate appends bare column expressions
    (textstats.quality_score_col) instead of self-joining the
    quality_features frame back on doc_id — identical rows, one fewer
    evaluation of the dedup subtree per consumer (r19; Catalyst does
    not deduplicate common subtrees, so the old self-join doubled the
    scan → digest-shuffle pipeline)."""
    keepers = exact_dedup_groups(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    deduped = docs.join(keepers, on="doc_id")  # keeper ids are unique
    if near_dup:
        # LSH candidates verified by exact Jaccard; drop the larger
        # doc_id of each confirmed near-dup pair.
        candidates = lsh_candidate_pairs(deduped)
        confirmed = (
            jaccard_verify_pairs(deduped, candidates, threshold=jaccard_threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        deduped = deduped.join(confirmed, on="doc_id", how="left_anti")
    text = F.col("text")
    return (
        deduped.withColumn(
            "n_tokens", F.size(tokens_col(text)).cast("long")
        )
        .withColumn("quality_score", quality_score_col(text))
        .filter(F.col("quality_score") >= min_quality)
        .filter(F.col("lang").isin(*langs))
    )


def curate(
    docs: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    near_dup: bool = False,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Returns the curated corpus: one row per kept doc with
    (doc_id, lang, n_tokens, quality_score, fingerprint)."""
    gated = gated_corpus(
        docs,
        min_quality=min_quality,
        langs=langs,
        near_dup=near_dup,
        jaccard_threshold=jaccard_threshold,
    )
    prints = fingerprint(gated)
    return gated.join(prints, on="doc_id").select(
        "doc_id", "lang", "n_tokens", "quality_score", "fingerprint"
    )
