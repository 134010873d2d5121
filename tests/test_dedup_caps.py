"""Degenerate-corpus guards for the pair-generating dedup operators.

Real web corpora contain floods of identical boilerplate (empty pages,
error templates). Without caps, every such document lands in the same
LSH band buckets / shingle groups and a single task gets an O(N²)
combination explode. These tests feed exactly that shape and assert the
output stays linear.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.dedup import (
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
)
from scala_data_pipeline_spark.sources import load_table

N_BOILER = 120
BOILER_TEXT = "error page not found please try again later " * 3


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [(i, "en", "web", BOILER_TEXT.strip()) for i in range(N_BOILER)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])


def test_lsh_oversized_bucket_emits_star_not_clique(spark, boiler_docs):
    pairs = lsh_candidate_pairs(boiler_docs, bucket_cap=16)
    got = pairs.collect()
    # Star: keeper (min id) paired with every other id — N-1 rows, not
    # the N*(N-1)/2 clique (7140 here).
    assert len(got) == N_BOILER - 1
    assert {r["doc_a"] for r in got} == {0}
    assert {r["doc_b"] for r in got} == set(range(1, N_BOILER))


def test_lsh_small_buckets_unaffected_by_cap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    capped = lsh_candidate_pairs(docs, bucket_cap=64)
    uncapped = lsh_candidate_pairs(docs, bucket_cap=10**9)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_jaccard_df_cap_bounds_boilerplate(spark, boiler_docs):
    # Every shingle of the flood is ultra-common -> excluded as a
    # stop-gram -> no pairs (the flood is exact-dedup's job, which
    # corpus_job runs first).
    pairs = ngram_jaccard_pairs(boiler_docs, max_doc_freq=16)
    assert pairs.count() == 0


def test_jaccard_finds_neardups_despite_flood(spark, boiler_docs):
    near_a = "quick brown fox jumps over the lazy dog near the river bank today"
    near_b = "quick brown fox jumps over the lazy dog near the river bank tonight"
    extra = spark.createDataFrame(
        [(10_000, "en", "web", near_a), (10_001, "en", "web", near_b)],
        ["doc_id", "lang", "source", "text"],
    )
    pairs = ngram_jaccard_pairs(
        boiler_docs.unionByName(extra), threshold=0.3, max_doc_freq=16
    )
    got = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert got == [(10_000, 10_001)]


def test_verify_pairs_matches_blocked_jaccard(spark, sf_dir):
    # For pairs produced by both paths, the exact Jaccard value must
    # agree: verify-on-candidates is the same statistic computed via
    # array_intersect instead of a shingle-group explode.
    docs = load_table(spark, sf_dir, "documents")
    candidates = lsh_candidate_pairs(docs)
    verified = jaccard_verify_pairs(docs, candidates, threshold=0.0)
    blocked = ngram_jaccard_pairs(docs, threshold=0.0, max_doc_freq=10**9)
    both = verified.alias("v").join(
        blocked.alias("b"), on=["doc_a", "doc_b"]
    )
    assert both.count() > 0
    mismatch = both.filter(
        (F.col("v.jaccard") != F.col("b.jaccard"))
        | (F.col("v.n_common") != F.col("b.n_common"))
    )
    assert mismatch.count() == 0


def test_knn_oversized_bucket_emits_star_not_clique(spark):
    """r6 backstop: identical vectors land in ONE bucket per band; the
    cap must degrade it to a keeper star (non-keepers see only the
    keeper), bounding output at N-1 edges instead of N(N-1)/2."""
    from collections import Counter

    from scala_data_pipeline_spark.ext.similarity import knn_join

    n = 120
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 64).alias("embedding"),
    )
    rows = knn_join(df, k=5, bucket_cap=16).collect()
    per = Counter(r.vec_id for r in rows)
    assert per[0] == 5  # keeper keeps its k best
    assert all(per[v] == 1 for v in range(1, n))
    assert all(r.nbr_id == 0 for r in rows if r.vec_id != 0)


def test_knn_small_buckets_unaffected_by_cap(spark, sf_dir):
    from scala_data_pipeline_spark.sources import load_table
    from scala_data_pipeline_spark.ext.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    capped = knn_join(emb, k=5, bucket_cap=64)
    uncapped = knn_join(emb, k=5, bucket_cap=10**9)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_simhash_oversized_bucket_emits_star_not_clique(spark, boiler_docs):
    """r18: simhash pair-gen moved to per-anchor chunked emission (per-
    row memory O(bucket), cap raised 1024 -> 4096 as a pure OUTPUT
    bound). The keeper-star degradation above the cap must still hold:
    identical docs share every half-signature bucket, so a tiny cap
    yields the min-id star, not the clique."""
    from scala_data_pipeline_spark.ext.dedup import simhash_neardup_pairs

    docs = boiler_docs.select("doc_id", "text")
    got = simhash_neardup_pairs(docs, bucket_cap=16).collect()
    assert len(got) == N_BOILER - 1
    assert {r["doc_a"] for r in got} == {0}
    assert {r["doc_b"] for r in got} == set(range(1, N_BOILER))
    # identical texts: every pair is hamming 0
    assert {r["hamming"] for r in got} == {0}


def test_simhash_mid_size_bucket_emits_full_clique(spark):
    """r19: buckets under the cap must yield the FULL clique at any
    size (a size-dispatched one-array fast path was prototyped against
    the r18 verdict's item 3, measured performance-neutral-to-worse,
    and rejected — see the adjudication note in simhash_neardup_pairs;
    this pins the semantics the prototype almost broke: its first form
    gave any bucket <= 256 the clique even ABOVE a caller-shrunk cap)."""
    from scala_data_pipeline_spark.ext.dedup import simhash_neardup_pairs

    for n in (256, 260):
        rows = [(i, BOILER_TEXT.strip()) for i in range(n)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = simhash_neardup_pairs(docs, bucket_cap=4096).collect()
        assert len(got) == n * (n - 1) // 2
        assert all(r.doc_a < r.doc_b and r.hamming == 0 for r in got)


def test_simhash_small_buckets_unaffected_by_cap(spark, sf_dir):
    from scala_data_pipeline_spark.ext.dedup import simhash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    capped = simhash_neardup_pairs(docs, bucket_cap=4096)
    uncapped = simhash_neardup_pairs(docs, bucket_cap=10**9)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0
