"""Product-quantization ANN (ext/pq.py): recall vs exact brute force,
determinism, and compression contract."""

from __future__ import annotations

import numpy as np
import pytest

from scala_data_pipeline_spark.ext.pq import (
    pq_encode,
    pq_topk,
    train_codebooks,
)
from scala_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _exact_topk(X, q_idx, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ Xn[q_idx]
    sims[q_idx] = -np.inf
    return set(np.argsort(-sims)[:k])


def test_pq_recall_vs_bruteforce(spark, corpus):
    k = 10
    rows = corpus.select("vec_id", "embedding").orderBy("vec_id").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    id_to_idx = {v: i for i, v in enumerate(ids)}
    out = pq_topk(corpus, k=k, n_queries=5).collect()
    by_q: dict[int, set] = {}
    for r in out:
        by_q.setdefault(r.query_id, set()).add(id_to_idx[r.vec_id])
    recalls = []
    for qid, got in by_q.items():
        want = _exact_topk(X, id_to_idx[qid], k)
        recalls.append(len(got & want) / k)
    # 8x compression (64 floats -> 8 codes); mean recall@10 must stay
    # well above chance (k/N = 10/500 = 0.02).
    assert len(recalls) == 5
    assert float(np.mean(recalls)) >= 0.4, recalls


def test_pq_deterministic(spark, corpus):
    a = sorted(map(tuple, pq_topk(corpus, k=5, n_queries=3).collect()))
    b = sorted(map(tuple, pq_topk(corpus, k=5, n_queries=3).collect()))
    assert a == b


def test_pq_encode_contract(spark, corpus):
    books = train_codebooks(corpus)
    assert books.shape == (16, 32, 4)
    enc = pq_encode(corpus, books)
    rows = enc.collect()
    assert len(rows) == corpus.count()
    for r in rows[:20]:
        assert len(r.codes) == 16
        assert all(0 <= c < 32 for c in r.codes)


def test_pq_planted_clusters(spark):
    # 4 tight clusters in 64-d: PQ top-k neighbors of a cluster member
    # must come from the same cluster.
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 64)) * 5.0
    rows = []
    for i in range(200):
        c = i % 4
        v = centers[c] + rng.normal(size=64) * 0.1
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = pq_topk(df, k=5, n_queries=4).collect()
    assert out
    for r in out:
        assert r.vec_id % 4 == r.query_id % 4, (
            f"query {r.query_id} pulled cross-cluster neighbor {r.vec_id}"
        )


def test_ivfpq_prunes_and_recalls(spark, corpus):
    """IVF-PQ must return valid per-query top-k and, on planted
    clusters, stay within the query's cluster."""
    from scala_data_pipeline_spark.ext.pq import ivfpq_topk

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 64)) * 5.0
    rows = [
        (
            i,
            [float(x) for x in centers[i % 4] + rng.normal(size=64) * 0.1],
            i % 4,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = ivfpq_topk(df, k=5, n_queries=4, n_coarse=8, nprobe=2).collect()
    assert out
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.vec_id % 4 == r.query_id % 4
    for qid, rows_q in by_q.items():
        assert [r.rank for r in sorted(rows_q, key=lambda r: r.rank)] == list(
            range(1, len(rows_q) + 1)
        )


def test_ivfpq_on_real_embeddings(spark, corpus):
    from scala_data_pipeline_spark.ext.pq import ivfpq_topk

    out = ivfpq_topk(corpus, k=5, n_queries=3).collect()
    # 3 queries x up to 5 ranked neighbors, ranks contiguous from 1
    assert 3 <= len(out) <= 15
    assert all(r.rank >= 1 and r.approx_d2 >= 0 for r in out)


def test_pq_index_persistence_roundtrip(spark, corpus, tmp_path):
    """Stored-index lifecycle: train → encode → save → reload →
    identical codebooks and codes (exact, the index is deterministic
    state)."""
    from scala_data_pipeline_spark.ext.pq import (
        load_pq_index,
        save_pq_index,
    )

    books = train_codebooks(corpus)
    encoded = pq_encode(corpus, books)
    path = str(tmp_path / "pq_index")
    save_pq_index(spark, books, encoded, path)
    books2, codes2 = load_pq_index(spark, path)
    assert np.array_equal(books, books2)
    want = {r.vec_id: list(r.codes) for r in encoded.collect()}
    got = {r.vec_id: list(r.codes) for r in codes2.collect()}
    assert got == want
