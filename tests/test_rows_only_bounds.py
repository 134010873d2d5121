"""Bounded / parity checks for the remaining rows-only registry extras
(round-13 verdict item 7: every estimate- or iteration-valued query
that cannot take a value-hash oracle still gets an externally-checkable
contract).

- sim_semdedup_greedy / sim_semdedup_stats: the k=1 fixture reduces
  K-means to a single cluster, where the production greedy must agree
  DECISION-FOR-DECISION with semantic_dedup_k1_exact — the driver-slot
  query whose DuckDB recursive-CTE twin is hash-checked. That chains
  the rows-only greedy to a hash-checked oracle.
- sim_topk_pq / sim_topk_ivfpq: recall of the REGISTRY entries (over
  the testdata embeddings, not a synthetic fixture) against exact
  brute-force cosine computed independently with numpy — mean recall@5
  must stay far above chance (5/499 ~ 1%).
- text_bpe_train: the full learned merge table must equal a pure
  single-node reference BPE run in this test from DuckDB's word
  counts — an end-to-end external replay, not just the merge-#1 anchor
  in test_bpe.py.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from scala_data_pipeline_spark.queries import extra_queries

EXTRAS = extra_queries()


def test_semdedup_greedy_k1_matches_hash_checked_oracle_path(spark, sf_dir):
    """semantic_dedup (the rows-only production greedy, K-means
    sharded) at k=1 must make the SAME keep/dup_of decisions as
    semantic_dedup_k1_exact — the driver-slot query checked bit-exactly
    against its DuckDB recursive-CTE twin."""
    from scala_data_pipeline_spark.ext.semdedup import (
        semantic_dedup,
        semantic_dedup_k1_exact,
    )
    from scala_data_pipeline_spark.queries.ext_similarity import (
        _SEMDEDUP_EPS,
    )
    from scala_data_pipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup(emb, k=1, eps=_SEMDEDUP_EPS).collect()
    }
    want = {
        r.vec_id: (r.keep, r.dup_of)
        for r in semantic_dedup_k1_exact(emb, eps=_SEMDEDUP_EPS).collect()
    }
    assert got == want
    # the threshold actually bites on this fixture (not all-keep)
    assert any(not keep for keep, _ in got.values())


def test_semdedup_stats_consistent_with_greedy(spark, sf_dir):
    """sim_semdedup_stats must be EXACTLY the groupBy-cluster summary
    of sim_semdedup_greedy's decisions (same registry params)."""
    greedy = EXTRAS["sim_semdedup_greedy"](spark, sf_dir).collect()
    stats = {
        r.cluster: (r.n_vectors, r.n_kept, r.drop_ratio)
        for r in EXTRAS["sim_semdedup_stats"](spark, sf_dir).collect()
    }
    by_cluster: dict[int, list] = {}
    for r in greedy:
        by_cluster.setdefault(r.cluster, []).append(r.keep)
    assert set(stats) == set(by_cluster)
    for c, keeps in by_cluster.items():
        n, kept = len(keeps), sum(keeps)
        assert stats[c] == (n, kept, round(1 - kept / n, 6)), c


def _exact_recall_at_5(rows, sf_dir: str) -> float:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    ids = emb.vec_id.to_numpy()
    idx = {int(v): i for i, v in enumerate(ids)}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    by_q: dict[int, set] = {}
    for r in rows:
        by_q.setdefault(int(r.query_id), set()).add(int(r.vec_id))
    recalls = []
    for qid, got in by_q.items():
        sims = Xn @ Xn[idx[qid]]
        sims[idx[qid]] = -2.0  # exclude self, like the ANN paths
        want = {int(ids[i]) for i in np.argsort(-sims)[:5]}
        recalls.append(len((got - {qid}) & want) / 5)
    assert len(recalls) == 5  # the registry convention: 5 query vectors
    return float(np.mean(recalls))


def test_sim_topk_pq_recall_vs_exact(spark, sf_dir):
    """Registry sim_topk_pq: mean recall@5 vs exact cosine over the
    REAL testdata embeddings. 8x-compressed codes measured ~0.36 here;
    chance is 5/499 ~ 1% — the bound catches a broken ADC scan, not
    quantization noise."""
    rows = EXTRAS["sim_topk_pq"](spark, sf_dir).collect()
    assert _exact_recall_at_5(rows, sf_dir) >= 0.2


def test_sim_topk_ivfpq_recall_vs_exact(spark, sf_dir):
    """Registry sim_topk_ivfpq: coarse pruning plus ADC must still
    recall (measured ~0.48 here; bound 0.25 >> 1% chance)."""
    rows = EXTRAS["sim_topk_ivfpq"](spark, sf_dir).collect()
    assert _exact_recall_at_5(rows, sf_dir) >= 0.25


def _reference_bpe(word_counts: list[tuple[str, int]], n_merges: int):
    """Independent single-node BPE (the textbook algorithm), written
    here rather than imported so it cannot share a bug with ext/bpe.py:
    greedy argmax pair by (count desc, pair lex asc), re-segment,
    repeat."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in word_counts:
        t = tuple(w)
        words[t] = words.get(t, 0) + n
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append((pair[0], pair[1], counts[pair]))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + n
        words = nxt
    return merges


def test_text_bpe_train_matches_single_node_reference(spark, sf_dir):
    """The distributed merge table == a from-scratch reference BPE fed
    by DuckDB's exact word counts (external vocabulary, external merge
    loop)."""
    got = [
        (r.left, r.right, r.pair_count)
        for r in EXTRAS["text_bpe_train"](spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    con = duckdb.connect()
    try:
        wc = con.execute(
            f"""
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS w
                  FROM '{sf_dir}/documents.parquet')
            GROUP BY 1
            """
        ).fetchall()
    finally:
        con.close()
    want = _reference_bpe(wc, n_merges=len(got))
    assert got == want
