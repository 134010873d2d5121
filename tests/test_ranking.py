"""retrieval_eval semantics pinned against a pure-Python reference:
the oracle-parity check proves Spark == DuckDB; this proves both
compute the RIGHT nDCG/MRR/AP/P/recall on randomized corpora."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from scala_data_pipeline_spark.ext.ranking import retrieval_eval

VOCAB = ["alpha", "beta", "gamma", "delta", "pad"]
K = 5
K1 = 1.2
B = 0.75


def _ref_metrics(texts: list[str], terms: tuple[str, ...], k: int):
    """Brute-force BM25 + IR metrics with the implementation's exact
    rounding discipline."""
    docs = [(i, t.split()) for i, t in enumerate(texts)]
    n = len(docs)
    avgdl = sum(len(toks) for _, toks in docs) / n
    dfs = {
        t: sum(1 for _, toks in docs if t in toks) for t in terms
    }
    scored = []
    for doc_id, toks in docs:
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(toks) / avgdl))
        rel = int(all(t in toks for t in terms))
        scored.append((doc_id, round(s, 6), rel))
    n_rel = sum(r for _, _, r in scored)
    ranked = sorted(scored, key=lambda x: (-x[1], x[0]))[:k]
    dcg = sum(
        round(1.0 / math.log2(r + 2), 8)
        for r, (_, _, rel) in enumerate(ranked)
        if rel
    )
    lim = min(n_rel, k)
    idcg = sum(round(1.0 / math.log2(r + 2), 8) for r in range(lim))
    hits = sum(rel for _, _, rel in ranked)
    first = next(
        (r + 1 for r, (_, _, rel) in enumerate(ranked) if rel), None
    )
    cum = 0
    ap_num = 0.0
    for r, (_, _, rel) in enumerate(ranked):
        cum += rel
        if rel:
            ap_num += round(cum / (r + 1), 8)
    return {
        "n_rel": n_rel,
        "hits_at_k": hits,
        "ndcg_at_k": round(dcg / idcg, 6) if n_rel else 0.0,
        "mrr": round(1.0 / first, 6) if first else 0.0,
        "ap_at_k": round(ap_num / lim, 6) if n_rel else 0.0,
        "p_at_k": round(hits / k, 6),
        "recall_at_k": round(hits / n_rel, 6) if n_rel else 0.0,
    }


texts_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join),
    min_size=3,
    max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(texts_strategy)
def test_retrieval_eval_matches_bruteforce(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    terms = ("alpha", "beta")
    got = retrieval_eval(docs, queries={"q": terms}, k=K).collect()
    want = _ref_metrics(texts, terms, K)
    assert len(got) == 1
    row = got[0].asDict()
    assert row.pop("query_id") == "q"
    for key, expect in want.items():
        actual = row[key]
        if isinstance(expect, float):
            assert abs(actual - expect) < 1e-9, (key, actual, expect, texts)
        else:
            assert actual == expect, (key, actual, expect, texts)
