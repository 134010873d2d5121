"""Exact prefix-filtered set-similarity join (ext/setjoin.py).

The exactness claim is the whole point (LSH banding can miss pairs;
prefix filtering provably cannot), so the core test compares the
operator's output against an all-pairs brute force on a corpus
engineered with pairs just above AND just below the threshold."""

from __future__ import annotations

from itertools import combinations

from scala_data_pipeline_spark.ext.setjoin import prefix_jaccard_join


def _brute_force(rows, t_num, t_den):
    sets = {doc_id: set(text.split()) for doc_id, text in rows}
    out = set()
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if uni and inter * t_den >= uni * t_num:
            out.add((a, b))
    return out


def test_exact_vs_brute_force(spark):
    # 10-token base set; overlaps straddling J = 0.6:
    # 9/11 = 0.818, 8/12 = 0.667, 7/13 = 0.538, 6/14 = 0.429
    base = [f"w{i}" for i in range(10)]
    rows = [(0, " ".join(base))]
    for k, doc_id in ((9, 1), (8, 2), (7, 3), (6, 4)):
        toks = base[:k] + [f"u{doc_id}_{j}" for j in range(10 - k)]
        rows.append((doc_id, " ".join(toks)))
    # an unrelated doc and a disjoint near-clone pair
    rows.append((5, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"))
    rows.append((6, "x0 x1 x2 x3 x4 x5 x6 x7 x8 zz"))  # 9/11 with doc 5
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_join(docs, t_num=6, t_den=10).collect()
    }
    want = _brute_force(rows, 6, 10)
    assert got == want
    assert (0, 1) in got and (0, 2) in got and (5, 6) in got
    assert (0, 3) not in got and (0, 4) not in got


def test_jaccard_values_exact(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),  # inter 9, union 11
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prefix_jaccard_join(docs, t_num=6, t_den=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.inter, r.sz_a, r.sz_b) == (9, 10, 10)
    assert r.jaccard == 9 / 11


def test_identical_flood_degrades_to_keeper_star(spark):
    # 40 identical docs, cap 8: every prefix bucket blows the cap, so
    # the join emits exactly the keeper star (39 pairs, one component)
    # instead of C(40,2) = 780.
    rows = [(i, "a b c d e") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prefix_jaccard_join(docs, t_num=9, t_den=10, bucket_cap=8).collect()
    assert len(out) == 39
    assert all(r.doc_a == 0 for r in out)
    assert all(r.jaccard == 1.0 for r in out)


def test_empty_and_whitespace_docs_yield_no_pairs(spark):
    rows = [(1, ""), (2, "   "), (3, "a b c")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert prefix_jaccard_join(docs, t_num=6, t_den=10).count() == 0
