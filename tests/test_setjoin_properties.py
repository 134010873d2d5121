"""Property-based checks for the round-11 operators: randomized
corpora compared against pure-Python brute force. Hypothesis shrinks
any counterexample to a minimal corpus, which is the strongest
correctness artifact available for the prefix join's exactness claim
(the unit tests pin specific shapes; these sweep the space)."""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

from pyspark.sql import functions as F  # noqa: F401 (parity with peers)

from scala_data_pipeline_spark.ext.setjoin import prefix_jaccard_join
from scala_data_pipeline_spark.ext.textstats import repetition_signals

# tiny vocab forces collisions, short docs keep each example fast
_VOCAB = ["a", "b", "c", "d", "ee", "fff"]


def test_prefix_join_matches_brute_force_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    docs_strategy = st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
        min_size=2,
        max_size=10,
    )

    @settings(max_examples=25, deadline=None)
    @given(docs=docs_strategy, t_num=st.integers(min_value=3, max_value=9))
    def check(docs, t_num):
        rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
        got = {
            (r.doc_a, r.doc_b, r.inter)
            for r in prefix_jaccard_join(
                spark.createDataFrame(rows, ["doc_id", "text"]),
                t_num=t_num,
                t_den=10,
            ).collect()
        }
        sets = {i: set(w) for i, w in enumerate(docs)}
        want = set()
        for a, b in combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and Fraction(inter, uni) >= Fraction(t_num, 10):
                want.add((a, b, inter))
        assert got == want, (docs, t_num)

    check()


def test_repetition_signals_match_python_reference_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        toks=st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=14)
    )
    def check(toks):
        df = repetition_signals(
            spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
        )
        r = df.collect()[0]
        totch = sum(len(t) for t in toks)
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        assert r.n_tokens == len(toks) and r.n_token_chars == totch
        if g2:
            from collections import Counter

            c = Counter(g2)
            best = min(
                c.items(), key=lambda kv: (-kv[1], kv[0])
            )  # count desc, gram asc
            gram_chars = sum(len(w) for w in best[0].split(" "))
            assert (r.top2_gram, r.top2_count) == (best[0], best[1])
            assert r.top2_char_frac == (
                best[1] * gram_chars / totch if totch else 0.0
            )
        else:
            assert r.top2_count == 0
        from collections import Counter

        c5 = Counter(g5)
        dupch = sum(
            cnt * sum(len(w) for w in g.split(" "))
            for g, cnt in c5.items()
            if cnt >= 2
        )
        assert r.dup5_chars == dupch

    check()
