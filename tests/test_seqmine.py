"""Invariant tests for seqmine (PrefixSpan semantics + ALS shape).

PrefixSpan's oracle parity is covered by tests/test_oracle_parity.py;
here the semantics are pinned independently: pattern support is
contains-at-least-once per user (not occurrence count), and pair
support can never exceed either single's support (anti-monotonicity).
ALS has no oracle; its contract is shape + reproducibility under a
fixed seed.
"""

from __future__ import annotations

from scala_data_pipeline_spark.queries.seqmine import (
    ALS_TOPK,
    ml_als_recommend,
    seq_prefixspan,
)

SF = "/root/testdata/sf0.001"


def test_prefixspan_antimonotone_and_bounded(spark):
    rows = {r.pattern: r.freq for r in seq_prefixspan(spark, SF).collect()}
    assert rows, "no frequent sequences at sf0.001"
    singles = {p: f for p, f in rows.items() if ">" not in p}
    for pattern, freq in rows.items():
        if ">" in pattern:
            a, b = pattern.split(">")
            # support(a->b) <= min(support(a), support(b)); the singles
            # must themselves be frequent (Apriori property)
            assert a in singles and b in singles, pattern
            assert freq <= singles[a] and freq <= singles[b], pattern


def test_als_topk_shape_and_reproducibility(spark):
    recs = ml_als_recommend(spark, SF)
    first = {(r.custkey, r.rank): r.brand_id for r in recs.collect()}
    assert first, "no recommendations"
    per_user: dict = {}
    for (user, rank), _ in first.items():
        per_user.setdefault(user, []).append(rank)
    for user, ranks in per_user.items():
        assert sorted(ranks) == list(range(1, ALS_TOPK + 1)), user
    again = {
        (r.custkey, r.rank): r.brand_id
        for r in ml_als_recommend(spark, SF).collect()
    }
    assert first == again, "ALS output not reproducible under fixed seed"
