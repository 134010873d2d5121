"""Round-16: the simhash signature width is the documented scale knob
(SCALE_NOTES r15) — it must be reachable through the API without a
source edit, guarded against silently-wrong configurations (advisor
r15 items 4 and 5), and correct at a non-default width.

- bits > 32 must raise (md5 has 32 hex digits; a stripped assert under
  ``python -O`` previously let F.substring read '' past the digest and
  produce wrong signatures).
- max_hamming beyond the pigeonhole recall bound of the block layout
  must raise (both engines drop the same true pairs, so the DuckDB
  oracle cannot catch incomplete recall).
- At 32-bit / 8-bit blocks (4 blocks, full recall to hamming 3) the
  operator must return EXACTLY the brute-force all-pairs answer.
"""

from __future__ import annotations

import itertools

import pytest

from scala_data_pipeline_spark.ext.dedup import (
    simhash,
    simhash_neardup_pairs,
)


def test_simhash_bits_over_32_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="bits must be <= 32"):
        simhash(docs, bits=33)


def test_neardup_max_hamming_beyond_recall_bound_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # Default layout: 32-bit / 16-bit blocks -> 2 blocks -> bound 1.
    with pytest.raises(ValueError, match="recall bound 1"):
        simhash_neardup_pairs(docs, max_hamming=2)
    # 4 blocks -> bound 3; 4 is out.
    with pytest.raises(ValueError, match="recall bound 3"):
        simhash_neardup_pairs(docs, max_hamming=4, bits=32, block=8)
    with pytest.raises(ValueError, match="must divide"):
        simhash_neardup_pairs(docs, bits=32, block=12)


def test_neardup_nondefault_width_matches_brute_force(spark, sf_dir):
    """32-bit signatures with 8-bit blocks (4 blocks — the next rung on
    the width ladder) at max_hamming=3: the block-LSH + verify pipeline
    must equal brute-force all-pairs Hamming on a real text sample."""
    from scala_data_pipeline_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(120)
        .localCheckpoint(eager=True)
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(
            docs, max_hamming=3, bits=32, block=8
        ).collect()
    }
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, bits=32).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    # The wider hamming radius must actually bite on real text —
    # otherwise this test proves nothing about recall past radius 1.
    assert any(h > 1 for h in want.values()), (
        "sample produced no pairs with hamming in (1, 3]; enlarge limit"
    )
