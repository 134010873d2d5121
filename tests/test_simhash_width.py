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


def test_simhash_bits_over_64_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="bits must be <= 64"):
        simhash(docs, bits=65)


def test_simhash_narrow_signatures_unchanged_by_wide_rung(spark):
    """bits <= 32 must keep the md5 digest: widening the API to sha2
    for the 64-bit rung must NOT re-fingerprint existing narrow
    deployments (their signatures are persisted artifacts)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=16).collect()}
    # Recompute the expected majority-of-md5-high-bit signature in pure
    # Python (independent of the Spark expression under test).
    import hashlib

    def py_sig(text: str, bits: int = 16) -> str:
        sums = [0] * bits
        for tok in text.split(" "):
            if not tok:
                continue
            h = hashlib.md5(tok.encode()).hexdigest()
            for i in range(bits):
                sums[i] += 1 if h[i] in "89abcdef" else -1
        return "".join("1" if s > 0 else "0" for s in sums)

    assert got == {1: py_sig("alpha beta gamma"), 2: py_sig("alpha beta delta")}


def test_neardup_max_hamming_beyond_recall_bound_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    # Default layout: 64-bit / 32-bit blocks -> 2 blocks -> bound 1.
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


def test_neardup_default_64_32_matches_brute_force(spark, sf_dir):
    """The r17 DEFAULT layout — 64-bit sha2-256 signatures, 32-bit
    blocks, max_hamming=1 — must equal brute-force all-pairs Hamming on
    a real text sample (the r16 verdict's done-condition for the width
    rung). Near-identical doc variants are planted so the radius-1
    verify actually bites (64-bit signatures rarely collide naturally
    at 120 docs)."""
    from pyspark.sql import functions as F

    from scala_data_pipeline_spark.sources.tables import load_table

    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(120)
    )
    variants = base.limit(6).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzqx")).alias("text"),
    )
    docs = base.unionByName(variants).localCheckpoint(eager=True)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs).collect()
    }
    sigs = {
        r["doc_id"]: r["simhash"] for r in simhash(docs, bits=64).collect()
    }
    assert all(len(s) == 64 for s in sigs.values())
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if h <= 1:
            want[(a, b)] = h
    assert got == want
    assert want, "planted variants produced no hamming<=1 pairs"
