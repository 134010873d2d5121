"""BPE tokenizer training (ext/bpe.py)."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.bpe import (
    _merge_word,
    bpe_apply,
    bpe_train,
    train_merges,
    word_counts,
)
from scala_data_pipeline_spark.ext.textstats import bpe_pair_counts
from scala_data_pipeline_spark.sources import load_table


def test_merge_word():
    assert _merge_word(tuple("aaab"), ("a", "a")) == ("aa", "a", "b")
    assert _merge_word(("aa", "a", "b"), ("a", "b")) == ("aa", "ab")
    assert _merge_word(tuple("xy"), ("a", "b")) == ("x", "y")


def test_first_merge_matches_pair_count_oracle(spark, sf_dir):
    """Merge #1 must be the top-ranked adjacent char pair from
    bpe_pair_counts — the oracle-checked counting query."""
    docs = load_table(spark, sf_dir, "documents")
    top = bpe_pair_counts(docs, top_k=1).collect()[0]
    first = bpe_train(docs, n_merges=1).collect()[0]
    assert first.left + first.right == top.pair
    assert first.pair_count == top.n_occurrences


def test_train_deterministic_and_counts_decrease(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    b = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    assert a == b
    # Pair counts are non-increasing in merge order only in the
    # aggregate sense; assert positivity + distinct merges instead.
    assert all(r[3] > 0 for r in a)
    assert len({(r[1], r[2]) for r in a}) == len(a)


def test_apply_reduces_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    vocab = [(r.word, r.n) for r in word_counts(docs).collect()]
    merges = train_merges(vocab, 8)
    out = bpe_apply(docs, merges).collect()
    assert len(out) == docs.count()
    for r in out:
        # chars >= bpe tokens >= words (merging only shrinks; every
        # word is at least one token)
        assert r.n_bpe_tokens >= r.n_words
        assert all(t for t in r.tokens_head)
    # with 8 merges over a repetitive corpus, SOME doc must compress
    chars = {r.doc_id: r for r in out}
    docs_rows = docs.select("doc_id", "text").collect()
    assert any(
        chars[d.doc_id].n_bpe_tokens
        < sum(len(w) for w in d.text.split(" ") if w)
        for d in docs_rows
    )


def test_no_merges_yields_char_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    out = bpe_apply(docs, []).collect()
    for r, d in zip(
        sorted(out, key=lambda r: r.doc_id),
        sorted(docs.collect(), key=lambda r: r.doc_id),
    ):
        assert r.n_bpe_tokens == sum(len(w) for w in d.text.split(" ") if w)


def test_capped_vocab_unchanged_merges(spark, sf_dir):
    """A non-binding cap (fixture vocab << cap) must leave the learned
    merge table bit-identical to the uncapped run, and a min_count
    filter that keeps every fixture word likewise."""
    docs = load_table(spark, sf_dir, "documents")
    base = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    capped = [
        tuple(r)
        for r in bpe_train(
            docs, n_merges=6, min_count=1, vocab_cap=10**6
        ).collect()
    ]
    assert capped == base


def test_binding_cap_is_deterministic_and_bounded(spark, sf_dir):
    """When the cap DOES bind, the collect is bounded at vocab_cap rows
    and the result is still deterministic (top-K ties break on word)."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = word_counts(docs).count()
    cap = max(2, n_words // 4)
    a = [
        tuple(r)
        for r in bpe_train(docs, n_merges=3, vocab_cap=cap).collect()
    ]
    b = [
        tuple(r)
        for r in bpe_train(docs, n_merges=3, vocab_cap=cap).collect()
    ]
    assert a == b
    assert all(r[3] > 0 for r in a)


def test_min_count_filters_tail(spark, sf_dir):
    """min_count must drop sub-threshold words before the collect —
    train on the filtered vocab and verify it matches a driver-side
    filter of the full vocab."""
    docs = load_table(spark, sf_dir, "documents")
    full = [(r.word, r.n) for r in word_counts(docs).collect()]
    threshold = 3
    expected = train_merges(
        [(w, n) for w, n in full if n >= threshold], 4
    )
    got = [
        (r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=4, min_count=threshold).collect()
    ]
    assert got == [(l, r, c) for l, r, c in expected]


def test_bpe_fertility_invariants(spark, sf_dir):
    """text_bpe_fertility (round-15): fertility >= 1 for every language
    (a word is at least one token), monotone non-increasing in merge
    count, and at zero merges fertility == chars per word exactly."""
    import pyspark.sql.functions as F

    from scala_data_pipeline_spark.queries.ext_text import (
        text_bpe_fertility,
    )

    rows = text_bpe_fertility(spark, sf_dir).collect()
    assert rows, "at least one language"
    assert all(r.fertility >= 1.0 for r in rows)

    docs = load_table(spark, sf_dir, "documents")
    zero = bpe_apply(docs, [])
    agg = zero.agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    chars = (
        docs.select(
            F.sum(
                F.length(F.regexp_replace(F.coalesce("text", F.lit("")), " ", ""))
            ).alias("c")
        ).collect()[0].c
    )
    assert agg.t == chars  # zero merges: one token per character
    # merges only ever reduce token counts
    merged_total = sum(r.n_bpe_tokens for r in rows)
    assert merged_total <= agg.t
    assert sum(r.n_words for r in rows) == agg.w
