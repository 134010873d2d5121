"""observe()-based quality metrics: one pass, values match direct aggs,
threshold evaluation flags the planted violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.operators.quality import (
    assert_quality,
    with_quality_metrics,
)
from scala_data_pipeline_spark.sources import load_table


def test_metrics_match_direct_aggregates(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    monitored, obs = with_quality_metrics(
        events, null_cols=["user_id"], bound_cols=["value"]
    )
    n = monitored.count()  # the action the metrics ride on
    m = obs.get
    assert m["n_rows"] == n
    direct = events.agg(
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("nn"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).first()
    assert m["n_null_user_id"] == direct["nn"]
    assert m["min_value"] == direct["lo"]
    assert m["max_value"] == direct["hi"]


def test_assert_quality_flags_violations(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 999.0)], ["id", "v"]
    )
    monitored, obs = with_quality_metrics(df, null_cols=["v"], bound_cols=["v"])
    monitored.count()
    problems = assert_quality(
        obs.get, max_null_rate=0.1, bounds={"v": (0.0, 100.0)}
    )
    assert any("null rate" in p for p in problems)
    assert any("max" in p for p in problems)
    clean = assert_quality(obs.get, max_null_rate=0.5, bounds={"v": (0.0, 1000.0)})
    assert clean == []


def test_token_count_empty_doc_null_ratio(spark):
    """Empty/whitespace-only docs have 0 BPE matches; chars_per_bpe_token
    must be NULL (try_divide), not a DIVIDE_BY_ZERO crash under ANSI."""
    from scala_data_pipeline_spark.ext.textstats import token_count

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "two words")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in token_count(docs).collect()}
    assert rows[0]["n_bpe_tokens"] == 0
    assert rows[0]["chars_per_bpe_token"] is None
    assert rows[1]["chars_per_bpe_token"] is None
    assert rows[2]["n_bpe_tokens"] == 2
    assert rows[2]["chars_per_bpe_token"] is not None


def test_bigram_lm_perplexity_semantics(spark):
    from scala_data_pipeline_spark.ext.textstats import bigram_lm_perplexity

    docs = spark.createDataFrame(
        [
            # templated: one repeated bigram -> near-certain LM -> low ppl
            (0, "a b a b a b a b a b a b a b a b"),
            # same vocab, adversarial order: rare bigrams -> high ppl
            (1, "a a b b a a b b a a b b a a b b"),
            (2, "solo"),  # <2 tokens: no bigrams, absent from output
            (3, ""),  # empty: absent
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in bigram_lm_perplexity(docs).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_bigrams"] == 15 and got[1]["n_bigrams"] == 15
    assert got[0]["perplexity"] < got[1]["perplexity"]
    # perplexity is 2^avg_surprisal (rounded contract)
    assert got[0]["perplexity"] == round(
        2.0 ** got[0]["avg_bigram_surprisal"], 4
    )


def test_quality_features_empty_doc_ansi_safe(spark):
    """Zero-token documents must not throw DIVIDE_BY_ZERO under ANSI
    (round-13 review) — ratios are NULL, score is an explicit 0.0, and
    downstream consumers keep working."""
    from scala_data_pipeline_spark.ext.textstats import quality_features

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "the quick fox")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in quality_features(docs).collect()}
    for d in (0, 1):
        assert rows[d].n_tokens == 0
        assert rows[d].stopword_ratio is None
        assert rows[d].avg_token_len is None
        assert rows[d].quality_score == 0.0
    assert rows[2].quality_score > 0.0


def test_zipf_spectrum_degenerate_corpus(spark):
    """A single-distinct-token corpus yields a NULL slope instead of an
    ANSI DIVIDE_BY_ZERO (round-13 review)."""
    from scala_data_pipeline_spark.ext.textstats import zipf_spectrum

    docs = spark.createDataFrame(
        [(0, "spam spam spam"), (1, "spam")], ["doc_id", "text"]
    )
    row = zipf_spectrum(docs).collect()[0]
    assert row.n_ranks == 1
    assert row.zipf_slope is None


def test_url_decode_urldecoder_parity(spark):
    """Faithful java.net.URLDecoder semantics (round-13 review): '+'
    decodes to space, malformed %-escapes return '' (the reference
    catches the throw), invalid UTF-8 decodes to U+FFFD."""
    from scala_data_pipeline_spark.functions.text import url_decode_pandas

    df = spark.createDataFrame(
        [(0, "hello+world"), (1, "a%20b"), (2, "abc%zz"), (3, "tail%2"),
         (4, "%ff"), (5, None)],
        ["i", "u"],
    )
    got = {
        r.i: r.d
        for r in df.select("i", url_decode_pandas("u").alias("d")).collect()
    }
    assert got == {0: "hello world", 1: "a b", 2: "", 3: "", 4: "�", 5: ""}
