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
