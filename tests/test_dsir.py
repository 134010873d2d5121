"""DSIR importance resampling (ext/dsir.py): the weights must actually
favor target-like documents, and the Gumbel-top-k selection must be
deterministic. (Cross-engine value parity is covered by the DuckDB
twins in tests/test_oracle_parity.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.dsir import dsir_sample, dsir_weights
from scala_data_pipeline_spark.sources import load_table


def test_weights_favor_target_language(spark, sf_dir):
    """Mean importance weight of the target (en) docs must exceed the
    non-target mean — the defining property of the method (en docs are
    more likely under the en model than under the mixed corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    w = dsir_weights(docs, target=F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), on="doc_id"
    )
    means = {
        r.is_en: r.m
        for r in w.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg(F.col("weight") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_every_tokenized_doc_scored(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = dsir_weights(docs, target=F.col("lang") == "en")
    n_docs_with_tokens = docs.filter(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")) > 0
    ).count()
    assert w.count() == n_docs_with_tokens
    assert w.filter(F.col("n_tokens") <= 0).count() == 0


def test_gumbel_topk_deterministic_and_ordered(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = dsir_sample(docs, target=F.col("lang") == "en", k=20).collect()
    b = dsir_sample(docs, target=F.col("lang") == "en", k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 20
    keys = [r.key for r in a]
    assert keys == sorted(keys, reverse=True)
    # a different salt reshuffles the noise but keeps weights intact
    c = dsir_sample(
        docs, target=F.col("lang") == "en", k=20, salt="other"
    ).collect()
    assert [r.doc_id for r in c] != [r.doc_id for r in a]
    wa = {r.doc_id: r.weight for r in a}
    wc = {r.doc_id: r.weight for r in c}
    for doc_id in wa.keys() & wc.keys():
        assert wa[doc_id] == wc[doc_id]


def test_temperature_flattens_selection(spark, sf_dir):
    """tau -> inf makes the selection pure Gumbel (uniform); the
    overlap between tau=1 and a huge tau should differ unless the
    weights are degenerate, and both remain deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    sharp = {
        r.doc_id
        for r in dsir_sample(docs, F.col("lang") == "en", k=20).collect()
    }
    flat = {
        r.doc_id
        for r in dsir_sample(
            docs, F.col("lang") == "en", k=20, tau=1e9
        ).collect()
    }
    assert len(sharp) == len(flat) == 20
    assert sharp != flat
