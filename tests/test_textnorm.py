"""ext/textnorm.py: the ingestion cleaning chain and the NFKC lane."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.ext.textnorm import (
    clean_text,
    clean_text_col,
    nfkc_normalize,
)


def test_clean_chain_on_constructed_dirt(spark):
    cases = [
        # control chars stripped, ws collapsed
        ("a\x00b\x07c  d\t\ne", "abc d e"),
        # zero-width + BOM stripped
        ("z\u200bw\u200c\u200d\ufeffq", "zwq"),
        # typographic unification
        (
            "\u201cq\u201d \u2018s\u2019 \u2013 \u2014",
            "\"q\" 's' - -",
        ),
        # NBSP becomes a space and collapses with neighbors
        ("a\u00a0 b", "a b"),
        ("  padded  ", "padded"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], "i int, text string"
    ).select("i", clean_text_col(F.col("text")).alias("c"))
    got = {r["i"]: r["c"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_clean_text_counts(spark):
    df = spark.createDataFrame([(1, "a\x07b  c")], "doc_id int, text string")
    row = clean_text(df).first()
    assert row["text_clean"] == "ab c"
    assert row["n_chars_text_clean"] == 4


def test_clean_is_idempotent(spark, sf_dir):
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    once = clean_text(docs).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    twice = clean_text(once).select("doc_id", "text_clean")
    joined = once.join(twice, "doc_id")
    assert joined.filter(F.col("text") != F.col("text_clean")).count() == 0


def test_nfkc_lane(spark):
    df = spark.createDataFrame(
        [(1, "\ufb01ne \uff21scii \u00bd"), (2, "plain"), (3, None)],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["text_nfkc"] for r in nfkc_normalize(df).collect()
    }
    assert got[1] == "fine Ascii 1\u20442"
    assert got[2] == "plain"
    assert got[3] is None


def test_clean_plan_stays_jvm(spark, sf_dir):
    """The chain must fuse into codegen with zero Python operators."""
    from scala_data_pipeline_spark.sources import load_table

    df = clean_text(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
