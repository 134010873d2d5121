"""Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN): scalar and
table-valued — pure-SQL reusable logic, fully Catalyst-inlined (no
Python worker, unlike @udf)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.sources import load_table


def test_scalar_sql_udf_matches_dataframe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udf")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION ws_tokens(s STRING)
           RETURNS INT RETURN size(filter(split(s, ' '), t -> t <> ''))"""
    )
    got = spark.sql(
        "SELECT doc_id, ws_tokens(text) AS n FROM docs_udf"
    ).collect()
    want = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_table_valued_sql_udf(spark, sf_dir):
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_udf")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION nations_of(rk BIGINT)
           RETURNS TABLE(n_name STRING)
           RETURN SELECT n_name FROM nation_udf WHERE n_regionkey = rk"""
    )
    got = spark.sql("SELECT * FROM nations_of(1) ORDER BY n_name").collect()
    want = (
        spark.table("nation_udf")
        .filter(F.col("n_regionkey") == 1)
        .select("n_name")
        .orderBy("n_name")
        .collect()
    )
    assert [r["n_name"] for r in got] == [r["n_name"] for r in want]
    assert len(got) > 0


def test_arrow_udf_vectorized_path(spark, sf_dir):
    """Spark 4.1 @arrow_udf: Arrow-native vectorized UDF (columnar in,
    columnar out — no pandas conversion). The documented Python fast
    path when a computation genuinely can't stay JVM-side; here it
    mirrors the JVM token count to prove the wiring."""
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("int")
    def tok_count(texts):
        return pc.list_value_length(pc.split_pattern(texts, " "))

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = docs.select("doc_id", tok_count("text").alias("n")).collect()
    want = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
