"""Parquet schema evolution: the read paths a long-lived 100 TB table
relies on when columns are added over time.

- ``mergeSchema`` read unions the schemas of old and new file
  generations; rows from files lacking a column surface it as null.
- An explicit reader schema (the production pattern — mergeSchema
  footers-scan is expensive at 100 TB) projects old files the same
  way without scanning all footers.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_merge_schema_unions_generations(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = load_table(spark, SF, "nation").select("n_nationkey", "n_name")
    v1.write.parquet(table)
    v2 = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", F.lit("emea").alias("region_tag")
    )
    v2.write.mode("append").parquet(table)

    merged = spark.read.option("mergeSchema", "true").parquet(table)
    assert set(merged.columns) == {"n_nationkey", "n_name", "region_tag"}
    n = v1.count()
    assert merged.count() == 2 * n
    # old-generation rows surface the new column as null
    assert merged.filter(F.col("region_tag").isNull()).count() == n
    assert (
        merged.filter(F.col("region_tag") == "emea").count() == n
    )


def test_explicit_reader_schema_skips_footer_scan(spark, tmp_path):
    table = str(tmp_path / "t")
    load_table(spark, SF, "nation").select("n_nationkey", "n_name").write.parquet(
        table
    )
    load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", F.lit(7).cast("int").alias("v2_col")
    ).write.mode("append").parquet(table)

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("v2_col", IntegerType()),
        ]
    )
    got = spark.read.schema(schema).parquet(table)
    assert got.columns == ["n_nationkey", "n_name", "v2_col"]
    assert got.filter(F.col("v2_col").isNull()).count() > 0
    assert got.filter(F.col("v2_col") == 7).count() > 0
