"""Sink layouts: partitioned pruning and bucketed shuffle-free joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_data_pipeline_spark.plans import plan_audit
from scala_data_pipeline_spark.sources import load_table
from scala_data_pipeline_spark.sources.sinks import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "p_date", F.date_format("ts", "yyyyMMdd")
    )
    out = str(tmp_path / "events_part")
    write_partitioned(events, out, ["p_date"], files_per_partition=1)
    back = spark.read.parquet(out)
    one_day = back.filter(F.col("p_date") == "20240115")
    plan = plan_audit(one_day)["plan"]
    # partition pruning: the scan location narrows to the matching dir
    assert one_day.count() == events.filter(F.col("p_date") == "20240115").count()
    assert "PartitionFilters" in plan


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    left = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    right = events.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.count(F.lit(1)).alias("n_buys"))
    write_bucketed(left, "t_left", "user_id", 4)
    write_bucketed(right, "t_right", "user_id", 4)
    joined = read_bucketed(spark, "t_left").join(
        read_bucketed(spark, "t_right"), on="user_id"
    )
    audit = plan_audit(joined)
    # bucketed-on-same-key join: zero shuffle exchanges in the plan
    assert audit["n_shuffle_exchanges"] == 0, audit["plan"]
    assert joined.count() == right.count()
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_csv_orc_text_roundtrips(spark, sf_dir, tmp_path):
    """Format coverage beyond parquet/JSON: CSV (header + explicit
    schema on read — never inferSchema at scale), ORC (columnar
    alternative, predicate pushdown intact), and line-delimited text."""
    nation = load_table(spark, sf_dir, "nation")
    # CSV
    csv_path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(csv_path)
    back_csv = (
        spark.read.schema(nation.schema).option("header", True).csv(csv_path)
    )
    assert sorted(map(tuple, back_csv.collect())) == sorted(
        map(tuple, nation.collect())
    )
    # ORC with a pushed filter
    orc_path = str(tmp_path / "nation_orc")
    nation.write.mode("overwrite").orc(orc_path)
    back_orc = spark.read.orc(orc_path).filter(F.col("n_regionkey") == 1)
    a = plan_audit(back_orc)
    assert a["has_pushed_filters"], "ORC scan lost predicate pushdown"
    assert back_orc.count() == nation.filter(F.col("n_regionkey") == 1).count()
    # text (one line per row)
    txt_path = str(tmp_path / "nation_txt")
    nation.select(F.col("n_name").alias("value")).write.mode("overwrite").text(
        txt_path
    )
    assert spark.read.text(txt_path).count() == nation.count()


def test_parquet_schema_evolution_mergeschema(spark, sf_dir, tmp_path):
    """Data-lake schema evolution: v2 files add a column; mergeSchema
    reads the union schema with nulls for v1 rows, and readers pinned
    to the v1 schema still work unchanged against mixed files."""
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "evolving")
    nation.write.mode("overwrite").parquet(path)
    nation.withColumn("n_score", F.col("n_nationkey") * 2).write.mode(
        "append"
    ).parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "n_score" in merged.columns
    assert merged.count() == 2 * nation.count()
    # v1 rows surface NULL for the new column; v2 rows carry values
    assert merged.filter(F.col("n_score").isNull()).count() == nation.count()
    # a v1-schema reader is unaffected by the new files
    v1 = spark.read.schema(nation.schema).parquet(path)
    assert v1.count() == 2 * nation.count()
    assert "n_score" not in v1.columns


def test_union_by_name_schema_drift(spark):
    """Multi-source ingestion with drifting schemas: unionByName with
    allowMissingColumns nulls the gaps instead of mispositioning
    columns (positional union would silently scramble)."""
    v1 = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    v2 = spark.createDataFrame(
        [(2, "b", "en")], ["doc_id", "text", "lang"]
    )
    # note v2's columns also arrive in a different order
    v2 = v2.select("lang", "doc_id", "text")
    merged = v1.unionByName(v2, allowMissingColumns=True)
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[1]["lang"] is None and rows[1]["text"] == "a"
    assert rows[2]["lang"] == "en" and rows[2]["text"] == "b"


def test_files_per_partition_splits_hot_value(spark, tmp_path):
    """files_per_partition must yield MULTIPLE files for a hot
    partition value (round-13 review: the old repartition(n, cols)
    put a value's every row in one task — one giant file)."""
    import glob

    from scala_data_pipeline_spark.sources.sinks import write_partitioned

    df = spark.range(10000).selectExpr("id", "'hot' AS day")
    out = str(tmp_path / "p")
    # Disable AQE small-partition coalescing for the assertion: at toy
    # size AQE (correctly) merges the salted splits back below the
    # advisory size — a genuinely hot multi-GB value would not coalesce.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        write_partitioned(df, out, ["day"], files_per_partition=4)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
    files = glob.glob(f"{out}/day=hot/part-*")
    assert 2 <= len(files) <= 4, files
    assert spark.read.parquet(out).count() == 10000
