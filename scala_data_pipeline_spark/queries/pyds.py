"""Custom-DataSource query: aggregate over the synthetic source, value-
checked against a DuckDB generate_series twin of the row formula."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_sql
from ..sources import pydatasource

TOTAL_ROWS = 10000


def pydatasource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numPartitions", "8")
        .option("totalRows", str(TOTAL_ROWS))
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("value"), 2).alias("total_value"),
        F.countDistinct("user_bucket").alias("buckets"),
    )


PYDS_ORACLE = f"""
WITH synth AS ({pydatasource.ROW_SQL.format(last=TOTAL_ROWS - 1)})
SELECT event_type,
       COUNT(*) AS cnt,
       {dsum_sql('value', 2)} AS total_value,
       COUNT(DISTINCT user_bucket) AS buckets
FROM synth
GROUP BY event_type
"""


# Round-7 driver rotation: pydatasource_agg (green r1-r6) demoted to an
# extra — the Python DataSource path stays covered by this local oracle
# plus tests/test_pydatasource.py (reader, streaming offsets, writer
# commit protocol); its slot goes to the never-checked
# table_fingerprint (frontier).
QUERIES: dict = {}
ORACLES: dict = {}
EXTRA_QUERIES = {"pydatasource_agg": pydatasource_agg}
EXTRA_ORACLES = {"pydatasource_agg": PYDS_ORACLE}
