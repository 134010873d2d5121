"""scala_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``dlomakov/scala_data_pipeline`` (a 7-module Scala Spark 2.4 pipeline),
re-expressed as idiomatic PySpark (DataFrame / SQL / Catalyst /
Structured Streaming) and extended with the operators a large-scale
(100 TB) training-data pipeline needs: deduplication, similarity search,
multimodal columns, and text analysis.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, scale-aware shuffle conf)
- ``sources``    : source/sink wrappers (parquet/json/jdbc/kafka/es builders)
- ``operators``  : relational / aggregation / window / matrix operators
- ``functions``  : scalar function groups (text/url, time, json)
- ``plans``      : plan inspection helpers (explain capture, shuffle audit)
- ``streaming``  : structured-streaming builders (windowed aggs, kafka I/O)
- ``ml``         : ML pipeline build/train/save/load/infer
- ``ext``        : LLM-data-pipeline extensions (dedup, similarity,
                   text analysis, multimodal)

Every public operator is a pure DataFrame->DataFrame function: Catalyst
owns execution; nothing here schedules work by hand.
"""

__version__ = "0.1.0"
