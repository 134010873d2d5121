"""SparkSession factory.

The reference pins ``spark.sql.session.timeZone=UTC`` in 5 of 7 modules
(e.g. filter/filter.scala:19, features/features.scala:16); we pin it
globally — it is also required for DuckDB-oracle determinism (DuckDB
timestamps are UTC-naive).

Scale posture: AQE on (runtime coalescing + skew-join splitting), shuffle
partitions sized to the local core count for tests, but overridable via
``SPARK_GRAFT_CPUS`` / explicit args for cluster runs. At 100 TB the same
code runs with ``spark.sql.shuffle.partitions`` in the thousands and AQE
coalesces the tail — nothing in the operator layer assumes a partition
count.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(
    app_name: str = "scala_data_pipeline_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults are tuned for the local[N] test harness; on a real cluster
    pass ``master=None`` with a pre-set master and bump
    ``shuffle_partitions`` to ~2-3× total executor cores.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else cores),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The users×items pivot family plans ~200-column aggregates and
        # expands; the default codegen cutoff (maxFields=100) silently
        # drops those stages to interpreted row-at-a-time evaluation —
        # measured 1.5x on unpivot_matrix_long at sf0.1. 300 keeps the
        # engine's widest matrices inside whole-stage codegen while
        # staying far below JIT method-size trouble (Spark splits
        # generated methods; the hugeMethodLimit fallback still guards).
        .config("spark.sql.codegen.maxFields", "300")
        # PySpark 4's DataFrame-debugging origin capture wraps EVERY
        # DataFrame/Column API call with call-site bookkeeping that
        # costs ~4 py4j round-trips per call (getActiveSession + a
        # stackTracesInDataFrameContext conf read + origin set/clear) —
        # profiled at 0.5-1 s of pure query-CONSTRUCTION time on the
        # expression-heavy similarity/dedup builders (r20, guide §4
        # "the Python boundary" applied to the driver process itself).
        # The engine's error surface is the oracle harness, not
        # call-site decoration, so turn it off; errors still carry the
        # full JVM stack, only the "called from user code line N"
        # annotation is lost.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Embedded Derby (JDBC tests) writes derby.log to
        # derby.system.home, which defaults to the CWD — point it at a
        # temp dir so runs leave no droppings at the repo root.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={tempfile.gettempdir()}",
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" in os.environ:
        # Use the variable's VALUE (round-13 review: it was consulted
        # only as a presence flag, so `SPARK_MASTER=spark://... python
        # job.py` crashed with "A master URL must be set").
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(f"local[{cores}]")
        # Single-JVM local mode: driver memory is the only knob.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
