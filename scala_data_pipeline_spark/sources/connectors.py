"""External-store connector builders (SURVEY.md §2.1 S1-S3, S8, S13).

The reference reads Cassandra / Elasticsearch / PostgreSQL and writes
PostgreSQL / Elasticsearch. The connector jars (spark-cassandra-
connector, elasticsearch-hadoop, a JDBC driver) are not bundled in this
container, so these builders produce fully-configured readers/writers —
option-compatible with the reference — and are exercised for option
plumbing only; with the jars on the classpath they run unchanged.
Exception: the JDBC pair (S3/S8) IS executed live — Spark bundles
embedded Derby, and tests/test_jdbc_roundtrip.py does a real
write → read-back → compare through these builders.

S9 (the raw ``GRANT SELECT`` JDBC side-channel, data_mart.scala:149-151)
is deliberately NOT a Spark op — issue it from driver code with any
Python PG client after the write completes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def cassandra_reader(
    spark: SparkSession, keyspace: str, table: str, consistency: str = "ONE"
):
    """S1 (data_mart.scala:46-55). Requires spark-cassandra-connector.

    Consistency rides as a PER-READ option, not a session conf
    (round-13 review: a session-global set meant the last-built
    reader's consistency silently applied to every other lazy reader
    in the session — the connector accepts it per-DataFrame)."""
    return (
        spark.read.format("org.apache.spark.sql.cassandra")
        .options(keyspace=keyspace, table=table)
        .option("spark.cassandra.input.consistency.level", consistency)
    )


def elasticsearch_reader(
    spark: SparkSession,
    resource: str,
    nodes: str,
    port: int = 9200,
    wan_only: bool = True,
    read_metadata: bool = True,
):
    """S2 (data_mart.scala:67-75). Requires elasticsearch-hadoop."""
    return (
        spark.read.format("es")
        .option("es.nodes", nodes)
        .option("es.port", str(port))
        .option("es.nodes.wan.only", str(wan_only).lower())
        .option("es.read.metadata", str(read_metadata).lower())
        .option("es.resource", resource)
    )


def jdbc_reader(
    spark: SparkSession,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
):
    """S3 (data_mart.scala:78-85)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )


def jdbc_writer(
    df: DataFrame,
    url: str,
    dbtable: str,
    user: str,
    password: str,
    mode: str = "overwrite",
    driver: str = "org.postgresql.Driver",
):
    """S8 (data_mart.scala:138-146)."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .mode(mode)
    )


def elasticsearch_writer(
    df: DataFrame,
    resource: str,
    nodes: str,
    port: int = 9200,
    user: str | None = None,
    password: str | None = None,
):
    """S13 (dashboard.scala:46-60)."""
    w = (
        df.write.format("es")
        .option("es.nodes", nodes)
        .option("es.port", str(port))
        .option("es.resource", resource)
        .mode("append")
    )
    if user:
        w = w.option("es.net.http.auth.user", user)
    if password:
        w = w.option("es.net.http.auth.pass", password)
    return w
