"""Streaming upsert into a JDBC store via foreachBatch — the live,
jar-free twin of the reference's streaming external-store sinks
(dashboard.scala:46-60 streams aggregates into Elasticsearch; the
ES/Cassandra jars are absent here, but embedded Derby executes the
identical PATTERN for real: idempotent per-micro-batch upsert keyed on
the aggregate's group columns).

Pattern (the canonical "exactly-once-ish" JDBC sink for update-mode
aggregations):

1. Stage the micro-batch into a staging table (Spark JDBC overwrite —
   parallel executor writes).
2. On the driver, one transaction: DELETE target rows whose keys appear
   in staging, INSERT staging. Re-running the same batch (checkpoint
   replay after failure) converges to the same state — the sink is
   idempotent per key, which together with checkpointing gives
   effectively-once results.

At scale the staging write is the parallel part (executors stream rows
into the store); the delete+insert is a key-indexed server-side
operation. For stores with native MERGE (Postgres 15+, Derby 10.11+)
the two statements collapse into one; delete+insert is the portable
form.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sources.connectors import jdbc_writer

# Derby's VARCHAR ceiling; CLOB keys are cast to this for comparison.
# Keys longer than this are a schema-design error for an upsert key —
# the cast would raise a 22001 truncation error mid-batch.
_KEY_VARCHAR_MAX = 32672


def _raw_connection(spark: SparkSession, url: str, user: str, password: str):
    return spark._jvm.java.sql.DriverManager.getConnection(url, user, password)


def jdbc_upsert_sink(
    spark: SparkSession,
    url: str,
    target: str,
    key_cols: tuple[str, ...],
    user: str,
    password: str,
    driver: str,
    staging: str | None = None,
):
    """Returns a ``foreachBatch`` function upserting each micro-batch
    into ``target`` keyed on ``key_cols``.

    The default staging table name carries a per-sink random suffix so
    two queries upserting into the SAME target cannot clobber each
    other's staging rows mid-batch; pass ``staging`` explicitly to pin
    a stable name (single-writer deployments that want restart reuse).
    """
    staging = staging or f"{target}_staging_{uuid.uuid4().hex[:8]}"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        jdbc_writer(
            batch_df, url, staging, user=user, password=password,
            mode="overwrite", driver=driver,
        ).save()
        conn = _raw_connection(spark, url, user, password)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            try:
                st.executeUpdate(
                    f"CREATE TABLE {target} AS SELECT * FROM {staging}"
                    " WITH NO DATA"
                )
            except Exception:
                conn.rollback()  # table exists — clear the failed DDL
            # Spark's JDBC writer quotes column identifiers (they stay
            # lowercase in Derby — unquoted names would be uppercased
            # and miss) and maps StringType to CLOB, which Derby cannot
            # compare directly — cast key columns to VARCHAR at Derby's
            # maximum length so long keys compare instead of raising a
            # 22001 truncation error.
            pred = " AND ".join(
                f'CAST(t."{k}" AS VARCHAR({_KEY_VARCHAR_MAX})) ='
                f' CAST(s."{k}" AS VARCHAR({_KEY_VARCHAR_MAX}))'
                for k in key_cols
            )
            st.executeUpdate(
                f"DELETE FROM {target} t WHERE EXISTS "
                f"(SELECT 1 FROM {staging} s WHERE {pred})"
            )
            st.executeUpdate(f"INSERT INTO {target} SELECT * FROM {staging}")
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return upsert
