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

    The default staging table is the STABLE ``{target}_staging`` —
    restarts reuse (overwrite) it instead of minting a fresh
    uuid-suffixed table per sink construction, which orphaned one
    abandoned staging table per stream restart forever (round-13
    review finding). The single-writer-per-target rule this implies is
    the same one the delete+insert transaction already requires; TWO
    queries upserting into the same target must pass distinct
    ``staging`` names explicitly.
    """
    staging = staging or f"{target}_staging"

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
            except Exception as exc:
                conn.rollback()  # clear the failed DDL
                # ONLY "already exists" may continue (Derby SQLState
                # X0Y32); lock timeouts, dropped connections, and auth
                # failures must propagate — swallowing them proceeded
                # into DELETE on a poisoned connection and surfaced an
                # unrelated error (round-13 review finding).
                je = getattr(exc, "java_exception", None)
                sqlstate = (
                    je.getSQLState()
                    if je is not None and hasattr(je, "getSQLState")
                    else None
                )
                if sqlstate != "X0Y32":
                    raise
            # Spark's JDBC writer quotes column identifiers (they stay
            # lowercase in Derby — unquoted names would be uppercased
            # and miss) and maps StringType to CLOB, which Derby cannot
            # compare directly — cast key columns to VARCHAR at Derby's
            # maximum length so long keys compare instead of raising a
            # 22001 truncation error.
            # Null-safe key compare: plain equality is UNKNOWN for
            # NULL = NULL, so a NULL-key group row (nullable aggregate
            # key) would never match — every update-mode re-emission
            # then INSERTs another copy and the per-key idempotency
            # claim breaks (round-13 review finding).
            pred = " AND ".join(
                f'(CAST(t."{k}" AS VARCHAR({_KEY_VARCHAR_MAX})) ='
                f' CAST(s."{k}" AS VARCHAR({_KEY_VARCHAR_MAX}))'
                f' OR (t."{k}" IS NULL AND s."{k}" IS NULL))'
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
