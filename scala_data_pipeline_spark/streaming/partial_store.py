"""Shared contract for the streaming partial stores (rollup / drift /
HDR / inverted-index / CDC / heavy-hitters / dedup / fingerprint).

Every store is a directory of immutable parquet *partials* that readers
merge on read. The one write-path rule this module enforces is
**per-batch-id overwrite**: a ``foreachBatch`` sink writes its partials
into ``batch-{batch_id}/`` with ``mode("overwrite")`` instead of
appending files to the store root. foreachBatch delivery is
at-least-once — a crash between the parquet write and the streaming
checkpoint commit replays the SAME batch id — and for the additive
grains these stores hold (long/decimal sums, tf counts, SpaceSaving
est/err) a replayed ``mode("append")`` write double-counts the batch.
Keying the write by batch id makes the retry rewrite the same subdir:
idempotent, no coordination, still append-only at the STORE level
(subdirs are only ever created or atomically replaced, never edited).

The dedup digest store (streaming/dedup_sink.py) shipped this design
first; this module is the round-11 retrofit of the same rule across
the older stores, which previously appended to the root.

Readers use ``read_partials`` (recursive file lookup) so stores with
batch subdirs, pre-retrofit flat files, or a compacted top-level
segment all read identically — layout is invisible to the merge plan.

At 100 TB none of this changes the scaling story: partials stay tiny
relative to raw data, the store is object-store friendly (immutable
files, no read-modify-write), and compaction remains the same
read → merge → overwrite plan run offline. One compaction constraint
follows from per-batch keying: compact only while the stream is
STOPPED AFTER A CLEAN COMMIT — compacting an uncommitted batch's
subdir away and then replaying that batch id would re-add its
partials alongside the compacted copy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def per_batch_writer(
    target_dir: str, partials_fn: Callable[[DataFrame], DataFrame]
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that writes
    ``partials_fn(batch_df)`` into ``{target_dir}/batch-{batch_id}``
    with overwrite semantics (retry-idempotent, see module docstring)."""

    def write_partials(batch_df: DataFrame, batch_id: int) -> None:
        partials_fn(batch_df).write.mode("overwrite").parquet(
            f"{target_dir}/batch-{batch_id}"
        )

    return write_partials


def read_partials(
    spark: SparkSession,
    target_dir: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """All partial files under the store, whatever the layout (batch
    subdirs, legacy flat files, compacted segment). With ``schema``,
    an absent or not-yet-written store reads as EMPTY — the realistic
    startup state for a serving query racing the stream's first
    commit; without a schema an absent store raises (nothing to infer
    from)."""
    reader = spark.read.option("recursiveFileLookup", "true")
    if schema is not None:
        reader = reader.schema(schema)
        try:
            return reader.parquet(target_dir)
        except AnalysisException as exc:
            # ONLY a not-yet-written store reads as empty. IO errors,
            # permission failures, and corrupt footers must propagate —
            # a bare catch here made a broken store indistinguishable
            # from an empty one (advisor round-11).
            if (exc.getCondition() or "") == "PATH_NOT_FOUND":
                return spark.createDataFrame([], schema)
            raise
    return reader.parquet(target_dir)
