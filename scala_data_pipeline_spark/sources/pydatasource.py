"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's connector surface (Cassandra/ES/JDBC, SURVEY.md §2.1)
needs vendor jars; Spark 4's Python DataSource API is the jar-free way
to add sources — this module provides a deterministic synthetic event
source exercising the full API surface:

- **batch reader** with explicit input partitions (parallel, each
  partition generates its deterministic id range);
- **streaming reader** with offset tracking (micro-batches of
  ``rowsPerBatch`` rows, resumable from any committed offset).

Rows are a pure function of the row id, so a DuckDB ``generate_series``
oracle can value-check the source end-to-end — the same external-oracle
pattern used for every other operator.

Scale notes: partitions() controls read parallelism exactly like a real
connector's split planning; generation is per-partition with no driver
involvement — the pattern to copy for any custom feed (an internal
service API, a proprietary format) at cluster scale.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


ROW_SQL = (
    "SELECT i AS event_id, i % 100 AS user_bucket, "
    "(CASE i % 5 WHEN 0 THEN 'click' WHEN 1 THEN 'error' WHEN 2 THEN 'purchase' "
    "WHEN 3 THEN 'signup' ELSE 'view' END) AS event_type, "
    "CAST((i * 37) % 10000 AS DOUBLE) / 100.0 AS value "
    "FROM generate_series(0, {last}) t(i)"
)

SCHEMA = "event_id BIGINT, user_bucket BIGINT, event_type STRING, value DOUBLE"

_ARROW_CHUNK = 65536


def _arrow_batches(start: int, end: int):
    """Vectorized row generation: yield pyarrow RecordBatches (the Python
    DataSource fast path — one Arrow transfer per chunk instead of
    per-row tuple pickling). Must stay in sync with _row / ROW_SQL."""
    import numpy as np
    import pyarrow as pa

    for lo in range(start, end, _ARROW_CHUNK):
        ids = np.arange(lo, min(lo + _ARROW_CHUNK, end), dtype=np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids),
                pa.array(ids % 100),
                pa.array(np.asarray(EVENT_TYPES, dtype=object)[ids % 5]),
                pa.array((ids * 37) % 10000 / 100.0),
            ],
            names=["event_id", "user_bucket", "event_type", "value"],
        )


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_parts = int(options.get("numpartitions", "8"))
        self.total_rows = int(options.get("totalrows", "1000"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        # contiguous id range per partition; last partition takes the tail
        per = self.total_rows // self.n_parts
        start = partition.value * per
        end = self.total_rows if partition.value == self.n_parts - 1 else start + per
        yield from _arrow_batches(start, end)


class _StreamReader(DataSourceStreamReader):
    """Offset = next unread row id. ``rowsPerBatch`` sizes the INPUT
    PARTITIONS inside a planned batch; ``maxRowsPerTrigger`` (optional)
    is ADMISSION CONTROL — it bounds how far latestOffset advances per
    trigger, the Kafka ``maxOffsetsPerTrigger`` analogue (round-13
    review finding: without it, the whole source landed in micro-batch
    0, and a large totalRows built one InputPartition object per
    rowsPerBatch chunk on the driver and committed everything
    atomically). Unset, latestOffset exposes everything — which is
    what availableNow needs: it snapshots latestOffset ONCE at query
    start, so an unconditionally rate-limited offset would strand all
    but the first window."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", "100"))
        self.total_rows = int(options.get("totalrows", "1000"))
        mrt = options.get("maxrowspertrigger")
        self.max_rows_per_trigger = int(mrt) if mrt is not None else None

    def initialOffset(self):
        self._planned = 0
        return {"next": 0}

    def latestOffset(self):
        if self.max_rows_per_trigger is None:
            return {"next": self.total_rows}
        # Admission control is clamped to the highest batch-start ever
        # planned (_high_water, fed by partitions()): on a checkpoint
        # restore, Spark 4.1 calls partitions() BEFORE the first
        # latestOffset() — observed sequence (instrumented run, offset
        # log ends at 400 with batch (300,400] uncommitted):
        #   partitions({'next':400}, {'next':400})   # offset-log seed
        #   partitions({'next':300}, {'next':400})   # replay the batch
        #   latestOffset -> {'next':500}
        # The seed call pins _high_water to the offset-log end, so the
        # first latestOffset resumes from the checkpointed position
        # instead of regressing to min(mrt, total). NOTE the replayed
        # batch legitimately starts BELOW the high-water — uncommitted
        # rows must be re-emitted — which is why partitions() clamps
        # against the COMMITTED floor, never the high-water (the
        # round-14-suggested high-water clamp drops the replay: probed
        # 400/500 rows delivered).
        base = max(
            getattr(self, "_planned", 0), getattr(self, "_high_water", 0)
        )
        nxt = min(base + self.max_rows_per_trigger, self.total_rows)
        self._planned = nxt
        return {"next": nxt}

    def partitions(self, start, end):
        lo, hi = start["next"], min(end["next"], self.total_rows)
        # High-water mark of planned batch starts — the restore-time
        # floor for latestOffset (see above).
        self._high_water = max(getattr(self, "_high_water", 0), lo)
        # Duplicate guard (advisor round-14, amended): if an engine
        # ever planned a batch overlapping rows this INSTANCE already
        # saw committed, emit only the uncommitted suffix. The floor
        # is the committed offset — NOT the high-water, because the
        # restore replay of an uncommitted batch legitimately starts
        # below the high-water seed and must re-emit in full (a fresh
        # restore instance has _committed == 0, so replays pass).
        lo = max(lo, getattr(self, "_committed", 0))
        out, cur = [], lo
        while cur < hi:
            step = min(self.rows_per_batch, hi - cur)
            out.append(InputPartition((cur, cur + step)))
            cur += step
        return out or [InputPartition((lo, lo))]

    def read(self, partition):
        lo, hi = partition.value
        yield from _arrow_batches(lo, hi)

    def commit(self, end):
        # Re-seed the admission control after a checkpoint restore: the
        # first rate-limited latestOffset on a restarted stream must
        # continue from the committed offset, not from 0. _committed is
        # the partitions() duplicate-guard floor: rows below it were
        # durably handed to the sink by THIS instance.
        self._planned = max(getattr(self, "_planned", 0), end["next"])
        self._committed = max(getattr(self, "_committed", 0), end["next"])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# --------------------------------------------------------------------
# Python DataSource WRITER: jar-free JSONL sink with 2-phase commit
# --------------------------------------------------------------------

import json
import os
import uuid


class _JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Per-task write -> driver-side commit, the connector contract a
    real sink (service API, proprietary store) must implement:

    - each task writes to a UNIQUE temp-named file and reports it in
      its commit message (no cross-task coordination, retries can't
      collide);
    - ``commit`` runs once on the driver with every successful task's
      message and publishes the manifest (_SUCCESS with the file list
      + row counts) — readers treat manifest-less files as garbage;
    - ``abort`` removes whatever the failed attempt left behind.

    Exactly the Hadoop output-committer protocol, expressed through
    the Python API; at scale the temp-file + manifest dance is what
    makes speculative retries and task failures safe.
    """

    def __init__(self, options, overwrite: bool = False):
        self.path = options.get("path")
        self.overwrite = overwrite
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator):
        # Tasks write to a dot-prefixed TEMP name; only commit() renames
        # to the final part-*.jsonl. A task that dies without returning
        # a commit message therefore never leaves a file that a
        # part-glob reader (or a retry of the same task) could confuse
        # with committed output — the rename is the publish step, like
        # Hadoop's output committer.
        os.makedirs(self.path, exist_ok=True)
        fname = os.path.join(self.path, f".part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommitMessage(fname, n)

    @staticmethod
    def _final_name(tmp_path: str) -> str:
        base = os.path.basename(tmp_path)
        return os.path.join(
            os.path.dirname(tmp_path),
            base.removeprefix(".").removesuffix(".tmp"),
        )

    def commit(self, messages):
        # Honor the save mode (round-13 review finding: append
        # clobbered the manifest — prior files became "garbage" per the
        # manifest contract — and overwrite never removed old files, so
        # glob readers double-counted).
        manifest_path = os.path.join(self.path, "_SUCCESS")
        prior: list[dict] = []
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prior = json.load(fh).get("files", [])
        finals = []
        for m in sorted(messages, key=lambda m: m.path):
            final = self._final_name(m.path)
            os.replace(m.path, final)
            finals.append({"path": final, "n_rows": m.n_rows})
        all_files = prior + finals
        manifest = {
            "files": all_files,
            "total_rows": sum(f["n_rows"] for f in all_files),
        }
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)
        if self.overwrite:
            # Stale-file sweep AFTER the new manifest is durable: a
            # crash mid-sweep leaves extra files on disk but a correct
            # manifest, so manifest readers never see a half-state.
            keep = {f["path"] for f in finals}
            import glob as _glob

            for p in _glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if p not in keep:
                    os.remove(p)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite):
        return _JsonlWriter(self.options, overwrite=overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
