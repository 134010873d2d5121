"""Regression tests for the round-14 advisor findings (ADVICE.md):

1. bench.py's warm-rep/memoized-hub semantics must be recorded in the
   artifact itself (metric suffix + memoized query list) so totals are
   never compared 1:1 against pre-warm rounds.
2. The Python DataSource's partitions() must never re-emit rows this
   instance already saw committed — but must NOT clamp the restore
   replay of an uncommitted batch (covered in test_r13_advice.py,
   amended: the advisor-suggested high-water clamp dropped the replay
   on a real engine probe).
3. memoized_checkpoint must evict entries of stopped applications on
   insert instead of pinning dead DataFrame objects forever.
"""

from __future__ import annotations


class _FakeCtx:
    def __init__(self, app_id: str):
        self.applicationId = app_id


class _FakeSession:
    def __init__(self, app_id: str):
        self.sparkContext = _FakeCtx(app_id)


class _FakeFrame:
    def localCheckpoint(self, eager: bool = True):
        return self


def test_memoized_checkpoint_evicts_stopped_applications():
    from scala_data_pipeline_spark.ext.util import memoized_checkpoint

    cache: dict = {}
    s1 = _FakeSession("app-1")
    a = memoized_checkpoint(cache, s1, "pairs", _FakeFrame)
    b = memoized_checkpoint(cache, s1, "core", _FakeFrame)
    assert memoized_checkpoint(cache, s1, "pairs", _FakeFrame) is a
    assert set(cache) == {("app-1", "pairs"), ("app-1", "core")}

    # New application (old session stopped): the first insert evicts
    # every dead-application entry — nothing from app-1 stays pinned.
    s2 = _FakeSession("app-2")
    c = memoized_checkpoint(cache, s2, "pairs", _FakeFrame)
    assert c is not a
    assert set(cache) == {("app-2", "pairs")}
    assert b is not None  # caller-held frames unaffected, only cache


def test_bench_records_warm_semantics():
    """The bench artifact must self-describe the r14 semantics change
    (warm rep + memoized hubs) so round-over-round totals are
    attributable (round-14 advisor, medium)."""
    import bench

    assert bench.METRIC.endswith("_warm")
    assert bench.MEMO_HUB_NAMES  # hub list non-empty

    from scala_data_pipeline_spark.queries import all_queries

    from scala_data_pipeline_spark.queries import extra_queries

    memoized = bench.memoized_consumers(all_queries())
    assert memoized == sorted(memoized)
    assert set(memoized) <= set(all_queries())
    # Known fixed points: dedup_components consumes the _lsh_pairs hub
    # (queries/ext_dedup.py) and dedup_exact consumes none.
    everything = dict(all_queries(), **extra_queries())
    names = bench.memoized_consumers(everything)
    assert "dedup_components" in names
    assert "dedup_exact" not in names
