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


class _FakeJvmSc:
    def __init__(self, stopped: bool):
        self._stopped = stopped

    def isStopped(self):
        return self._stopped


class _FakeJsc:
    def __init__(self, stopped: bool):
        self._sc = _FakeJvmSc(stopped)

    def sc(self):
        return self._sc


class _FakeCtx:
    def __init__(self, app_id: str, stopped: bool = False):
        self.applicationId = app_id
        self._jsc = _FakeJsc(stopped)


class _FakeSession:
    def __init__(self, app_id: str, stopped: bool = False):
        self.sparkContext = _FakeCtx(app_id, stopped)

    def stop(self):
        self.sparkContext._jsc._sc._stopped = True


class _FakeFrame:
    """A frame whose .sparkSession reports live/stopped like the real
    thing (memoized_checkpoint probes it to scope eviction)."""

    sparkSession: _FakeSession | None = None

    def localCheckpoint(self, eager: bool = True):
        return self


def _builder(session: _FakeSession):
    def build():
        f = _FakeFrame()
        f.sparkSession = session
        return f

    return build


def test_memoized_checkpoint_evicts_stopped_applications():
    from scala_data_pipeline_spark.ext.util import memoized_checkpoint

    cache: dict = {}
    s1 = _FakeSession("app-1")
    a = memoized_checkpoint(cache, s1, "pairs", _builder(s1))
    b = memoized_checkpoint(cache, s1, "core", _builder(s1))
    assert memoized_checkpoint(cache, s1, "pairs", _builder(s1)) is a
    assert set(cache) == {("app-1", "pairs"), ("app-1", "core")}

    # New application after the old session STOPPED: the first insert
    # evicts every dead-application entry — nothing from app-1 stays
    # pinned.
    s1.stop()
    s2 = _FakeSession("app-2")
    c = memoized_checkpoint(cache, s2, "pairs", _builder(s2))
    assert c is not a
    assert set(cache) == {("app-2", "pairs")}
    assert b is not None  # caller-held frames unaffected, only cache


def test_memoized_checkpoint_keeps_concurrent_live_sessions():
    """Advisor r15: two concurrently LIVE sessions sharing the
    module-level cache must not evict each other's hubs on every
    cross-session miss (that silently rebuilt hubs each time)."""
    from scala_data_pipeline_spark.ext.util import memoized_checkpoint

    cache: dict = {}
    s1 = _FakeSession("app-1")
    s2 = _FakeSession("app-2")
    a = memoized_checkpoint(cache, s1, "pairs", _builder(s1))
    c = memoized_checkpoint(cache, s2, "pairs", _builder(s2))
    # Both live -> both cached; s1's hub survives s2's insert...
    assert set(cache) == {("app-1", "pairs"), ("app-2", "pairs")}
    # ...and is served warm on the next s1 call (no rebuild thrash).
    assert memoized_checkpoint(cache, s1, "pairs", _builder(s1)) is a
    assert memoized_checkpoint(cache, s2, "pairs", _builder(s2)) is c
    # A frame whose JVM handle is already torn down counts as stopped.
    s2.sparkContext._jsc = None
    s3 = _FakeSession("app-3")
    memoized_checkpoint(cache, s3, "pairs", _builder(s3))
    assert ("app-2", "pairs") not in cache
    assert ("app-1", "pairs") in cache


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
