"""Physical-plan inspection: the feedback loop for the 100 TB posture.

``plan_audit`` extracts the signals that matter at scale from
``explain("formatted")`` output:

- exchanges (shuffles) — every one is a full network+disk pass at scale;
- broadcast joins vs sort-merge joins — dimension joins must broadcast;
- pushed filters / read schema on parquet scans — a scan without
  PushedFilters/narrow ReadSchema reads the whole table;
- whole-stage codegen coverage — Python UDFs puncture it.

Used by tests/test_plans.py to LOCK the plan shape of headline queries:
a regression that adds a shuffle or loses pushdown fails CI, not the
100 TB run.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_audit(df: DataFrame) -> dict:
    plan = explain_str(df)
    simple = explain_str(df, mode="simple")
    # Formatted mode numbers nodes as "(N) Exchange"; a bare Exchange is a
    # shuffle, BroadcastExchange is not. Simple mode marks codegen with
    # "*(id)".
    return {
        "n_shuffle_exchanges": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sortmerge_joins": plan.count("SortMergeJoin"),
        # Row-at-a-time UDFs, Arrow-vectorized UDFs, AND the grouped/
        # iterator Pandas operators (applyInPandas → FlatMapGroupsInPandas,
        # mapInPandas → MapInPandas) — an audit that misses the latter two
        # under-reports Python on the hot path.
        "n_python_udfs": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas"),
        "has_partial_agg": "partial_" in plan,
        "has_pushed_filters": "PushedFilters: [" in plan
        and not re.search(r"PushedFilters: \[\]", plan),
        "scan_schemas": re.findall(r"ReadSchema: (struct<[^\n]*)", plan),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "plan": plan,
    }
