"""Dump ``explain("formatted")`` for every declared driver query to
``plans/r{N}/<query>_<tag>.txt`` — the before/after plan evidence the
optimization rounds commit alongside code changes.

Run:  ROUND=20 python scripts/dump_plans.py before [sf_dir]

Plan capture is analysis-time for most queries, but a few builders run
real jobs at DataFrame-construction time (eager localCheckpoints of
index frames, the bounded driver collects in the ranking machinery and
small-graph components) — so a full dump costs a handful of small jobs,
not zero. The sf_dir defaults to the bench SF so the captured plans are
the ones the bench actually executes (AQE initial plans —
``isFinalPlan=false`` — as §7.2 of the guide describes for
pre-execution capture).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scala_data_pipeline_spark.plans.inspect import explain_str  # noqa: E402
from scala_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(os.environ.get("ROUND", "19"))
    only = [x for x in os.environ.get("PLANS_ONLY", "").split(",") if x]
    out_dir = f"plans/r{n}"
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as e

    spark = get_session("plan-dump")
    qs = e.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name in sorted(qs):
        try:
            plan = explain_str(qs[name](spark, sf))
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            plan = f"PLAN CAPTURE FAILED: {ex}\n"
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
    print(f"{out_dir}: {len(qs) - len(failed)} plans ({tag}), failed={failed}")
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
