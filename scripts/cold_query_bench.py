"""Cold-session per-query bench: fresh process, bench.py's session and
warmup, then the bench protocol (one untimed warm rep + 3 timed noop
reps, min) for ONLY the named queries. The r19 verdict adjudicated one
regression that same-session interleaved A/B missed — eager
localCheckpoints whose construction-time jobs are amortized in a warm
session but paid in full by the driver's cold run. Every checkpoint-
shaped change this round is therefore A/B'd with one fresh
``spark-submit`` per arm via this script (verdict r19 items 1-2).

Run:  python scripts/cold_query_bench.py q1,q2 [sf_dir]
Prints one JSON line {"queries": {name: min_sec}, "runs": {...}}.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scala_data_pipeline_spark.queries import all_queries  # noqa: E402
from scala_data_pipeline_spark.session import get_session  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    queries = all_queries()
    if any(n not in queries for n in names):
        from scala_data_pipeline_spark.queries import extra_queries

        queries.update(extra_queries())
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_session("cold-query-bench")
    # Same session-level warmups as bench.py (JVM, parquet footers,
    # Arrow workers) — these are amortized session costs there too.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(10).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"coldab: {name} warm")
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        reps: list[float] = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"coldab: {name} rep{i}")
            start = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - start, 3))
            del df
            gc.collect()
        timings[name] = min(reps)
        runs[name] = reps
    print(json.dumps({"queries": timings, "runs": runs}))


if __name__ == "__main__":
    main()
