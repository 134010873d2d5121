"""Drive the FULL 50-query driver contract against the DuckDB oracles
at sf0.1 — ten times the driver's own correctness SF (round-17, r16
verdict item 6: the one-off r16 run closed a real blind spot — float
sum order, window tie-breaks, and percentile interpolation above the
sf0.01 grain — so it becomes a standing gate step with a committed
per-round artifact, the same two-step flow as BENCH_r{n}.json).

Writes FULLDRIVE_r{N}.json (N from $ROUND) recording per-query status;
exits non-zero on any non-exact row. Rows-only queries (no oracle
entry) record their row count.

Run:  ROUND=17 python scripts/full_drive.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(os.environ["ROUND"])
    # A standalone run over uncommitted source would record a HEAD sha
    # that does not describe the code actually driven (round-18 advisor
    # item 3: only the round_gate.sh path had a DIRTY guard). Mirror
    # the gate's check — same pathspec — and fail BEFORE the ~8 min
    # drive, not after.
    dirty = subprocess.run(
        [
            "git", "status", "--porcelain", "--",
            "scala_data_pipeline_spark", "tests", "scripts",
            "__spark_entry__.py", "bench.py", "pyproject.toml",
            "pytest.ini",
        ],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.strip()
    if dirty:
        sys.exit(
            "full_drive.py: uncommitted SOURCE changes — the recorded"
            f" head would not describe the driven code:\n{dirty}\n"
            "Commit (or stash) source changes first."
        )
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.oracle_harness import compare, duckdb_run

    qs, oracles = e.queries(), e.oracle_sql()
    t0 = time.monotonic()
    results: dict[str, dict] = {}
    fails = 0
    for name in sorted(qs):
        row: dict = {}
        try:
            if name in oracles:
                compare(
                    qs[name](spark, sf), duckdb_run(oracles[name], sf), name
                )
                row["exact"] = True
            else:
                row["rows_only"] = qs[name](spark, sf).count()
        except Exception as ex:  # noqa: BLE001
            fails += 1
            row["err"] = str(ex)[:300]
            print(f"FAIL {name}: {row['err']}", flush=True)
        results[name] = row
    # Record the exact HEAD this drive describes (round-18 advisor item:
    # FULLDRIVE_r17.json was recorded at 4a80d0a, a later source commit
    # changed dedup_lsh_quality, and the gate re-validated the stale
    # artifact — the gate now enforces the same merge-base ancestry
    # check it applies to GATE_r*.json, so the artifact can never
    # silently outlive a source change).
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.strip()
    record = {
        "n": n,
        "head": head,
        "sf_dir": sf,
        "queries": len(qs),
        "exact": sum(1 for r in results.values() if r.get("exact")),
        "rows_only": sum(1 for r in results.values() if "rows_only" in r),
        "fails": fails,
        "wall_sec": round(time.monotonic() - t0, 1),
        "results": results,
    }
    path = f"FULLDRIVE_r{n:02d}.json"
    with open(path, "w") as f:
        json.dump(record, f, indent=4)
        f.write("\n")
    print(
        f"{path}: {record['exact']} exact + {record['rows_only']} rows-only "
        f"of {record['queries']} at {sf} in {record['wall_sec']}s, "
        f"{fails} failures"
    )
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
