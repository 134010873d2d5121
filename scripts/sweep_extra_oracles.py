"""Drive EVERY oracled extra against its DuckDB twin at an arbitrary SF
(default sf0.01 — the driver's correctness SF, one decade above the
local suite's sf0.001). Round-13 origin: rotations promote extras into
driver slots, and a query that matches at sf0.001 can still diverge at
sf0.01 (value-dependent rounding boundaries, bigger grains); this sweep
de-risks every future promotion in one run. Round-13 result: 179/179
exact, zero failures.

With ``ROUND`` set, also writes the gate-validated artifact
``SWEEP_r{N}.json`` (r19 verdict item 7: the sweep was only a committed
log; rotation makes demoted queries the sweep's responsibility, so the
record gets the same HEAD-sha + ancestry treatment as FULLDRIVE):
per-query status, counts, and the sha the sweep describes. Like
full_drive.py, it refuses to record over uncommitted source.

Run:  python scripts/sweep_extra_oracles.py [sf_dir]
      ROUND=20 python scripts/sweep_extra_oracles.py /root/testdata/sf0.1
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    round_n = os.environ.get("ROUND")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if round_n is not None:
        dirty = subprocess.run(
            [
                "git", "status", "--porcelain", "--",
                "scala_data_pipeline_spark", "tests", "scripts",
                "__spark_entry__.py", "bench.py", "pyproject.toml",
                "pytest.ini",
            ],
            capture_output=True, text=True, cwd=repo, check=True,
        ).stdout.strip()
        if dirty:
            sys.exit(
                "sweep_extra_oracles.py: uncommitted SOURCE changes — the"
                " recorded head would not describe the swept code:\n"
                f"{dirty}\nCommit (or stash) source changes first."
            )
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tests.oracle_harness import compare, duckdb_run

    from scala_data_pipeline_spark.queries import extra_oracles, extra_queries

    q, o = extra_queries(), extra_oracles()
    t0 = time.monotonic()
    results: dict[str, dict] = {}
    fails = []
    for name in sorted(q):
        if name not in o:
            continue
        try:
            compare(q[name](spark, sf), duckdb_run(o[name], sf), name)
            results[name] = {"exact": True}
            print("OK", name, flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            results[name] = {"err": str(exc)[:300]}
            print("FAIL", name, str(exc)[:500], flush=True)
    print(f"sweep done at {sf}: {len(fails)} failures {fails}", flush=True)
    if round_n is not None:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=repo, check=True,
        ).stdout.strip()
        record = {
            "n": int(round_n),
            "head": head,
            "sf_dir": sf,
            "queries": len(results),
            "exact": sum(1 for r in results.values() if r.get("exact")),
            "fails": len(fails),
            "wall_sec": round(time.monotonic() - t0, 1),
            "results": results,
        }
        path = os.path.join(repo, f"SWEEP_r{int(round_n):02d}.json")
        with open(path, "w") as f:
            json.dump(record, f, indent=4)
            f.write("\n")
        print(f"wrote {path}: {record['exact']}/{record['queries']} exact")
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
