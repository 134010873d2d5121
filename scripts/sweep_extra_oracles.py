"""Drive EVERY oracled extra against its DuckDB twin at an arbitrary SF
(default sf0.01 — the driver's correctness SF, one decade above the
local suite's sf0.001). Round-13 origin: rotations promote extras into
driver slots, and a query that matches at sf0.001 can still diverge at
sf0.01 (value-dependent rounding boundaries, bigger grains); this sweep
de-risks every future promotion in one run. Round-13 result: 179/179
exact, zero failures.

Run:  python scripts/sweep_extra_oracles.py [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    fails = []
    for name in sorted(q):
        if name not in o:
            continue
        try:
            compare(q[name](spark, sf), duckdb_run(o[name], sf), name)
            print("OK", name, flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            print("FAIL", name, str(exc)[:500], flush=True)
    print(f"sweep done at {sf}: {len(fails)} failures {fails}", flush=True)
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
