"""Non-UTC timezone robustness probe (round-15; SURVEY.md §7.5 risk 2,
T10). The engine pins the session timezone to UTC inside ``load_table``
so results are host-TZ-independent; this probe PROVES it by driving the
timestamp-heavy driver queries against their DuckDB twins with both the
process TZ and the JVM default timezone set to a DST-observing zone.

Run:  TZ=America/New_York python scripts/tz_probe.py [sf_dir]
(the script re-asserts the JVM zone itself, so plain
``python scripts/tz_probe.py`` also probes a non-UTC JVM).

Round-15 result: 9/9 hash-exact under America/New_York at sf0.01.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

ZONE = os.environ.get("TZ") or "America/New_York"

# Timestamp/date-heavy driver queries (event-time windows, day grains,
# as-of joins, epoch parsing); membership rotates, so absent names are
# skipped with a note rather than failing the probe.
PROBE = [
    "cohort_ltv",
    "acf_daily_revenue",
    "windowed_revenue",
    "anomaly_daily_revenue",
    "attribution_last_touch",
    "curation_time_split",
    "scd2_customer_asof",
    "cusum_revenue_shift",
    "variant_extract_props",
    "flagship_datamart",
    # Round-16 promotions on the day/event-time grain:
    "seasonal_decompose_revenue",
    "weighted_median_prices",
    # Round-17 promotions on the day/event-time grain (cohort_ltv,
    # acf_daily_revenue, curation_time_split rotated out to extras —
    # skipped gracefully above):
    "twap_user_value",
    "ewma_daily_revenue",
    # Round-18 promotions on the day/event-time grain (scd2_customer_asof
    # and variant_extract_props rotated out to extras — skipped
    # gracefully above):
    "dow_seasonality",
    "yoy_revenue_growth",
    # Round-19 promotions on the event-time grain (anomaly_daily_revenue
    # and attribution_last_touch rotated out to extras — skipped
    # gracefully above): conversion_latency differences unix_timestamp
    # seconds between view and purchase events.
    "conversion_latency",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.extraJavaOptions", f"-Duser.timezone={ZONE}"
        )
        .config(
            "spark.executor.extraJavaOptions", f"-Duser.timezone={ZONE}"
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from tests.oracle_harness import compare, duckdb_run

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    driven = 0
    for name in PROBE:
        if name not in qs or name not in oracles:
            print(f"skip {name} (rotated out of the driver set)")
            continue
        try:
            compare(qs[name](spark, sf), duckdb_run(oracles[name], sf), name)
            driven += 1
            print(f"OK {name}")
        except Exception as ex:  # noqa: BLE001
            failures.append((name, str(ex)[:200]))
            print(f"FAIL {name}: {str(ex)[:200]}")
    print(
        f"tz probe ({ZONE}) at {sf}: {driven} exact, "
        f"{len(failures)} failures {failures}"
    )
    if failures:
        raise SystemExit(1)
    # Round-16 (the probe now runs inside round_gate.sh): rotation must
    # not hollow the probe out — if fewer than 3 timestamp-heavy names
    # remain in the driver set, refresh PROBE with current slots.
    if driven < 3:
        raise SystemExit(
            f"tz probe drove only {driven} queries — update PROBE for "
            "the current rotation"
        )


if __name__ == "__main__":
    main()
