"""Registry-wide global-window lint (round-9, per the round-7 verdict):
no query may funnel a CORPUS-PROPORTIONAL grain through a
single-partition window. ``Window.orderBy`` with an empty
``partitionBy`` plans as Window -> Sort -> Exchange SinglePartition —
one task sorts the whole frame. That is acceptable only when the frame
is STRUCTURALLY BOUNDED (days, 2-decimal cent values, a ~30-word
vocabulary, a 10-row decile summary) and the operator's docstring says
so; on customer/part/document grains it is the classic 100 TB
scale-killer (the round-7 verdict's `weak` list: lorenz/abc/skew, all
three since rewritten onto operators/ranking.py).

Every allowlisted name below carries its bounding argument. A new
query that introduces an unlisted single-partition window fails here —
the author either re-expresses it (two-pass ranking, broadcast
boundaries, TakeOrderedAndProject) or argues the bound in a new
allowlist entry.
"""

from __future__ import annotations

import re

import pytest

from scala_data_pipeline_spark.plans.inspect import explain_str
from scala_data_pipeline_spark.queries import all_queries, extra_queries

SF = "/root/testdata/sf0.001"

# name -> why the windowed frame is bounded (NOT corpus-proportional)
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "global_sort": "deliberate O1 reference-parity global ORDER BY "
    "(documented deviation; production callers use orderBy().limit())",
    "ab_welch_fdr": "BH rank window over the 25-brand p-value axis",
    "acf_daily_revenue": "lag window over the DAY grain",
    "activity_heatmap": "rank over the bounded 7x24 dow-hour grid",
    "anomaly_daily_revenue": "rolling stats over the DAY grain",
    "assoc_priority_status": "rank over the 5x3 priority-status grid",
    "backlog_open_lineitems": "cumulative window over the DAY grain",
    "benford_prices": "rank over the 9-digit leading-digit axis",
    "curation_mixture_sample": "cumulative quota over the ~20-source axis",
    "curation_unimax_alloc": "water-filling windows over the ~5-language "
    "axis (the corpus only contributes one token-count scan)",
    "curation_time_split": "split boundary over the DAY grain",
    "cusum_revenue_shift": "cumulative CUSUM over the DAY grain",
    "dow_seasonality": "window over the 7-row day-of-week axis",
    "histogram_equidepth_prices": "ECDF over the bounded cent-value "
    "grain (~13k distinct at 10M rows)",
    "ks_pairwise_events": "cumulative CDFs over the cent-value grain",
    "ks_value_drift": "cumulative CDFs over the cent-value grain",
    "lorenz_customer_spend": "cumulative share over the 10-row decile "
    "frame (deciles themselves come from operators/ranking.py)",
    "mau_28d_hll": "rollup window over the DAY grain",
    "sketch_hdr_quantiles": "cumulative lookup over the bounded HDR "
    "bucket grain (<= (64-M)*2^M rows regardless of corpus)",
    "rolling_corr_revenue_events": "rolling window over the DAY grain",
    "running_distinct_users": "running count over the DAY grain",
    "seasonal_decompose_revenue": "STL-lite windows over the DAY grain",
    "survival_km_users": "KM product over the day-grain death times",
    "window_maxdate_literal": "W1/F20 reference-parity global max "
    "(scalar window over an already-aggregated frame)",
    "xcorr_clicks_purchases": "lag windows over the DAY grain",
    "yoy_revenue_growth": "lag window over the MONTH grain",
}


def _has_single_partition_window(simple_plan: str) -> bool:
    lines = simple_plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow\b", ln):
            continue
        # the Window node's OWN child exchange sits within the next few
        # lines (Window -> Sort -> Exchange); unrelated single-partition
        # exchanges elsewhere in the plan must not trip the lint
        for nxt in lines[i + 1 : i + 4]:
            if "Exchange SinglePartition" in nxt:
                return True
    return False


@pytest.mark.heavy
def test_no_unlisted_single_partition_windows(spark):
    offenders = []
    registry = {**all_queries(), **extra_queries()}
    for name, fn in sorted(registry.items()):
        simple = explain_str(fn(spark, SF), mode="simple")
        if _has_single_partition_window(simple):
            if name not in GLOBAL_WINDOW_ALLOWED:
                offenders.append(name)
    assert not offenders, (
        f"unlisted single-partition window(s) in {offenders}: a window "
        "with no partitionBy funnels the frame through ONE task. "
        "Re-express on a bounded grain / two-pass ranking "
        "(operators/ranking.py) or add a justified allowlist entry."
    )


def test_allowlist_has_no_stale_entries(spark):
    """Every allowlisted name must still exist in the registry — a
    renamed or deleted query must not leave a dangling exemption."""
    registry = {**all_queries(), **extra_queries()}
    stale = sorted(set(GLOBAL_WINDOW_ALLOWED) - set(registry))
    assert not stale, f"allowlist entries for unknown queries: {stale}"
