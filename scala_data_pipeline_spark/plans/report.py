"""Plan-audit report: run ``python -m scala_data_pipeline_spark.plans.report``
to regenerate PLAN_AUDIT.md — one row per registry query with its
shuffle count, join strategies, Python presence, partial-agg and
pushdown flags, and codegen stage count. The tabular twin of the
plan-lock tests: locks pin the load-bearing shapes, the report shows
the whole surface at a glance.
"""

from __future__ import annotations

import os
import sys


def generate(out_path: str = "PLAN_AUDIT.md", sf_dir: str | None = None) -> str:
    from ..queries import all_queries, extra_queries
    from ..session import get_session
    from .inspect import plan_audit

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_session("plan-audit", shuffle_partitions=8)
    rows = []
    # Driver registry plus the locally-oracled extras ("*name" rows):
    # the audit should cover the whole checked surface, not just the
    # 50 driver slots.
    audited = dict(sorted(all_queries().items()))
    audited.update(
        (f"*{n}", fn) for n, fn in sorted(extra_queries().items())
    )
    for name, fn in audited.items():
        try:
            a = plan_audit(fn(spark, sf_dir))
            rows.append(
                (
                    name,
                    a["n_shuffle_exchanges"],
                    a["n_broadcast_joins"],
                    a["n_sortmerge_joins"],
                    a["n_python_udfs"],
                    "y" if a["has_partial_agg"] else "",
                    "y" if a["has_pushed_filters"] else "",
                    a["codegen_stages"],
                )
            )
        except Exception as exc:  # pragma: no cover - report must not die
            # Exactly as many cells as the header (name + 7 metric
            # columns); the error text rides in the last (codegen) cell
            # so a failing query still renders inside the table grid.
            err = str(exc).replace("|", "/").replace("\n", " ")[:40]
            rows.append((name, "-", "-", "-", "-", "-", "-", err))
    lines = [
        "# Plan audit (auto-generated — `python -m"
        " scala_data_pipeline_spark.plans.report`)",
        "",
        f"Scale factor dir: `{sf_dir}`. Shuffle = bare Exchange nodes;",
        "Py = BatchEval/ArrowEval Python operators in the plan (0 on hot",
        "paths; deliberate non-zero sites: url_pipeline's reference-parity",
        "F7 UDF, multimodal's mapInPandas decode, sim_mmr_rerank's",
        "applyInPandas greedy, sim_topk_pq's Arrow encode/ADC scans —",
        "each documented at the operator);",
        "partial = map-side combine",
        "present; pushdown = non-empty PushedFilters on a scan; codegen =",
        "distinct WholeStageCodegen spans. `*name` rows are the",
        "locally-oracled EXTRA queries beyond the 50 driver slots.",
        "",
        "NB: the dedup/graph family consumes MEMOIZED checkpointed hubs",
        "(the LSH candidate-pair list and the shingle-intersection core,",
        "one per sf_dir — queries/ext_dedup.py), so those rows' plans",
        "start from the materialized edge list; the hub's own build cost",
        "(shingle scan -> minhash -> bands, ~4 shuffles) is paid once per",
        "sweep, exactly like a production run that persists candidates",
        "between generation and verification.",
        "",
        "| query | shuffles | bcast joins | sortmerge | Py | partial | pushdown | codegen |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    # The audit must cover the WHOLE registry — a stale audit that
    # trails the registry (round-7 defect) reads as full coverage
    # when it isn't. Rows are generated from the registry itself, so
    # this can only fire on a generator bug; it still makes the
    # contract explicit for the gate that calls us.
    if len(rows) != len(audited):
        raise RuntimeError(
            f"plan audit covered {len(rows)} of {len(audited)} "
            "registry queries"
        )
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(text)
    print(f"plan audit: {len(rows)} registry queries covered")
    return out_path


if __name__ == "__main__":
    path = generate(*(sys.argv[1:] or []))
    print(f"wrote {path}")
