"""Merge two bench.py JSON lines (base SF and a scaled-up SF) into the
committed whole-registry scaling artifact (verdict r9 item 4).

Usage:
  python scripts/bench_scale_report.py BASE.json SCALED.json SCALE OUT.json

Writes OUT.json with per-query times at both scales, the time ratio,
and a `flag` on any query scaling worse than ~linearxlog: for
T(n) = c*n*log(n) the expected ratio at SCALE is
SCALE * log(SCALE*N)/log(N) (N ~ 1e5, the corpus row-count order at
the base SF — the log factor is log(SCALE*N)/log(N), NOT log2(SCALE),
which would overstate the allowance ~4x); flagged above 1.5x that
expectation for measurement headroom. Prints a markdown table for
SCALE_NOTES.md.
"""
from __future__ import annotations

import json
import math
import sys

BASE_ROWS = 1e5  # order of the base-SF corpus row count

# Per-family TIGHT thresholds (round-12, verdict item 8): the two
# superlinear dedup tails from the r11 sfx10 artifact (edit-distance
# 8.9x, contrastive triplets 8.16x at 10x data) get the linearxlog
# allowance WITHOUT the 1.5 measurement headroom — they flag as soon
# as they exceed ideal scaling, so candidate-pair superlinearity is
# caught one scale step early. Value = headroom multiplier applied to
# scale*logfactor (1.0 = no headroom).
TIGHT_HEADROOM = {
    "dedup_edit_distance": 1.0,
    "dedup_contrastive_triplets": 1.0,
}


def main() -> None:
    base_path, scaled_path, scale_s, out_path = sys.argv[1:5]
    extras_path = sys.argv[5] if len(sys.argv) > 5 else None
    scale = float(scale_s)
    base = json.load(open(base_path))
    scaled = json.load(open(scaled_path))
    logfactor = (
        math.log(scale * BASE_ROWS) / math.log(BASE_ROWS)
        if scale > 1
        else 1.0
    )
    limit = scale * logfactor * 1.5 if scale > 1 else scale
    rows = []
    for name in sorted(base["queries"]):
        b = base["queries"][name]
        s = scaled["queries"].get(name)
        if s is None:
            continue
        # sub-second base times are fixed-overhead dominated; ratios on
        # them are noise — still reported, flagged only above 0.3 s base
        ratio = round(s / b, 2) if b else None
        q_limit = (
            scale * logfactor * TIGHT_HEADROOM[name]
            if name in TIGHT_HEADROOM and scale > 1
            else limit
        )
        flagged = bool(b >= 0.3 and ratio is not None and ratio > q_limit)
        rows.append(
            {
                "query": name,
                "base_sec": b,
                "scaled_sec": s,
                "ratio": ratio,
                "limit": round(q_limit, 2),
                "flag": flagged,
            }
        )
    out = {
        "base_sf": base.get("sf"),
        "scaled_sf": scaled.get("sf"),
        "scale_factor": scale,
        "flag_threshold_ratio": round(limit, 2),
        "tight_families": {
            q: round(scale * logfactor * h, 2)
            for q, h in TIGHT_HEADROOM.items()
        },
        "base_total_sec": base["value"],
        "scaled_total_sec": scaled["value"],
        "total_ratio": round(scaled["value"] / base["value"], 2),
        "queries": rows,
        "n_flagged": sum(r["flag"] for r in rows),
    }
    if extras_path:
        # e.g. the LSH bucket-size histogram from
        # scripts/lsh_bucket_histogram.py — records whether the pair
        # generators' caps actually bind at the scaled SF.
        out["extras"] = json.load(open(extras_path))
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"| query | {base.get('sf')} s | {scaled.get('sf')} s | ratio |")
    print("|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -(r["ratio"] or 0)):
        mark = " **FLAG**" if r["flag"] else ""
        print(
            f"| {r['query']}{mark} | {r['base_sec']} | {r['scaled_sec']} "
            f"| {r['ratio']} |"
        )
    print(
        f"\ntotal {base['value']} -> {scaled['value']} s "
        f"(x{out['total_ratio']}), {out['n_flagged']} flagged "
        f"(threshold x{out['flag_threshold_ratio']})"
    )


if __name__ == "__main__":
    main()
