#!/usr/bin/env bash
# End-of-round gate: run this as the FINAL action of every build round,
# AFTER the last feature commit (round 4 shipped a feature whose plan
# lock would have failed here — the full suite had not been re-run).
#
# Exits non-zero if either the full test suite or the benchmark fails.
#   pytest tests/   — unit + oracle-parity + plan locks (~7 min on local[32])
#   bench.py        — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1);
#                     prints the one-line JSON the driver records.
set -euo pipefail
cd "$(dirname "$0")/.."

# ROUND must be set so the bench output lands as a committed artifact:
# round 10's bench JSON was never committed (BENCH_r09 -> BENCH_r11
# gap), breaking round-over-round regression attribution.
: "${ROUND:?set ROUND=<n> (e.g. ROUND=12) so bench output is recorded as BENCH_r<n>.json}"

# README registry counts must match the live import (they drifted
# twice when hand-maintained — round-12 verdict item 7).
python scripts/registry_counts.py --check

python -m pytest tests/ -q
python bench.py | tee /tmp/bench_gate.out
# Record the bench line as this round's committed artifact. Written
# only if absent (timings are nondeterministic — the first gate run's
# number IS the round's number; delete the file to force a re-record),
# then required to be git-tracked: first run writes it and fails, the
# builder commits it, the re-run goes green — the same two-step flow
# as the PLAN_AUDIT staleness check below.
BENCH_ARTIFACT="BENCH_r$(printf '%02d' "$ROUND").json"
if [ ! -f "$BENCH_ARTIFACT" ]; then
  tail -1 /tmp/bench_gate.out | ROUND="$ROUND" python -c '
import json, os, sys
line = sys.stdin.read().strip()
parsed = json.loads(line)
n = int(os.environ["ROUND"])
out = {"n": n, "rc": 0, "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
       "sf": parsed.get("sf"), "tail": line + "\n", "parsed": parsed}
with open(f"BENCH_r{n:02d}.json", "w") as f:
    json.dump(out, f, indent=4)
print(f"wrote BENCH_r{n:02d}.json")
'
fi
git ls-files --error-unmatch "$BENCH_ARTIFACT" > /dev/null 2>&1 || {
  echo "$BENCH_ARTIFACT is not committed — commit it and re-run the gate" >&2
  exit 1
}
# Regenerate the plan audit FROM the gate so it can never trail the
# registry (round-7 defect: two queries committed after the last
# manual refresh). The generator asserts row count == registry size.
python -m scala_data_pipeline_spark.plans.report
# The regeneration fixes the LOCAL tree only — fail the gate when the
# COMMITTED audit is stale (advisor round-9: a stale committed audit
# still gated GREEN).
git diff --exit-code -- PLAN_AUDIT.md
echo "round gate: GREEN"
