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

python -m pytest tests/ -q
python bench.py
# Regenerate the plan audit FROM the gate so it can never trail the
# registry (round-7 defect: two queries committed after the last
# manual refresh). The generator asserts row count == registry size.
python -m scala_data_pipeline_spark.plans.report
# The regeneration fixes the LOCAL tree only — fail the gate when the
# COMMITTED audit is stale (advisor round-9: a stale committed audit
# still gated GREEN).
git diff --exit-code -- PLAN_AUDIT.md
echo "round gate: GREEN"
