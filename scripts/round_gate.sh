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
echo "round gate: GREEN"
