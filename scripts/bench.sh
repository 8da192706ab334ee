#!/usr/bin/env bash
# Run the full benchmark sweep and regenerate the report.
# The analog of the reference's scripts/bench.sh: run -> tee raw output ->
# generate report -> archive timestamped copy.
#
# Usage: scripts/bench.sh [--quick]
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p bench-results
python scripts/bench_sweep.py "$@" | tee bench-results/last_run.log
python scripts/export_report.py
echo "report: bench-results/latest.md"
