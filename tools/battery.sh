#!/bin/bash
# End-of-round battery (VERDICT r8 item 4: the sweep tripwire is a
# GATE — any stage failing, including an untriaged sweep alert, fails
# the battery). Run from the repo root:
#
#   bash tools/battery.sh [sf_correctness_dir]
#
# Stages, in dependency order (cheapest signal first):
#   1. pytest           — unit/plan/streaming/property suites
#   2. check_correctness— oracle differential, full registry
#   3. plain_session    — full registry under an untuned ANSI session
#   4. bench            — headline bench at $SPARK_GRAFT_SF_DIR (sf0.1)
#   5. registry_sweep   — full-registry latency tripwire vs committed
#                         baseline; exits nonzero on untriaged alerts
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
LOG=${BATTERY_LOG:-/tmp/battery_$(date +%s).log}
fail=0

run() {
  local name="$1"; shift
  echo "=== battery: $name ===" | tee -a "$LOG"
  if "$@" >>"$LOG" 2>&1; then
    echo "--- $name OK" | tee -a "$LOG"
  else
    echo "--- $name FAILED (see $LOG)" | tee -a "$LOG"
    fail=1
  fi
}

run pytest            python -m pytest tests/ -q
run check_correctness python tools/check_correctness.py "$SF"
run plain_session     python tools/plain_session_check.py
run bench             python bench.py
run registry_sweep    python tools/registry_sweep.py "$SF"

echo "=== battery: $([ $fail -eq 0 ] && echo ALL GREEN || echo FAILURES) (log: $LOG) ==="
exit $fail
