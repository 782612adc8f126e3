#!/bin/bash
# Full-suite runner: ONE pytest process per test file.
#
# Why not a single pytest process: on this 1-core host a long-lived process
# intermittently SIGABRTs inside the XLA-CPU compile path (observed in
# compilation_cache.put_executable_and_time and in bare compiles after ~30+
# minutes of accumulated executables). Per-file processes bound the blast
# radius and let the suite finish deterministically.
#
# Usage: bash scripts/run_suite.sh [results_log]
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/suite_chunks.log}
PASS=0; FAIL=0; : > "$LOG"
START=$(date +%s)
for f in tests/test_*.py; do
  T0=$(date +%s)
  timeout 2400 python -m pytest "$f" -q -p no:cacheprovider >> "$LOG" 2>&1
  rc=$?
  T1=$(date +%s)
  if [ $rc -eq 0 ]; then
    PASS=$((PASS+1)); echo "PASS $((T1-T0))s $f" | tee -a "$LOG"
  else
    FAIL=$((FAIL+1)); echo "FAIL rc=$rc $((T1-T0))s $f" | tee -a "$LOG"
  fi
done
echo "SUITE DONE in $((($(date +%s)-START)/60))min: $PASS files passed, $FAIL files failed" | tee -a "$LOG"
[ $FAIL -eq 0 ]
