#!/bin/bash
# Run the slow test tier one FILE per pytest process.
#
# Rationale: XLA:CPU segfaults after ~110 compile-heavy tests in a single
# long-lived process (backend_compile_and_load, reproducible at the same
# collection position across runs; every implicated file passes in
# isolation). Per-file processes bound the blast radius and give a reliable
# full-suite signal on this host. TPU runs don't hit this (different
# backend); CI with more RAM/cores can still use plain `pytest -m slow`.
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:$PYTHONPATH
PASS=0; FAIL=0; FAILED=()
for f in $(python -m pytest tests/ -m slow --collect-only -q 2>/dev/null \
           | grep :: | cut -d: -f1 | sort -u); do
  t0=$SECONDS
  if timeout "${LZT_SLOW_FILE_CAP_S:-1200}" python -m pytest "$f" -q -m slow \
       -p no:cacheprovider > "/tmp/slow_$(basename "$f").out" 2>&1; then
    PASS=$((PASS+1)); status=ok
  else
    FAIL=$((FAIL+1)); FAILED+=("$f"); status=FAIL
  fi
  echo "[slow-suite] $f $status ($((SECONDS-t0))s)"
done
echo "[slow-suite] files: $PASS ok, $FAIL failed: ${FAILED[*]}"
[ "$FAIL" -eq 0 ]
