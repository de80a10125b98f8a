#!/bin/bash
# Bisect the align-step TPU failure (VERDICT round 1, weak #1).
# Runs bench.py with one knob flipped at a time; logs PASS/FAIL per config.
cd /root/repo
LOG=${1:-/tmp/bisect.log}
: > "$LOG"

run() {
  name=$1; shift
  echo "=== $name : $* ===" >> "$LOG"
  start=$(date +%s)
  env BENCH_STEPS=1 "$@" timeout 1800 python bench.py >> "$LOG" 2>&1
  rc=$?
  echo "=== $name rc=$rc elapsed=$(( $(date +%s) - start ))s ===" >> "$LOG"
  echo >> "$LOG"
}

run baseline
run attn_xla   BENCH_ATTN=xla
run no_remat   BENCH_REMAT=0
run no_moe     BENCH_MOE=0
run small_teacher BENCH_TEACHER=0.5b
run no_scan    BENCH_SCAN=0
echo ALL_DONE >> "$LOG"
