#!/bin/bash
# Round-3 measurement battery: ONE serial process at a time on the TPU
# (concurrent clients wedge the tunnel pool; see RESULTS.md).  Each step
# appends to /tmp/round3_measure.log.  Run from the repo root.
set -u
LOG=/tmp/round3_measure.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 0. Padded-coarse-kernel A/B at the headline size (new in this round;
#    the default-on path first so its programs land in the cache).
run env BENCH_N=256 BENCH_REPS=3 python bench.py
run env BENCH_N=256 BENCH_REPS=3 BENCH_PAD_COARSE=0 python bench.py
# 1. North-star tolerance.
run env BENCH_N=256 BENCH_REPS=3 BENCH_TOL=1e-6 python bench.py
# 2. Ladder points.
run env BENCH_N=128 BENCH_REPS=3 python bench.py
run env BENCH_N=320 BENCH_REPS=2 python bench.py
run env BENCH_N=384 BENCH_REPS=2 python bench.py
# 3. Post-diet 448^3 attempt (expected tight; OOM is an acceptable answer).
run env BENCH_N=448 BENCH_REPS=1 python bench.py
echo "ALL DONE" >> "$LOG"
