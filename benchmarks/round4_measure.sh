#!/bin/bash
# Round-4 measurement battery: ONE serial process at a time on the TPU
# (concurrent clients wedge the tunnel pool; see RESULTS.md).  Each step
# appends to /tmp/round4_measure.log.  Run from the repo root.
#
# Order rationale: headline + pad A/B first (highest-leverage open
# question), then the smoother-arithmetic microbench (VERDICT r3 #2),
# boundary-pass A/B (#3), tolerance/ladder re-measurements, the 64^3
# amortized probe (#7), and the post-diet 448^3 attempt (#4) last since
# an OOM there cannot poison earlier steps.
set -u
LOG=/tmp/round4_measure.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 0. Smoke: tiny grid proves compile service + runtime are healthy.
run env BENCH_N=48 BENCH_REPS=1 python bench.py
# 1. Headline with the round-4 smoother arithmetic; pad A/B.
run env BENCH_N=256 BENCH_REPS=3 python bench.py
run env BENCH_N=256 BENCH_REPS=3 BENCH_PAD_COARSE=0 python bench.py
# 2. Kernel microbench: smoothing-block rows quantify the arithmetic cut
#    (target < 2.7 ms at 256^3; round-3 baseline 3.07 ms).
run python benchmarks/microbench.py 256 100
# 3. Boundary-pass schedule A/B (reference constant k=3 is not a law).
run env BENCH_N=256 BENCH_REPS=3 BENCH_BOUNDARY_ITERS=2 python bench.py
run env BENCH_N=256 BENCH_REPS=3 BENCH_BOUNDARY_ITERS=1 python bench.py
run env BENCH_N=384 BENCH_REPS=2 BENCH_BOUNDARY_ITERS=2 python bench.py
# 4. North-star tolerance.
run env BENCH_N=256 BENCH_REPS=3 BENCH_TOL=1e-6 python bench.py
# 5. Ladder points.
run env BENCH_N=128 BENCH_REPS=3 python bench.py
run env BENCH_N=320 BENCH_REPS=2 python bench.py
run env BENCH_N=384 BENCH_REPS=2 python bench.py
# 6. 64^3 amortized probe: launch overhead vs device time (ladder row).
run python benchmarks/solve_amortized.py 64 20
# 7. Post-diet 448^3 attempt (OOM is an acceptable, recordable answer).
run env BENCH_N=448 BENCH_REPS=1 python bench.py
echo "ALL DONE" >> "$LOG"
