#!/bin/bash
# Round-5 measurement battery: ONE serial process at a time on the TPU
# (concurrent clients wedge the tunnel pool) AND on the 1-core host
# (concurrent python processes starve each other).  Each step appends to
# /tmp/round5_measure.log.  Run from the repo root.
#
# Order: headline baseline, bf16-field A/B (VERDICT #2), BASELINE row 2
# (#4), 448^3 x3 stability (#5), padded-view capped-hierarchy regime
# probe (#8), fuse_update_norm at 448^3 (#8), fused frame loop (#7),
# shard_map Mosaic exposure (#9), cold-compile probe (#3) last -- it
# pollutes nothing (throwaway cache dir) but takes the longest.
set -u
LOG=/tmp/round5_measure.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
}

# 0. Smoke + headline baseline.
run env BENCH_N=48 BENCH_REPS=1 python bench.py
run env BENCH_N=256 BENCH_REPS=3 python bench.py
# 1. bf16 V-cycle field storage A/B (VERDICT r4 #2).
run env BENCH_N=256 BENCH_REPS=3 BENCH_FIELD_BF16=1 python bench.py
# 2. BASELINE row 2 as declared: interior solid sphere, tol 1e-6.
run python benchmarks/row2_solid.py 128 1e-6
# 3. 448^3 x3 stability (VERDICT r4 #5).
run env BENCH_N=448 BENCH_REPS=2 python bench.py
run env BENCH_N=448 BENCH_REPS=2 python bench.py
run env BENCH_N=448 BENCH_REPS=2 python bench.py
# 4. Padded-view regime probe: a depth-capped hierarchy leaves big,
#    thin-padded coarse levels -- the one geometry where the padded
#    kernel view could win (VERDICT r4 #8).
run env BENCH_N=256 BENCH_REPS=3 BENCH_MAX_LEVELS=4 python bench.py
run env BENCH_N=256 BENCH_REPS=3 BENCH_MAX_LEVELS=4 BENCH_PAD_COARSE=1 python bench.py
# 5. fuse_update_norm at the large end: MEASURED 32.72M vs 33.75M DOF/s
#    (negative at 448^3 as at 256^3); the knob and kernel were then
#    REMOVED (RESULTS.md round-5) -- the line below no longer has a knob
#    to flip and is kept as the record of what ran.
# run env BENCH_N=448 BENCH_REPS=2 BENCH_FUSE_UPDATE=1 python bench.py
# 5b. Band-strip boundary passes (round-5 kernel optimization): the
#     compute-bound smoother skips the z-middle on slabs whose band
#     lives in the z-edge lane tiles (bit-identical by construction).
run env BENCH_N=256 BENCH_REPS=3 BENCH_BAND_STRIP=128 python bench.py
run env BENCH_N=448 BENCH_REPS=2 BENCH_BAND_STRIP=128 python bench.py
# 6. Fused frame loop (VERDICT r4 #7): steady s/frame, run vs run_fused.
run python benchmarks/frames_bench.py 128 16 8
# 7. shard_map kernel through Mosaic on the real chip (VERDICT r4 #9).
run python benchmarks/sharded_mosaic_1dev.py 64
# 8. Cold-compile forensics (VERDICT r4 #3): fresh local cache dir.
run env GMG_CACHE_DIR=/tmp/gmg_cold_probe python benchmarks/profile_setup.py 256
# 9. 512^3 structural sharded build (CPU, virtual 8-mesh; BASELINE row 5
#    budget).  Long on a 1-core host.
run python benchmarks/sharded_setup_512.py 512
