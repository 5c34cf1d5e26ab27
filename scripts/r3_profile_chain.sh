#!/bin/bash
# Post-sweep profiling chain (ONE TPU process at a time):
#   1. forming component profile at 2M and 16M
#   2. solve-phase component profile at 2M
#   3. prev-layout A/B at 16M fused full (PROBE_PREV_2D=1)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
mkdir -p $OUT
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a $OUT/profile.log
  timeout 4800 "$@" > $OUT/prof_$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/profile.log
}

run forming_2M python scripts/profile_forming.py 2000000
run solve_2M python scripts/profile_solve.py 2000000
run forming_16M python scripts/profile_forming.py 16000000
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=0 PROBE_PREV_2D=1 \
  run 16M_full_prev2d python scripts/probe_fused_scale.py 16000000 2097152 8

echo "=== profile chain done ($(date +%H:%M:%S))" | tee -a $OUT/profile.log
