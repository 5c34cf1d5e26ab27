#!/bin/bash
# Does the CLASSIC (fully-resident linearization) fused path still fit and
# run at 16M events on one chip? If it hits ~9M ev/s, the pipeline's
# auto-stream boundary (>8M) is costing ~1.8x at 16M.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
mkdir -p $OUT
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a $OUT/classic.log
  timeout 4800 "$@" > $OUT/final_$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/classic.log
}

PROBE_DATASET=$DS01 PROBE_C_TH=0.1 \
  run 16M_classic python scripts/probe_fused_scale.py 16000000 0 8
run 24M_classic python scripts/probe_fused_scale.py 24000000 0 8

echo "=== classic probe done ($(date +%H:%M:%S))" | tee -a $OUT/classic.log
