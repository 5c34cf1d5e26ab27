#!/bin/bash
# Round-3 HEAD scale table (after the flat-prev + tuple-slice fixes):
# 2M streamed rows, 16M fused light/full, 32M fused full, 64M host-loop
# full, then the 203M production run. Sequential (ONE TPU process).
# Results in .cache/r3_sweep/final_*.log.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
mkdir -p $OUT
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a $OUT/final.log
  timeout 4800 "$@" > $OUT/final_$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/final.log
}

BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 \
  run bench_2M_full python bench.py
BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=1 \
  run bench_2M_light python bench.py

PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=0 \
  run 16M_full python scripts/probe_fused_scale.py 16000000 2097152 8
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=1 \
  run 16M_light python scripts/probe_fused_scale.py 16000000 2097152 8

PROBE_STREAM_LIGHT=0 \
  run 32M_full python scripts/probe_fused_scale.py 32000000 2097152 8

BENCH_C_TH=0.0125 BENCH_MAX_EVENTS=64000000 BENCH_FUSED=0 BENCH_SKIP_CPU=1 \
  BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 BENCH_LM_ITERS=8 \
  run 64M_hostloop python bench.py

run bigrun_203M python scripts/r3_bigrun.py /tmp/emba_bigrun

echo "=== head sweep done ($(date +%H:%M:%S))" | tee -a $OUT/final.log
