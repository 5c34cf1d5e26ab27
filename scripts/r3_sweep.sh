#!/bin/bash
# Round-3 scale sweep (sequential — ONE TPU process at a time).
# Results land in .cache/r3_sweep/*.log; run with nohup.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
mkdir -p $OUT
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a $OUT/sweep.log
  timeout 3000 "$@" > $OUT/$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/sweep.log
}

# 16M fused, light vs full tier (goal: light >= 9M ev/s)
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=1 \
  run 16M_fused_light python scripts/probe_fused_scale.py 16000000 2097152 8
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=0 \
  run 16M_fused_full python scripts/probe_fused_scale.py 16000000 2097152 8
# whole 23.1M dataset, light tier
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=1 \
  run 23M_fused_light python scripts/probe_fused_scale.py 23120008 2097152 8
# 2M bench rows: classic (default), streamed-light, streamed-full
run bench_2M_classic python bench.py
BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=1 \
  run bench_2M_stream_light python bench.py
BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 \
  run bench_2M_stream_full python bench.py
echo "=== sweep done ($(date +%H:%M:%S))" | tee -a $OUT/sweep.log
