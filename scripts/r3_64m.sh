#!/bin/bash
# Round-3 64M probes (VERDICT r2 item 2): reproduce the fused crash at HEAD,
# then re-measure the host-loop 64M row. Waits for an existing TPU pid first
# (ONE TPU process at a time).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== 64M_fused_full ($(date +%H:%M:%S))" | tee -a $OUT/sweep64.log
timeout 3000 python scripts/probe_fused_scale.py 64000000 2097152 8 \
  > $OUT/64M_fused_full.log 2>&1
echo "=== 64M_fused_full exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/sweep64.log

echo "=== 64M_hostloop_full ($(date +%H:%M:%S))" | tee -a $OUT/sweep64.log
BENCH_C_TH=0.0125 BENCH_MAX_EVENTS=64000000 BENCH_FUSED=0 BENCH_SKIP_CPU=1 \
  BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 BENCH_LM_ITERS=8 \
  timeout 3000 python bench.py > $OUT/64M_hostloop_full.log 2>&1
echo "=== 64M_hostloop_full exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/sweep64.log
echo "=== sweep64 done" | tee -a $OUT/sweep64.log
