#!/bin/bash
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== kernel diag ($(date +%H:%M:%S))" | tee -a $OUT/diag2.log
timeout 2400 python scripts/sweep_kernel.py 16000000 128x512 > $OUT/ksweep_128.log 2>&1
echo "=== 128x512 exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/diag2.log
EMBA_KERNEL_BF16=1 timeout 2400 python scripts/sweep_kernel.py 16000000 512x256 > $OUT/ksweep_bf16.log 2>&1
echo "=== bf16 exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/diag2.log
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz
PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=1 \
  timeout 2400 python scripts/probe_fused_scale.py 16000000 2097152 8 > $OUT/16M_fused_light_v2.log 2>&1
echo "=== 16M_light_v2 exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/diag2.log
echo "=== diag2 done" | tee -a $OUT/diag2.log
