#!/bin/bash
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== kernel sweep 16M ($(date +%H:%M:%S))" | tee -a $OUT/ksweep.log
timeout 5400 python scripts/sweep_kernel.py 16000000 512x256 512x512 512x1024 256x512 256x1024 512x2048 \
  > $OUT/ksweep_16M.log 2>&1
echo "=== kernel sweep done exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/ksweep.log
