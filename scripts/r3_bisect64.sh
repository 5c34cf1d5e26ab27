#!/bin/bash
# Bisect the 64M fused worker crash: producer (pallas vs xla) x event count.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a $OUT/bisect64.log
  timeout 2400 "$@" > $OUT/$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/bisect64.log
}
# same event count, XLA scatter producer: is the Pallas kernel the fault?
PROBE_USE_PALLAS=0 run 64M_fused_xla \
  python scripts/probe_fused_scale.py 64000000 2097152 4
# bisect event count with the Pallas producer
run 48M_fused_pallas python scripts/probe_fused_scale.py 48000000 2097152 4
run 40M_fused_pallas python scripts/probe_fused_scale.py 40000000 2097152 4
echo "=== bisect64 done" | tee -a $OUT/bisect64.log
