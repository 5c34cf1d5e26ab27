#!/bin/bash
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
echo "=== suite start ($(date +%H:%M:%S))" | tee -a .cache/r3_sweep/suite.log
timeout 9000 python scripts/r3_suite.py docs/suite_ecrot_like_r3.json \
  > .cache/r3_sweep/suite_r3.log 2>&1
echo "=== suite exit=$? ($(date +%H:%M:%S))" | tee -a .cache/r3_sweep/suite.log
