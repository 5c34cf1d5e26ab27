#!/bin/bash
# Round-3 battery, part 2: re-measure after the tuple-row fix, retry the 4K
# suite row, run the 203M production demo.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache
OUT=.cache/r3_sweep
DS01=/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.1.npz
run() {
  name=$1; shift
  echo "=== $name ($(date +%H:%M:%S))" | tee -a $OUT/final2.log
  timeout 4800 "$@" > $OUT/final2_$name.log 2>&1
  echo "=== $name exit=$? ($(date +%H:%M:%S))" | tee -a $OUT/final2.log
}

PROBE_DATASET=$DS01 PROBE_C_TH=0.1 PROBE_STREAM_LIGHT=0 \
  run 16M_full python scripts/probe_fused_scale.py 16000000 2097152 8
BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 \
  run bench_2M_full python bench.py
BENCH_C_TH=0.0125 BENCH_MAX_EVENTS=64000000 BENCH_FUSED=0 BENCH_SKIP_CPU=1 \
  BENCH_STREAM_CHUNK=2097152 BENCH_STREAM_LIGHT=0 BENCH_LM_ITERS=8 \
  run 64M_hostloop python bench.py
PROBE_STREAM_LIGHT=0 \
  run 32M_full python scripts/probe_fused_scale.py 32000000 2097152 8

run suite_4k python - <<'PYEOF'
import json, os, sys
sys.path.insert(0, "/root/repo")
from emba_tpu import eval_suite as ES
seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_bicycle_like"]
r = ES.run_sequence(
    "ecrot_bicycle_like:4k_compact", seed, motion, smooth, amp, duration,
    pano_height=2048, sensor=240, sensor_h=180, c_th=0.2, perturb=0.005,
    max_iter=30, num_steps=1500, compact_cap=1 << 21, outlier_dp=12.0,
    max_events=16_000_000, stream=True,
)
print(json.dumps(r, indent=2))
path = "/root/repo/docs/suite_ecrot_like_r3.json"
rows = json.load(open(path))
rows = [x for x in rows if x["sequence"] != r["sequence"]] + [r]
json.dump(rows, open(path, "w"), indent=2)
print("spliced")
PYEOF

run bigrun_203M python scripts/r3_bigrun.py /tmp/emba_bigrun
echo "=== final2 done ($(date +%H:%M:%S))" | tee -a $OUT/final2.log
