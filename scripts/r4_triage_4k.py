"""4K-row triage, round 2 (the 48M/cap-2^21 attempt OOM'd: A12 alone is
6.4 GB at 2^21 rows). Feasible probes of the two hypotheses for the flat
4K RMSE:

* event density: 32M events at cap 2^20 (A12 3.2 GB),
* map absorption: 16M events with a 10x stronger L2 regularizer (alpha 5.0,
  the reference's own launch-file value) so the map can't soak up pose-
  observable residual,
* control: the same sequence at 1024x512 with the full 61M-event stream
  (does density help at 1K too?).

Usage (TPU): python scripts/r4_triage_4k.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

from emba_tpu import eval_suite as ES  # noqa: E402

OUT = ".cache/r4/triage_4k.json"
results = []
seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_bicycle_like"]
COMMON = dict(sensor=240, sensor_h=180, c_th=0.2, perturb=0.005,
              num_steps=1500, max_iter=50)


def run(tag, **kw):
    r = ES.run_sequence(f"ecrot_bicycle_like:{tag}", seed, motion, smooth,
                        amp, duration, **COMMON, **kw)
    results.append(r)
    print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
          f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} -> "
          f"{r['photometric_refined']:.1f} | {r['lm_iterations']} iters "
          f"| {r['wall_s']:.1f}s", flush=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(results, f, indent=2)


# A: density at 4K (32M events, cap 2^20)
run("4k_32m", pano_height=2048, compact_cap=1 << 20, outlier_dp=12.0,
    max_events=32_000_000, stream=True)
# B: map-absorption probe (16M, alpha 5.0 — the reference launch value)
run("4k_16m_alpha5", pano_height=2048, compact_cap=1 << 21, outlier_dp=12.0,
    max_events=16_000_000, stream=True, alpha=5.0)
# C: control at 1K with the full 61M-event stream
run("1k_full", pano_height=512, max_events=0)
print("done")
