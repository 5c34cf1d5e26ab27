"""Round-4 triage of the r3 suite's weak rows (VERDICT r3 item 1):

* every r3 row saturated the 30-iteration cap (the reference runs
  max_num_iter=50, launch/bicycle.launch:58) -> re-run at 50;
* ecd_dynamic_like REGRESSED (1.92 -> 2.12 deg) and ecrot_city_like was
  flat (1.62 -> 1.59): both are prime suspects for subsampling-induced
  LEGM systematic error (subsampling to 4M events multiplies the
  inter-event displacement |dp|, the known model-error axis — CLAUDE.md
  model-regime note) -> A/B the same rows UN-subsampled (max_events=0,
  streamed forming);
* the 4K compaction row showed zero RMSE gain at 16M events -> try more
  events (the poster's 4K maps come from 10^8-event streams).

Usage (TPU): python scripts/r4_triage.py [out.json]
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

OUT = sys.argv[1] if len(sys.argv) > 1 else ".cache/r4/triage.json"

# raw streams: ecd_dynamic_like 15.9M events (r3 subsample rate 4),
# ecrot_city_like 61.3M (rate 16 — the largest |dp| inflation of the suite)
ROWS = ["ecd_dynamic_like", "ecrot_city_like"]
ROWS_50_ONLY = ["ecrot_street_like", "ecd_boxes_like"]
COMMON = dict(pano_height=512, sensor=240, sensor_h=180, c_th=0.2,
              perturb=0.005, num_steps=1500)

results = []


def run(name, tag, **kw):
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    r = ES.run_sequence(f"{name}:{tag}", seed, motion, smooth, amp,
                        duration, **COMMON, **kw)
    results.append(r)
    print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
          f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} -> "
          f"{r['photometric_refined']:.1f} | {r['lm_iterations']} iters "
          f"(conv={r['converged']}) | {r['wall_s']:.1f}s", flush=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(results, f, indent=2)


for name in ROWS:
    # A: the r3 configuration but at the reference's 50-iteration regime
    run(name, "iters50", max_iter=50)
    # B: un-subsampled full stream (auto-streams; |dp| shrinks ~rate-fold)
    run(name, "iters50_full", max_iter=50, max_events=0)
for name in ROWS_50_ONLY:
    run(name, "iters50", max_iter=50)

# 4K row: 50 iters at 16M, then at 48M (the event-density hypothesis)
seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_bicycle_like"]
for n_ev, tag in ((16_000_000, "4k_50"), (48_000_000, "4k_50_48m")):
    kw4k = dict(COMMON, pano_height=2048)
    r = ES.run_sequence(
        f"ecrot_bicycle_like:{tag}", seed, motion, smooth, amp, duration,
        **kw4k, max_iter=50, compact_cap=1 << 21,
        outlier_dp=12.0, max_events=n_ev, stream=True,
    )
    results.append(r)
    print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
          f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} -> "
          f"{r['photometric_refined']:.1f} | {r['lm_iterations']} iters "
          f"(conv={r['converged']}) | {r['wall_s']:.1f}s", flush=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(results, f, indent=2)

print("wrote", OUT)
