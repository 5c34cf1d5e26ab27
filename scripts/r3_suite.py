"""Round-3 accuracy-artifact refresh (VERDICT r2 item 7): re-run the
ECRot-shaped suite at HEAD (round-2 kernel + round-3 two-tier streaming),
classic AND streamed, plus one 4K-pano compacted row.

Usage (TPU): python scripts/r3_suite.py [out.json]
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

OUT = sys.argv[1] if len(sys.argv) > 1 else "docs/suite_ecrot_like_r3.json"

results = []

# 1) the full reference-shaped suite, classic forming (as r1, at HEAD)
results += ES.run_ecrot_like(None)

# 2) three sequences with STREAMED forming at the same problem shape —
#    full (zero-residency) and light tier (accuracy must match classic)
for name in ("ecrot_bicycle_like", "ecrot_city_like", "ecd_poster_like"):
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    for tier, light in (("stream_full", False), ("stream_light", True)):
        r = ES.run_sequence(
            f"{name}:{tier}", seed, motion, smooth, amp, duration,
            pano_height=512, sensor=240, sensor_h=180, c_th=0.2,
            perturb=0.005, max_iter=30, num_steps=1500,
            stream=True, stream_light=light,
        )
        results.append(r)
        print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
              f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} "
              f"-> {r['photometric_refined']:.1f} | {r['wall_s']:.1f}s",
              flush=True)

# 3) one 4K-panorama row with active-pixel compaction (outlier cut scaled
#    with pano resolution: 3 px at 512-high -> 12 px at 2048-high). A 4K
#    map needs event DENSITY: at the classic rows' 4M-event subsample the
#    8.4M-pixel grid averages <1 event/pixel and thres_valid_pixel kills
#    the pose system (the poster's 4K maps come from 10^8-event streams) —
#    so this row runs 16M events through streamed forming.
seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_bicycle_like"]
r = ES.run_sequence(
    "ecrot_bicycle_like:4k_compact", seed, motion, smooth, amp, duration,
    pano_height=2048, sensor=240, sensor_h=180, c_th=0.2, perturb=0.005,
    max_iter=30, num_steps=1500, compact_cap=1 << 21, outlier_dp=12.0,
    max_events=16_000_000, stream=True,
)
results.append(r)
print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
      f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} -> "
      f"{r['photometric_refined']:.1f} | {r['wall_s']:.1f}s", flush=True)

with open(os.path.join(REPO, OUT), "w") as f:
    json.dump(results, f, indent=2)
print("wrote", OUT)
