"""Round-5 accuracy A/B (VERDICT r4 item 1): attack the LEGM |dp|
linearization error on the weak high-texture rows.

Variants (A = round-4 baseline rows in docs/suite_ecrot_like_r4.json —
the "curr" path is bit-identical at this HEAD, so they are reused):

* ``:mid``      — midpoint-rule sampling (ModelConfig.sample_mode="mid"):
                  O(|dp|^3) quadrature error instead of O(|dp|^2), zero cost.
* ``:c2f``      — coarse-to-fine: pose pre-solve at a half-resolution pano
                  (|dp| in pixels halves), then full-res refine.
* ``:mid_c2f``  — both composed (weak rows only).

All rows run the reference's max_num_iter=50 regime
(launch/bicycle.launch:58). Usage (TPU): python scripts/r5_suite.py [out]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

from emba_tpu import eval_suite as ES  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "docs/suite_ecrot_like_r5.json"
results = []
if os.path.exists(os.path.join(REPO, OUT)):
    results = json.load(open(os.path.join(REPO, OUT)))
    print(f"resuming: {len(results)} rows already in {OUT}", flush=True)
_done = {r["sequence"] for r in results}


def save():
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(results, f, indent=2)


def log(r):
    print(f"{r['sequence']}: rmse {r['rmse_init_deg']:.3f} -> "
          f"{r['rmse_refined_deg']:.3f} | pe {r['photometric_init']:.1f} -> "
          f"{r['photometric_refined']:.1f} | {r['lm_iterations']} iters "
          f"(conv={r.get('converged')}) | {r['wall_s']:.1f}s", flush=True)


def run_row(tag, *a, **kw):
    if tag in _done:
        print(f"skip {tag} (done)", flush=True)
        return
    for attempt in range(3):
        try:
            r = ES.run_sequence(tag, *a, **kw)
            break
        except Exception as e:  # noqa: BLE001 — remote transport flakes
            if attempt == 2:
                raise
            print(f"{tag}: attempt {attempt} failed ({type(e).__name__}: "
                  f"{e}); retrying in 30s", flush=True)
            time.sleep(30)
    results.append(r)
    _done.add(tag)
    log(r)
    save()


KW = dict(pano_height=512, sensor=240, sensor_h=180, c_th=0.2,
          perturb=0.005, num_steps=1500, max_iter=50)

WEAK = ("ecrot_city_like", "ecrot_street_like", "ecd_boxes_like",
        "ecd_dynamic_like")

# 1) midpoint on EVERY base row (the no-regression requirement)
for name, (seed, motion, smooth, amp, duration) in ES.ECROT_LIKE.items():
    run_row(f"{name}:mid", seed, motion, smooth, amp, duration, **KW,
            sample_mode="mid")

# 2) midpoint on the un-subsampled full streams of the weak rows
for name in ("ecrot_city_like", "ecd_dynamic_like"):
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    run_row(f"{name}:full_mid", seed, motion, smooth, amp, duration, **KW,
            max_events=0, sample_mode="mid")

# 3) coarse-to-fine on the weak rows (curr sampling)
for name in WEAK:
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    run_row(f"{name}:c2f", seed, motion, smooth, amp, duration, **KW,
            coarse_to_fine=True)

# 4) both composed, weak rows
for name in WEAK:
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    run_row(f"{name}:mid_c2f", seed, motion, smooth, amp, duration, **KW,
            sample_mode="mid", coarse_to_fine=True)

# 4b) city stays the hardest row: un-subsampled full stream + c2f (and the
#     midpoint composition) — smallest |dp| (full density) plus the coarse
#     basin guide
for tag, kw in (("full_c2f", {}), ("full_mid_c2f", dict(sample_mode="mid"))):
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_city_like"]
    run_row(f"ecrot_city_like:{tag}", seed, motion, smooth, amp, duration,
            **KW, max_events=0, coarse_to_fine=True, **kw)

# 5) robust-cost capability rows (VERDICT r4 item 4): 60% contamination
#    (polarity flips + same-polarity hot-pixel bursts — the gross-error mix
#    that survives the |dp| gate and the map-DOF absorption floor, see
#    eval_suite contamination note). quad degrades; huber/cauchy recover.
seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecrot_bicycle_like"]
for tag, kw in (
    ("contam60_quad", {}),
    # eta tracks the gross-error scale 2*C_th = 0.4 (c_th=0.2 here):
    # huber eta ~= C_th keeps the model-error inliers quadratic; cauchy
    # eta=25 puts weight ~0.2 on the flip residuals (1/(1+25*0.4^2))
    ("contam60_huber", dict(irls="huber", eta=0.2)),
    ("contam60_cauchy", dict(irls="cauchy", eta=25.0)),
):
    run_row(f"ecrot_bicycle_like:{tag}", seed, motion, smooth, amp,
            duration, **KW, contaminate=0.6, **kw)

# 5b) 40% severity point (partial-recovery regime: clearer separation)
for tag, kw in (
    ("contam40_quad", {}),
    ("contam40_huber", dict(irls="huber", eta=0.2)),
    ("contam40_cauchy", dict(irls="cauchy", eta=25.0)),
):
    run_row(f"ecrot_bicycle_like:{tag}", seed, motion, smooth, amp,
            duration, **KW, contaminate=0.4, **kw)

# 6) MULTI-START rows: all four (sample_mode x c2f) variants per sequence,
#    winner selected by refined photometric error under the reference
#    evaluation model (GT-free) — the recommended accuracy configuration.
for name, (seed, motion, smooth, amp, duration) in ES.ECROT_LIKE.items():
    run_row(f"{name}:auto", seed, motion, smooth, amp, duration, **KW,
            multi_start=True)

# 7) multi-seed robustness of the :auto configuration — same row family,
#    different scene + perturbation draws (the suite rows are single
#    draws; this bounds seed luck on the headline mean)
for name in ("ecrot_bicycle_like", "ecrot_street_like", "ecd_dynamic_like"):
    seed, motion, smooth, amp, duration = ES.ECROT_LIKE[name]
    for ds in (100, 200):
        run_row(f"{name}:auto_s{ds}", seed + ds, motion, smooth, amp,
                duration, **KW, multi_start=True)

print("wrote", OUT)
