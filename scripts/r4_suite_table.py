"""Render docs/suite_table_ecrot_r4.md from docs/suite_ecrot_like_r4.json.

Round-4 layout (VERDICT r3 item 1): base rows at the reference's
max_num_iter=50 regime, un-subsampled ``:full`` A/B rows for the weak
sequences, streamed-tier parity rows, order-4 / light-trial rows, and the
two-stage 4K row — each weak row gets an evidence-backed diagnosis drawn
from the A/B data itself.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else "docs/suite_ecrot_like_r4.json"
DST = sys.argv[2] if len(sys.argv) > 2 else "docs/suite_table_ecrot_r4.md"

REF = {  # CMax-SLAM -> +EMBA published rows (BASELINE.md / poster)
    "ecrot_bicycle_like": "1.69 -> 0.92",
    "ecrot_city_like": "1.53 -> 0.97",
    "ecrot_street_like": "0.97 -> 0.74",
    "ecrot_town_like": "1.91 -> 0.86",
    "ecrot_bay_like": "1.80 -> 1.41",
    "ecrot_playroom_like": "3.22 -> 2.86",
}

rows = {r["sequence"]: r for r in json.load(open(os.path.join(REPO, SRC)))}


def fmt(r, ref=True):
    drop = r["photometric_init"] / max(r["photometric_refined"], 1e-12)
    base = r["sequence"].split(":")[0]
    cells = [
        r["sequence"],
        f"{r['num_events']:,}",
        f"{r['rmse_init_deg']:.2f} -> **{r['rmse_refined_deg']:.2f}**",
    ]
    if ref:
        cells.append(REF.get(base, "-"))
    cells += [f"{drop:.0f}x", str(r["lm_iterations"]), f"{r['wall_s']:.0f}"]
    return "| " + " | ".join(cells) + " |"


L = [
    "# Reference-shaped synthetic suite — round 4 (TPU v5e, f32, repo @HEAD)",
    "",
    "Problem shape mirrors the reference experiments: 240x180 sensor,",
    "1024x512 panorama, 4.8 s window (2.3 s playroom), dt_knots = 0.05",
    "(97 control poses), C_th = 0.2, inits perturbed by a smooth random walk",
    "(~1.3-2.3 deg RMSE — the front-end error range of the paper's CMax-SLAM",
    "inits). **All rows run the reference's launch-file iteration regime,",
    "max_num_iter=50** (launch/bicycle.launch:58; the r3 tables capped at 30",
    "and saturated the cap). Regenerate: `python scripts/r4_suite.py` (TPU) +",
    "`python scripts/r4_suite_table.py`.",
    "",
    "## Base rows (events subsampled to <= 4M, the reference's own memory",
    "remedy — emba.cpp:282-304)",
    "",
    "| sequence | events | RMSE init -> refined [deg] |"
    " (reference, real data) | photometric drop | iters | wall [s] |",
    "|---|---|---|---|---|---|",
]
BASE = [
    "ecrot_bicycle_like", "ecrot_city_like", "ecrot_street_like",
    "ecrot_town_like", "ecrot_bay_like", "ecrot_playroom_like",
    "ecd_shapes_like", "ecd_poster_like", "ecd_boxes_like",
    "ecd_dynamic_like",
]
for n in BASE:
    if n in rows:
        L.append(fmt(rows[n]))

L += [
    "",
    "The reference column is its published real-data CMax-SLAM+EMBA result",
    "(BASELINE.md) — different data, same contract: BA pulls a",
    "front-end-quality init toward GT while driving photometric error down",
    "~10-25x on every sequence. The subsampled `ecd_dynamic_like` row is",
    "kept as the diagnostic ablation of the subsampling artifact analyzed",
    "in the next section; the framework's production configuration for that",
    "sequence (the full stream — streaming is the default, subsampling is",
    "opt-in) refines 1.92 -> 1.60.",
    "",
    "## Un-subsampled full-stream A/B (the weak-row triage)",
    "",
    "The r3 weak rows (`ecd_dynamic_like` regressed, `ecrot_city_like`",
    "flat) are diagnosed by re-running the SAME problem on the full",
    "un-subsampled stream (`max_events=0`; streamed forming — something the",
    "reference cannot do, since subsampling IS its memory remedy):",
    "",
    "| sequence | events | RMSE init -> refined [deg] |"
    " photometric drop | iters | wall [s] |",
    "|---|---|---|---|---|---|",
]
for n in BASE:
    k = f"{n}:full"
    if k in rows:
        L.append(fmt(rows[k], ref=False))

dyn, dynf = rows.get("ecd_dynamic_like"), rows.get("ecd_dynamic_like:full")
cty, ctyf = rows.get("ecrot_city_like"), rows.get("ecrot_city_like:full")
if dyn and dynf and cty and ctyf:
    L += [
        "",
        "**Diagnosis (evidence above):** systematic subsampling multiplies",
        "the inter-event displacement |dp| by the sampling rate, and |dp| is",
        "the LEGM linearization's systematic-error axis (the model Taylor-",
        "expands the map around the PREVIOUS event at the same pixel —",
        "model.cpp:150-258). `ecd_dynamic_like` (15.9M raw events, rate 4)",
        f"regresses {dyn['rmse_init_deg']:.2f} -> "
        f"{dyn['rmse_refined_deg']:.2f} subsampled but refines to "
        f"**{dynf['rmse_refined_deg']:.2f}** on the full stream; "
        "`ecrot_city_like` (61.3M raw",
        f"events, rate 16 — the largest |dp| inflation of the suite) is flat",
        f"subsampled ({cty['rmse_init_deg']:.2f} -> "
        f"{cty['rmse_refined_deg']:.2f}) but refines to "
        f"**{ctyf['rmse_refined_deg']:.2f}** at full density. The remaining",
        "still-flat base rows (`ecd_boxes_like`, `ecrot_street_like`) carry",
        "the same signature (finest texture -> largest |dp| per pixel pair);",
        "their raw streams fit the 4M budget at rates 2-3, so the residual",
        "gap is the LEGM regime itself (CLAUDE.md model-regime note), which",
        "the reference's own mixed EKF-SMT rows exhibit on real data.",
    ]

L += [
    "",
    "## Streamed-tier parity (accuracy must match classic)",
    "",
    "| sequence | events | RMSE init -> refined [deg] |"
    " photometric drop | iters | wall [s] |",
    "|---|---|---|---|---|---|",
]
for n in ("ecrot_bicycle_like", "ecrot_city_like", "ecd_poster_like"):
    for tag in ("stream_full", "stream_light"):
        k = f"{n}:{tag}"
        if k in rows:
            L.append(fmt(rows[k], ref=False))
L += [
    "",
    "Both streamed tiers land on the classic rows' refined RMSE to within",
    "~0.01 deg and the same photometric error (same problem, same",
    "50-iteration budget). Per-iteration the tiers are bit-equal in the f64",
    "tests (tests/test_model.py, test_dist.py); over 50 f32 iterations the",
    "different reduction order accumulates the tiny residual spread seen",
    "here.",
    "",
    "## Order-4 (cubic trajectory) and light-trial rows",
    "",
    "| sequence | events | RMSE init -> refined [deg] |"
    " photometric drop | iters | wall [s] |",
    "|---|---|---|---|---|---|",
]
for k in ("ecrot_bicycle_like:order4", "ecrot_bicycle_like:light_trial"):
    if k in rows:
        L.append(fmt(rows[k], ref=False))
L += [
    "",
    "`:order4` runs the FULL depth cubic path (D=12 blocks through forming,",
    "Pallas kernel, Schur) on a cubic-refit GT trajectory",
    "(trajectory.cpp:481-626 parity); `:light_trial` uses cost-only LM",
    "trials (relinearize-on-accept).",
    "",
    "## 4K (4096x2048) — the reference's two-stage production path",
    "",
]
k4 = rows.get("ecrot_bicycle_like:4k_two_stage")
if k4:
    L += [
        f"Scene: two-scale brightness (coarse structure at the 1K feature",
        "scale + fine 4K-only detail — single-scale 4K texture is sub-pixel",
        "at 1K and buries the pose signal in LEGM model error; real 4K",
        f"scenes are broad-spectrum), {k4['num_events']:,} events",
        "(subsampled to <= 16M for the 1K stage).",
        "",
        "| stage | RMSE [deg] | photometric (4K) | iters | wall [s] |",
        "|---|---|---|---|---|",
        f"| init (perturbed pose, GT 4K map) | {k4['rmse_init_deg']:.2f} | "
        f"{k4['photometric_init']:.0f} | - | - |",
        f"| stage 1: joint pose+map BA at 1024x512 | "
        f"**{k4['rmse_stage1_deg']:.2f}** |"
        f" - | {k4['lm_iterations']} | - |",
        f"| stage 2: full-grid 4K map via `solve_map_only` | "
        f"{k4['rmse_refined_deg']:.2f} | "
        f"{k4['photometric_refined']:.0f} | 1 (closed form) | "
        f"{k4['wall_s']:.0f} (both) |",
        "",
        "Round-3's direct joint 4K refinement row was RMSE-flat; triage",
        "showed why: at achievable synthetic event densities (~4 events per",
        "active 4K pixel) the map block can absorb the residuals, so the",
        "Schur-reduced pose gradient b1 - A12 A22^-1 b2 ~= 0 — measured",
        "flat at 50 iters, more events (32M), AND 10x map regularization.",
        "The reference's own 4K outputs are maps rendered from 1K-refined",
        "trajectories (poster: 240x180 -> 4K super-resolution maps; no 4K",
        "RMSE is published). This row reproduces that production path:",
        "refine the pose at 1K (joint BA), then solve the FULL 8.4M-pixel",
        "4K map closed-form with the pose fixed (`model.solve_map_only` —",
        "the residual is affine in G, so one per-pixel 2x2 solve is the",
        "exact regularized minimizer; no compaction cap, no dropped",
        "pixels, O(HW) memory — the joint path's dense A12 at 4K is 6.4 GB",
        "and OOMs the chip). The stage-2 photometric error is measured",
        "against the solved 4K map at the refined pose; the zero-map",
        f"baseline is {k4.get('photometric_4k_zero_map', 0):.0f}.",
    ]
L.append("")
with open(os.path.join(REPO, DST), "w") as f:
    f.write("\n".join(L))
print("wrote", DST)
