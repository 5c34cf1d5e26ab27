"""Render docs/suite_table_ecrot_r3.md from docs/suite_ecrot_like_r3.json."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else "docs/suite_ecrot_like_r3.json"
DST = sys.argv[2] if len(sys.argv) > 2 else "docs/suite_table_ecrot_r3.md"

REF = {  # CMax-SLAM -> +EMBA published rows (BASELINE.md / poster)
    "ecrot_bicycle_like": "1.69 -> 0.92",
    "ecrot_city_like": "1.53 -> 0.97",
    "ecrot_street_like": "0.97 -> 0.74",
    "ecrot_town_like": "1.91 -> 0.86",
    "ecrot_bay_like": "1.80 -> 1.41",
    "ecrot_playroom_like": "3.22 -> 2.86",
}

rows = json.load(open(os.path.join(REPO, SRC)))
order = {name: i for i, name in enumerate(r["sequence"] for r in rows)}
rows.sort(key=lambda r: order[r["sequence"]])

lines = [
    "# Reference-shaped synthetic suite — round 3 (TPU v5e, f32, repo @HEAD)",
    "",
    "Problem shape mirrors the reference experiments: 240x180 sensor,",
    "1024x512 panorama (one 4096x2048 row), 4.8 s window (2.3 s playroom),",
    "dt_knots = 0.05 (97 control poses), C_th = 0.2, events systematically",
    "subsampled to <= 4M (the reference's own memory remedy,",
    "emba.cpp:282-304). Inits perturbed by a smooth random walk (~1.3-2.3 deg",
    "RMSE — the front-end error range of the paper's CMax-SLAM inits).",
    "`:stream_full` / `:stream_light` rows run the SAME problem through the",
    "two streamed-forming tiers (accuracy must match classic); the",
    "`:4k_compact` row uses active-pixel compaction (cap 2^21) and a",
    "resolution-scaled 12 px outlier cut. Regenerate:",
    "`python scripts/r3_suite.py` (TPU) + `python scripts/suite_table.py`.",
    "",
    "| sequence | events | RMSE init -> refined [deg] |"
    " (reference, real data) | photometric drop | iters | wall [s] |",
    "|---|---|---|---|---|---|",
]
for r in rows:
    drop = r["photometric_init"] / max(r["photometric_refined"], 1e-12)
    ref = REF.get(r["sequence"], "-")
    lines.append(
        f"| {r['sequence']} | {r['num_events']} "
        f"| {r['rmse_init_deg']:.2f} -> **{r['rmse_refined_deg']:.2f}** "
        f"| {ref} | {drop:.0f}x | {r['lm_iterations']} "
        f"| {r['wall_s']:.0f} |"
    )
lines += [
    "",
    "The reference column is its published real-data CMax-SLAM+EMBA result",
    "(BASELINE.md) — not directly comparable (different data), but the same",
    "contract: BA pulls a front-end-quality init toward GT while driving the",
    "photometric error down ~10-25x on every sequence. The weak rows",
    "(city/boxes/dynamic-like: finest texture or most aliasing under heavy",
    "subsampling) mirror the reference's own mixed rows, where some",
    "sequences barely improve or regress (EKF-SMT rows). The streamed rows",
    "reproduce the classic rows' accuracy exactly (same refined RMSE and",
    "photometric error), as the bit-equality tests predict.",
    "",
]
with open(os.path.join(REPO, DST), "w") as f:
    f.write("\n".join(lines))
print("wrote", DST)
