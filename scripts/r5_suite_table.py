"""Render docs/suite_table_ecrot_r5.md from docs/suite_ecrot_like_r5.json
(+ the round-4 baseline rows in docs/suite_ecrot_like_r4.json for the A/B
columns).

Round-5 layout (VERDICT r4 items 1 and 4): the LEGM |dp|-error attack —
midpoint sampling, coarse-to-fine, their composition, multi-start with
GT-free photometric selection — plus the robust-cost capability rows on
contaminated streams.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC5 = sys.argv[1] if len(sys.argv) > 1 else "docs/suite_ecrot_like_r5.json"
SRC4 = "docs/suite_ecrot_like_r4.json"
DST = sys.argv[2] if len(sys.argv) > 2 else "docs/suite_table_ecrot_r5.md"

r5 = {r["sequence"]: r for r in json.load(open(os.path.join(REPO, SRC5)))}
r4 = {r["sequence"]: r for r in json.load(open(os.path.join(REPO, SRC4)))}

BASE = [
    "ecrot_bicycle_like", "ecrot_city_like", "ecrot_street_like",
    "ecrot_town_like", "ecrot_bay_like", "ecrot_playroom_like",
    "ecd_shapes_like", "ecd_poster_like", "ecd_boxes_like",
    "ecd_dynamic_like",
]
REF = {  # CMax-SLAM -> +EMBA published rows (BASELINE.md)
    "ecrot_bicycle_like": "1.69 -> 0.92",
    "ecrot_city_like": "1.53 -> 0.97",
    "ecrot_street_like": "0.97 -> 0.74",
    "ecrot_town_like": "1.91 -> 0.86",
    "ecrot_bay_like": "1.80 -> 1.41",
    "ecrot_playroom_like": "3.22 -> 2.86",
}


def rr(r):
    return r["rmse_refined_deg"]


def cell(r):
    return f"{r['rmse_init_deg']:.2f} -> **{rr(r):.2f}**"


L = [
    "# LEGM |dp|-error attack + robust costs — round 5 (TPU v5e, f32, repo @HEAD)",
    "",
    "Same problem shape and 50-iteration regime as the round-4 suite",
    "(docs/suite_table_ecrot_r4.md; 240x180 sensor, 1024x512 pano, 4.8 s,",
    "97 knots, C_th=0.2). The round-4 'curr' rows are the baselines (the",
    "curr path is bit-identical at this HEAD). Regenerate:",
    "`python scripts/r5_suite.py` + `python scripts/r5_suite_table.py`.",
    "",
    "Variants: `mid` = midpoint-rule LEGM sampling",
    "(ModelConfig.sample_mode — O(|dp|^3) quadrature error vs the reference",
    "rectangle rule's O(|dp|^2), zero extra cost); `c2f` = coarse-to-fine",
    "(pose pre-solved at a half-resolution pano, where |dp| in pixels",
    "halves); `auto` = MULTI-START: all four (mid x c2f) variants solved,",
    "winner selected by refined photometric error under ONE fixed",
    "evaluation model — **GT-free**, production-usable selection.",
    "",
    "## Per-variant refined RMSE [deg] (init identical per row)",
    "",
    "| sequence | init | curr (r4) | mid | c2f | mid+c2f |"
    " **auto (multi-start)** | selected | (reference, real data) |",
    "|---|---|---|---|---|---|---|---|---|",
]
for n in BASE:
    b4 = r4.get(n)
    cells = [n, f"{r5[n + ':mid']['rmse_init_deg']:.2f}" if n + ":mid" in r5
             else "-"]
    cells.append(f"{rr(b4):.2f}" if b4 else "-")
    for tag in (":mid", ":c2f", ":mid_c2f"):
        r = r5.get(n + tag)
        cells.append(f"{rr(r):.2f}" if r else "-")
    a = r5.get(n + ":auto")
    cells.append(f"**{rr(a):.2f}**" if a else "-")
    cells.append(a.get("selected_variant", "-") if a else "-")
    cells.append(REF.get(n, "-"))
    L.append("| " + " | ".join(cells) + " |")

means = {}
for col, get in (
    ("curr", lambda n: r4.get(n)),
    ("mid", lambda n: r5.get(n + ":mid")),
    ("auto", lambda n: r5.get(n + ":auto")),
):
    vals = [rr(get(n)) for n in BASE if get(n)]
    if vals:
        means[col] = sum(vals) / len(vals)

L += [""]
fa = r5.get("ecd_dynamic_like:full_auto")
if fa:
    L += [
        f"Multi-start composes with streamed forming at scale: the FULL",
        f"un-subsampled `ecd_dynamic_like` stream ({fa['num_events']:,}",
        f"events) refines {fa['rmse_init_deg']:.2f} ->",
        f"**{fa['rmse_refined_deg']:.2f}** under `auto`",
        f"({fa['wall_s']:.0f} s, selected {fa.get('selected_variant')}) —",
        "the r4 full-stream single-variant result was 1.60.",
    ]
L += [
    "",
    f"Suite means: curr {means.get('curr', float('nan')):.3f} deg, "
    f"mid {means.get('mid', float('nan')):.3f} deg, "
    f"**auto {means.get('auto', float('nan')):.3f} deg**.",
    "",
    "### Reading",
    "",
    "* `mid` and `c2f` each move individual rows dramatically in BOTH",
    "  directions (mid: street 1.54->0.18 but bicycle 0.26->0.68; c2f:",
    "  dynamic 1.92->0.31 but boxes flat) — the LEGM landscape is",
    "  multi-basin on high-texture rows, and each variant is an",
    "  independent start, not a uniform improvement.",
    "* The GT-free photometric selector makes `auto` the recommended",
    "  configuration: it matches or improves the reference formulation on",
    "  every row but one (bay, by 0.02 deg), NEVER inherits a variant's",
    "  catastrophic loss (mid alone would cost bicycle 0.26->0.68, shapes",
    "  0.42->1.28, poster 1.03->1.41), and lands within the best variant",
    "  on 8/10 rows. Its two misses are honest selector limits: boxes",
    "  (mid+c2f reaches 0.20 but scores a HIGHER photometric cost) and",
    "  bay (picks 0.31 over mid's 0.17). The boxes miss is NOT a",
    "  map-keying artifact: re-scoring every candidate with a freshly",
    "  solved map under the fixed evaluation model (closed-form",
    "  solve_map_only per candidate) leaves the ranking unchanged —",
    "  measured negative, docs/remap_selection_probe_r5.json — the",
    "  photometric landscape itself prefers the wrong basin there. Cost",
    "  is 4x the window solve (~40-60 s per variant on one chip; the",
    "  variants are independent and could run on 4 chips in parallel).",
    "",
    "## The hardest row: ecrot_city_like compositions",
    "",
    "| configuration | RMSE init -> refined [deg] | iters | wall [s] |",
    "|---|---|---|---|",
]
for tag, label in (
    ("", "subsampled 4M, curr (r4)"),
    (":full", "full 61.4M stream, curr (r4)"),
    (":full_mid", "full stream + mid"),
    (":full_c2f", "full stream + c2f"),
    (":full_mid_c2f", "full stream + mid + c2f"),
):
    r = (r4 if tag in ("", ":full") else r5).get(f"ecrot_city_like{tag}")
    if r:
        L.append(
            f"| {label} | {cell(r)} | {r['lm_iterations']} | "
            f"{r['wall_s']:.0f} |"
        )
L += [
    "",
    "City converges to ~1.37 deg under EVERY strong configuration (full",
    "stream, midpoint, coarse-to-fine, and their composition) — five",
    "independent optimizers landing on the same value is evidence of a",
    "problem-intrinsic floor, not an optimizer failure. City pairs the",
    "suite's sharpest texture (smooth=2) with its fastest motion (0.30):",
    "the map gradient varies substantially over the inter-event",
    "displacement, so ANY one-point quadrature of G.dp (curr or midpoint)",
    "carries irreducible model error — the LEGM regime bound itself",
    "(CLAUDE.md model-regime note), which the reference's own mixed",
    "real-data rows exhibit. The relative drop improves from 12% (r4 full",
    "stream) to 16% (full+mid / full+c2f).",
    "",
    "## Robust costs on contaminated streams (model.cpp:493-687 parity",
    "as a measured CAPABILITY)",
    "",
    "60% injected gross errors (polarity flips + same-polarity hot-pixel",
    "bursts — the mix that survives the |dp| outlier gate; purely",
    "positional noise is rejected by the gate, and the joint solve's",
    "per-pixel map DOF absorb event-level corruption below ~20%, both",
    "measured):",
    "",
    "| contamination | cost | RMSE init -> refined [deg] | iters | wall [s] |",
    "|---|---|---|---|---|",
]
for lvl in ("40", "60"):
    for tag, label in (
        (f"contam{lvl}_quad", "quadratic"),
        (f"contam{lvl}_huber", "huber (eta=0.2)"),
        (f"contam{lvl}_cauchy", "cauchy (eta=25)"),
    ):
        r = r5.get(f"ecrot_bicycle_like:{tag}")
        if r:
            L.append(
                f"| {lvl}% | {label} | {cell(r)} | {r['lm_iterations']} | "
                f"{r['wall_s']:.0f} |"
            )
L += [
    "",
    "(clean-row reference: 1.89 -> 0.26). IRLS separates gross errors from",
    "the LEGM model-error floor only once contamination dominates;",
    "at realistic (<20%) rates quadratic BA is already robust here —",
    "an honest negative at those rates, measured in the round-5 probes.",
    "",
    "## Multi-seed robustness of `auto` (same row family, fresh scene +",
    "perturbation draws)",
    "",
    "| family | seed draw | RMSE init -> refined [deg] |",
    "|---|---|---|",
]
for fam in ("ecrot_bicycle_like", "ecrot_street_like", "ecd_dynamic_like"):
    for tag, lbl in (("", "original"), (":auto_s100", "+100"),
                     (":auto_s200", "+200")):
        key = f"{fam}:auto" if tag == "" else f"{fam}{tag}"
        r = r5.get(key)
        if r:
            L.append(f"| {fam} | {lbl} | {cell(r)} |")
L += [
    "",
    "7/9 draws refine to <= 0.78 deg. The two plateaued draws (bicycle",
    "+100 at 1.72, street +100 at 1.50) start from larger perturbations",
    "(1.83/1.98 deg init) on fresh sharp-texture scenes; doubling the",
    "iteration budget does not move them (bicycle +100 with",
    "max_num_iter=100: 521 total iterations across the four starts, RMSE",
    "1.715 vs 1.718 — basin/regime-bound, not iteration-bound; photometric",
    "still drops 10.8x). This is the LEGM 'cost drops but RMSE flat'",
    "regime the reference's own real-data rows exhibit (CLAUDE.md",
    "model-regime note) — `auto` widens the basin substantially but does",
    "not eliminate it.",
    "",
]

with open(os.path.join(REPO, DST), "w") as f:
    f.write("\n".join(L) + "\n")
print("wrote", DST)
