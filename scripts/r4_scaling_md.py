"""Render docs/scaling_model_r4.md from docs/scaling_model_r4.json
(produced by scripts/r4_scaling_model.py): HLO-derived per-iteration
collective volumes + a modeled multi-chip scaling-efficiency table.

Usage: python scripts/r4_scaling_md.py
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
d = json.load(open(os.path.join(REPO, "docs", "scaling_model_r4.json")))

# ---- hardware model (public v5e numbers; assumptions stated in the doc) ---
ICI_EFF_BPS = 100e9  # effective bidirectional-ring bandwidth per chip [B/s]
DCN_EFF_BPS = 25e9  # effective per-host DCN bandwidth [B/s]
EVENTS_PER_S_1CHIP = 6.58e6  # measured classic fused at 16M (docs/STATUS.md)
GLOBAL_EVENTS = 16_000_000


def wire_bytes_per_device(m):
    """Ring-algorithm wire bytes sent per device per LM iteration, from the
    instruction RESULT bytes in the JSON."""
    n = m["n_dev"]
    w = 0.0
    for c in m["per_iter"]:
        b = c["bytes"]
        if c["op"] == "all-reduce":
            w += 2.0 * b * (n - 1) / n  # result = full array
        elif c["op"] == "all-gather":
            w += b * (n - 1) / n  # result = gathered (full) array
        elif c["op"] == "reduce-scatter":
            w += (b * n) * (n - 1) / n  # result = 1/n chunk of the full sum
        elif c["op"] == "collective-permute":
            w += b  # point-to-point
        else:  # all-to-all
            w += b * (n - 1) / n
    return w


lines = [
    "# Multi-chip scaling model — round 4 (HLO-derived)",
    "",
    "Real multi-chip hardware is unavailable in this environment (one v5e",
    "chip via a tunnel), so this is the best obtainable evidence for the",
    "BASELINE.md >= 75% scaling-efficiency target: the per-iteration",
    "COLLECTIVE VOLUME of the production sharded LM window",
    "(`dist.make_solve_window_sharded`), extracted from the actual compiled",
    "SPMD program on virtual 2/4/8-device meshes at the production problem",
    "shape (240x180 sensor, 1024x512 pano, 97 knots, full map row space,",
    "classic forming, Schur solve). Collective decisions and byte volumes",
    "are properties of the HLO partitioning, not the execution backend; only",
    "link timings are modeled. Raw data: `docs/scaling_model_r4.json`;",
    "regenerate: `scripts/r4_scaling_model.py` + `scripts/r4_scaling_md.py`.",
    "",
    "Collective volumes are EVENT-COUNT INDEPENDENT: the halo exchange",
    "carries O(sensor-pixel) payloads, and the reductions carry pose-block /",
    "map-row-domain objects. Per-event data never crosses the wire.",
    "",
    "## Per-iteration collectives (instruction result bytes, compiled HLO)",
    "",
    "| devices | collectives | all-reduce | reduce-scatter | all-gather |"
    " collective-permute | total result MB |",
    "|---|---|---|---|---|---|---|",
]
for m in d["meshes"]:
    by = m["per_iter_bytes_by_op"]
    lines.append(
        f"| {m['n_dev']} | {len(m['per_iter'])} "
        f"| {by.get('all-reduce', 0)/1e6:.1f} MB "
        f"| {by.get('reduce-scatter', 0)/1e6:.1f} MB "
        f"| {by.get('all-gather', 0)/1e6:.1f} MB "
        f"| {by.get('collective-permute', 0)/1e6:.1f} MB "
        f"| {m['per_iter_total_bytes']/1e6:.1f} |"
    )

lines += [
    "",
    "What each is (matched to the op_name metadata in the HLO):",
    "",
    "* **reduce-scatter** — the map-domain normal-equation blocks (A12 +",
    "  A22/b2 rows) summed over event shards with each device keeping its",
    "  row chunk for the distributed Schur reduction. This round replaced",
    "  the previous psum+slice (a FULL 1.6 GB all-reduce per iteration at",
    "  this row space) with `jax.lax.psum_scatter` — half the wire bytes",
    "  and a 1/n-size result per device.",
    "* **all-reduce** — the pose block (A11 ~340 KB, b1), the psum'd",
    "  activity map (s32 HW, 2.1 MB), partial Schur S, cost/Np/dropped",
    "  scalars.",
    "* **all-gather** — x2 (2 x row-space f32, 4.2 MB) re-assembled for the",
    "  replicated map update.",
    "* **collective-permute** — the log-depth halo prefix fold resolving",
    "  cross-shard event pairing (O(sensor pixels) payload per round;",
    "  log2(n) rounds, hence the growth with device count).",
    "",
    "## Modeled scaling efficiency",
    "",
    "Assumptions: per-chip effective ring bandwidth "
    f"{ICI_EFF_BPS/1e9:.0f} GB/s (v5e ICI spec 1600 Gbps/chip aggregate;",
    "bidirectional ring uses ~half), measured single-chip LM iteration",
    f"throughput {EVENTS_PER_S_1CHIP/1e6:.2f}M events/s (classic fused at",
    f"16M events, docs/STATUS.md), global problem {GLOBAL_EVENTS//10**6}M",
    "events (one reference-scale window). Wire bytes use standard ring",
    "algorithm costs: all-reduce 2S(n-1)/n, reduce-scatter/all-gather",
    "S(n-1)/n per device, collective-permute = payload.",
    "",
    "| devices | t_compute/iter | wire bytes/device | t_comm | modeled"
    " speedup | efficiency |",
    "|---|---|---|---|---|---|",
]
t1 = GLOBAL_EVENTS / EVENTS_PER_S_1CHIP
rows_dcn = []
for m in d["meshes"]:
    n = m["n_dev"]
    tc = GLOBAL_EVENTS / n / EVENTS_PER_S_1CHIP
    w = wire_bytes_per_device(m)
    tm = w / ICI_EFF_BPS
    sp = t1 / (tc + tm)
    lines.append(
        f"| {n} | {tc*1e3:.0f} ms | {w/1e6:.0f} MB | {tm*1e3:.1f} ms "
        f"| {sp:.2f}x | **{sp/n*100:.1f}%** |"
    )
    rows_dcn.append((n, tc, w))

lines += [
    "",
    "### Cross-host (DCN) variant",
    "",
    f"Same volumes with the slowest hop over DCN at {DCN_EFF_BPS/1e9:.0f}",
    "GB/s per host (2 hosts, hierarchical reduction: the inter-host segment",
    "carries the full reduced objects once):",
    "",
    "| devices (2 hosts) | t_comm (ICI + DCN) | modeled efficiency |",
    "|---|---|---|",
]
for n, tc, w in rows_dcn:
    if n < 4:
        continue
    # hierarchical: intra-host ring + one inter-host exchange of the
    # host-reduced objects (approximate with the same per-device volume
    # crossing DCN once at host granularity)
    tm = w / ICI_EFF_BPS + w / DCN_EFF_BPS
    sp = t1 / (tc + tm)
    lines.append(f"| {n} | {tm*1e3:.1f} ms | **{sp/n*100:.1f}%** |")

lines += [
    "",
    "Both regimes clear the >= 75% BASELINE target with a wide margin at",
    "reference-scale windows: one LM iteration moves ~0.2-0.8 GB of",
    "reduced normal equations while computing 2-8 M events' linearization +",
    "accumulation (~0.3-1.2 s). The model's weakest assumption is the",
    "effective ring bandwidth; even at 4x worse ICI the 8-chip efficiency",
    "stays above 75% (t_comm 14 ms -> 58 ms vs t_compute 304 ms -> 84%).",
    "",
    "Caveat: compiled on the CPU backend (SPMD partitioning is backend-",
    "independent at the HLO level, but TPU-specific passes could fuse or",
    "split collectives differently); one real v5e chip cannot execute the",
    "multi-chip program, so wall-clock validation stays hardware-blocked",
    "(docs/STATUS.md).",
    "",
]
out = os.path.join(REPO, "docs", "scaling_model_r4.md")
with open(out, "w") as f:
    f.write("\n".join(lines))
print("wrote", out)
