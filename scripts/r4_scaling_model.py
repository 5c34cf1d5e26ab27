"""HLO-derived multi-chip scaling model (VERDICT r3 item 8).

Real multi-chip hardware is unavailable in this environment (one v5e chip
through a tunnel), so this extracts the per-iteration COLLECTIVE VOLUME of
the production sharded LM window from the actual compiled SPMD program:
lower `dist.make_solve_window_sharded` on virtual 2/4/8-device meshes at
the production problem shape (240x180 sensor, 1024x512 pano, 97 knots),
parse every collective instruction (all-reduce / all-gather /
collective-permute / reduce-scatter / all-to-all) out of the optimized HLO
with its shape and owning computation, and model scaling efficiency against
the measured single-chip iteration time and public v5e ICI bandwidth.

The SPMD partitioner's collective DECISIONS and byte volumes are properties
of the HLO partitioning, not of the execution backend; only the link
timings are modeled. Writes docs/scaling_model_r4.json; the committed
docs/scaling_model_r4.md is generated from it.

Usage (CPU): PYTHONPATH= JAX_PLATFORMS=cpu python scripts/r4_scaling_model.py
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emba_tpu import dist, model, pairing, synth  # noqa: E402

# ---- production problem shape (SURVEY.md §6) -------------------------------
SENSOR_W, SENSOR_H = 240, 180
PANO_H = 512
DT_KNOTS = 0.05
T_END = 4.8  # 97 knots
N_EVENTS = 1 << 20  # collective volumes are event-count independent

DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
               "f16": 2, "s64": 8, "u64": 8, "u8": 1, "s8": 1}

_OPS = ("all-reduce", "all-gather", "collective-permute", "reduce-scatter",
        "all-to-all")
_SHAPE_RE = re.compile(r"(f32|f64|bf16|f16|s32|u32|s64|u64|pred|u8|s8)\[([0-9,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def shape_bytes(type_str: str) -> int:
    """Total bytes of all array shapes in an HLO type string (handles
    tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def extract_collectives(hlo: str):
    """(op_name_metadata, op, result_bytes) for every collective
    instruction in the optimized module. The instruction's RESULT type (a
    tuple for fused psums) gives the byte volume; the op_name metadata path
    (".../while/body/...") attributes it to the LM while body (per
    iteration) vs one-time setup."""
    out = []
    for line in hlo.splitlines():
        if " = " not in line:
            continue
        for op in _OPS:
            if f" {op}(" in line or f" {op}-start(" in line:
                typ = line.split(" = ", 1)[1].split(op, 1)[0]
                mo = _OPNAME_RE.search(line)
                out.append((mo.group(1) if mo else "?", op, shape_bytes(typ)))
                break
    return out


def build_problem():
    rng = np.random.default_rng(11)
    sensor = synth.default_sensor(SENSOR_W, SENSOR_H, f=SENSOR_W * 0.9)
    scene = synth.generate(
        rng, sensor, pano_width=2 * PANO_H, pano_height=PANO_H, c_th=0.2,
        t_end=T_END, dt_knots=DT_KNOTS, num_steps=400, motion_amp=0.2,
    )
    cfg = model.ModelConfig(
        c_th=0.2, pano_width=2 * PANO_H, pano_height=PANO_H,
        thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0,
    )
    n = min(N_EVENTS, len(scene.t))
    win = pairing.build_window(
        scene.t[:n], scene.x[:n], scene.y[:n], scene.pol[:n], sensor.width,
        scene.traj.locate, 100,
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float32
    )
    return scene, cfg, dev


def collectives_for_mesh(scene, cfg, dev, n_dev: int):
    mesh = dist.make_mesh(n_dev, 1, jax.devices()[:n_dev])
    dev_p = dist.pad_window(dev, n_dev * (1 << 10))
    solve = dist.make_solve_window_sharded(
        mesh, cfg, scene.traj.num_knots, SENSOR_W * SENSOR_H,
        fix_first=True, max_num_iter=50,
    )
    args = (
        *dist.replicate(
            mesh,
            jnp.asarray(scene.traj.knots, jnp.float32),
            jnp.asarray(scene.gx, jnp.float32),
            jnp.asarray(scene.gy, jnp.float32),
        ),
        dist.shard_window_all(dev_p, mesh),
        jnp.asarray(1.0, jnp.float32),
        jnp.asarray(1e-3, jnp.float32),
    )
    print(f"lowering + compiling sharded window for {n_dev} devices...",
          flush=True)
    compiled = solve.lower(*args).compile()
    hlo = compiled.as_text()
    colls = extract_collectives(hlo)
    # per-iteration = inside the LM while body (op_name metadata path)
    per_iter = [c for c in colls if "/while/" in c[0]]
    one_time = [c for c in colls if "/while/" not in c[0]]
    return dict(
        n_dev=n_dev,
        num_collectives=len(colls),
        per_iter=[
            dict(computation=c, op=o, bytes=b) for c, o, b in per_iter
        ],
        one_time=[
            dict(computation=c, op=o, bytes=b) for c, o, b in one_time
        ],
        per_iter_bytes_by_op={
            op: int(sum(b for _, o, b in per_iter if o == op))
            for op in sorted({o for _, o, _ in per_iter})
        },
        per_iter_total_bytes=int(sum(b for _, _, b in per_iter)),
        one_time_total_bytes=int(sum(b for _, _, b in one_time)),
    )


def main():
    scene, cfg, dev = build_problem()
    out = {"problem": dict(
        sensor=[SENSOR_W, SENSOR_H], pano=[2 * PANO_H, PANO_H],
        num_knots=int(scene.traj.num_knots), events=int(N_EVENTS),
        note="collective byte volumes are event-count independent "
             "(halo payload is O(sensor pixels); reductions are pose/"
             "map-row-domain objects)",
    ), "meshes": []}
    for n_dev in (2, 4, 8):
        out["meshes"].append(collectives_for_mesh(scene, cfg, dev, n_dev))
        with open(os.path.join(REPO, "docs", "scaling_model_r4.json"), "w") as f:
            json.dump(out, f, indent=2)
        m = out["meshes"][-1]
        print(f"n_dev={n_dev}: {m['num_collectives']} collectives, "
              f"per-iter {m['per_iter_total_bytes']/1e6:.2f} MB "
              f"({m['per_iter_bytes_by_op']})", flush=True)
    print("wrote docs/scaling_model_r4.json")


if __name__ == "__main__":
    main()
