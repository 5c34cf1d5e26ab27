"""Probe: separate AOT-compile from execution for the fused LM window at
large event counts, to diagnose the 64M-event `UNAVAILABLE: TPU device
error` (bench succeeds at 16M, host-loop phases succeed at 64M — only the
fused while_loop program fails).

Usage (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache \
  python scripts/probe_fused_scale.py N_EVENTS STREAM_CHUNK LM_ITERS
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
SC = int(sys.argv[2]) if len(sys.argv) > 2 else 2_097_152
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
COMPACT = int(os.environ.get("PROBE_COMPACT_CAP", "0")) or None
LIGHT = os.environ.get("PROBE_STREAM_LIGHT", "0") == "1"

CACHE = os.environ.get(
    "PROBE_DATASET", "/root/repo/.cache/bench_s128_p512_n600_t4.8_c0.0125.npz"
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


log(f"loading dataset ({N} events, chunk {SC}, iters {ITERS}, "
    f"compact {COMPACT})")
z = np.load(CACHE)
data = {k: z[k] for k in z.files}
log("dataset loaded")

import jax
import jax.numpy as jnp

from emba_tpu import model, pairing, solver, spline

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

knots = np.asarray(data["knots"])
traj = spline.Trajectory(
    t_beg=float(data["t_beg"]), dt=float(data["dt_knots"]), knots=knots,
    order=2,
)
rng = np.random.default_rng(1)
steps = rng.normal(size=(traj.num_knots, 3)) * 0.01
walk = np.cumsum(steps, axis=0)
walk -= walk[0]
traj0 = dataclasses.replace(traj, knots=spline._np_exp(walk) @ knots)

pano_h, pano_w = data["gx"].shape
cfg = model.ModelConfig(
    c_th=float(os.environ.get("PROBE_C_TH", "0.0125")),
    pano_width=pano_w, pano_height=pano_h,
    thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0,
    use_pallas=(jax.default_backend() == "tpu"
                and os.environ.get("PROBE_USE_PALLAS", "1") == "1"),
    compact_cap=COMPACT,
    stream_chunk=SC or None,
    stream_light=LIGHT,
)
log("building window (host pairing)")
win = pairing.build_window(
    data["t"][:N], data["x"][:N], data["y"][:N], data["pol"][:N],
    int(data["sensor_width"]), traj0.locate, 100,
)
dev = model.DeviceWindow.from_window(
    win, data["bearing_lut"], int(data["sensor_width"]), jnp.float32,
    pad_multiple=SC or 1,
)
Gx = jnp.asarray(data["gx"], jnp.float32)
Gy = jnp.asarray(data["gy"], jnp.float32)
k0 = jnp.asarray(traj0.knots, jnp.float32)
damping = jnp.asarray(1.0, jnp.float32)
tolf = jnp.asarray(0.0, jnp.float32)

log("lowering fused program")
t0 = time.perf_counter()
lowered = solver.solve_window_fused.lower(
    k0, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
    max_num_iter=ITERS,
)
log(f"lowered in {time.perf_counter() - t0:.1f}s; compiling")
t0 = time.perf_counter()
compiled = lowered.compile()
log(f"compiled in {time.perf_counter() - t0:.1f}s")
try:
    mem = compiled.memory_analysis()
    log(f"memory analysis: {mem}")
except Exception as e:  # noqa: BLE001
    log(f"memory analysis unavailable: {e}")

walls = []
for rep in range(4):  # rep 0 absorbs first-execution effects
    log(f"executing (rep {rep})")
    t0 = time.perf_counter()
    out = compiled(k0, Gx, Gy, dev, damping, tolf)
    cost = float(out[3])
    n_it = int(out[4])
    wall = time.perf_counter() - t0
    if rep:
        walls.append(wall)
    log(f"executed in {wall:.1f}s: cost_min={cost:.6g} iters={n_it} "
        f"-> {N * n_it / wall / 1e6:.2f}M ev/s")
med = sorted(walls)[len(walls) // 2]
log(f"median warm: {med:.1f}s -> {N * n_it / med / 1e6:.2f}M ev/s")
