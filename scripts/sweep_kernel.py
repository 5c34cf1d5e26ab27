"""Sweep the Pallas A12 kernel tile sizes (TILE_PX x MC) on TPU.

TILE_PX / MC are module-load-time constants baked into traced programs, so
each config runs in a FRESH subprocess with EMBA_TILE_PX / EMBA_MC set (the
earlier in-process global-patching variant silently reused stale traces —
every config reported identical times). The parent collects one JSON line
per config; the persistent compilation cache keeps re-runs cheap.

Usage: python scripts/sweep_kernel.py [num_events] [configs...]
  configs like 512x256 (TILE_PXxMC); default grid if none given.
  (internal: --one <num_events> runs a single measurement in-process)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)


def _one(n_events):
    """Single measurement with the current EMBA_TILE_PX/EMBA_MC env."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench as B
    from emba_tpu import model as M
    from emba_tpu import pairing, spline
    from emba_tpu.kernels import a12_accum as K

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    data = B.build_dataset()
    n = min(len(data["t"]), n_events)
    traj = spline.Trajectory(
        t_beg=float(data["t_beg"]), dt=float(data["dt_knots"]),
        knots=np.asarray(data["knots"]), order=2,
    )
    rng = np.random.default_rng(1)
    steps = rng.normal(size=(traj.num_knots, 3)) * 0.01
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(traj, knots=spline._np_exp(walk) @ traj.knots)
    pano_h, pano_w = data["gx"].shape
    cfg = M.ModelConfig(
        c_th=B.C_TH, pano_width=pano_w, pano_height=pano_h,
        thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0, use_pallas=True,
    )
    win = pairing.build_window(
        data["t"][:n], data["x"][:n], data["y"][:n], data["pol"][:n],
        int(data["sensor_width"]), traj0.locate, 100,
    )
    dev = M.DeviceWindow.from_window(
        win, data["bearing_lut"], int(data["sensor_width"]), jnp.float32
    )
    Gx = jnp.asarray(data["gx"], jnp.float32)
    Gy = jnp.asarray(data["gy"], jnp.float32)
    knots = jnp.asarray(traj0.knots, jnp.float32)
    nk = traj0.num_knots

    # M.linearize is module-level jitted: dev rides as an ARGUMENT (closing
    # over it bakes the window into the HLO as a constant -> the remote
    # compile service rejects the request beyond a few M events)
    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    _ = float(lin.pm_pix[0])

    @jax.jit
    def kern_full(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e):
        w = jnp.ones_like(e)
        a12, px5, a11b = K.a12_accumulate(
            pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, w,
            cfg.num_pix, 3 * nk, cfg.spline_order,
        )
        return a12[::513, ::129].sum() + px5[:, :5].sum() + a11b.sum()

    args = (lin.pm_pix, lin.i_c, lin.i_p, lin.Jc, lin.Jp, lin.dx, lin.dy,
            lin.e)
    row = {"tile_px": K.TILE_PX, "mc": K.MC, "num_events": n}
    t0 = time.perf_counter()
    val = float(kern_full(*args))
    row["compile_s"] = round(time.perf_counter() - t0, 1)
    ts = []
    for _i in range(5):
        t0 = time.perf_counter()
        val = float(kern_full(*args))
        ts.append(time.perf_counter() - t0)
    row["a12_accumulate_s"] = float(np.median(ts))
    row["events_per_s"] = round(n / row["a12_accumulate_s"])
    row["checksum"] = val
    print(json.dumps(row), flush=True)


def main():
    if sys.argv[1:2] == ["--one"]:
        _one(int(sys.argv[2]))
        return
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    configs = []
    for a in sys.argv[2:]:
        tp, mc = a.lower().split("x")
        configs.append((int(tp), int(mc)))
    if not configs:
        configs = [
            (512, 256),  # current default
            (512, 512),
            (512, 128),
            (256, 256),
            (256, 512),
            (128, 256),
        ]
    for tp, mc in configs:
        env = dict(os.environ)
        env["EMBA_TILE_PX"] = str(tp)
        env["EMBA_MC"] = str(mc)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 str(n_events)],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if line:
                print(line[-1], flush=True)
            else:
                print(json.dumps({
                    "tile_px": tp, "mc": mc,
                    "error": (out.stderr or out.stdout)[-300:],
                }), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"tile_px": tp, "mc": mc, "error": "timeout"}),
                  flush=True)


if __name__ == "__main__":
    main()
