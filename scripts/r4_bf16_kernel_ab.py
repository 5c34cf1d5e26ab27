"""A/B the Pallas A12 kernel's EMBA_KERNEL_BF16 mode on TPU.

Default mode runs the accuracy-preserving multi-pass hi/lo bf16 expansion
(2 passes on the value operands, 3 on the A11 Gram); BF16=1 runs single
cheap bf16 passes (~3-decimal-digit payloads). This measures the kernel
wall time of both modes on the SAME linearization and the relative
deviation of L1/strided block CHECKSUMS (sign cancellation inside a
checksum can hide larger per-element deviations — the kernel's own
estimate for single-pass bf16 is ~0.3% elementwise noise; treat the
checksum figure as an aggregate indicator, not an elementwise bound), so
the knob's perf/accuracy tradeoff is a committed number instead of a
guess.

Usage: [EMBA_MC=.. EMBA_TILE_PX=..] python scripts/r4_bf16_kernel_ab.py [n_events]
Prints one JSON line.

NOTE: the BF16 flag is read at import time, so the two modes run in two
subprocesses (mode passed via env) when invoked without EMBA_AB_MODE.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)


def run_mode(mode: str, n_events: int) -> dict:
    env = dict(os.environ)
    env["EMBA_AB_MODE"] = "1"
    env["EMBA_KERNEL_BF16"] = mode
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), str(n_events)],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        raise RuntimeError(f"mode {mode} failed:\n{out.stdout}\n{out.stderr}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def measure(n_events: int) -> None:
    import dataclasses

    import numpy as np
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
    pano_h, pano_w = data["gx"].shape
    cfg = M.ModelConfig(
        c_th=B.C_TH, pano_width=pano_w, pano_height=pano_h,
        thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0, use_pallas=True,
    )
    win = pairing.build_window(
        data["t"][:n], data["x"][:n], data["y"][:n], data["pol"][:n],
        int(data["sensor_width"]), traj.locate, 100,
    )
    dev = M.DeviceWindow.from_window(
        win, data["bearing_lut"], int(data["sensor_width"]), jnp.float32
    )
    Gx = jnp.asarray(data["gx"], jnp.float32)
    Gy = jnp.asarray(data["gy"], jnp.float32)
    knots = jnp.asarray(traj.knots, jnp.float32)
    nk = traj.num_knots

    def lin_d(k, gx, gy):
        return M.linearize(k, gx, gy, dev, cfg, True)

    lin = lin_d(knots, Gx, Gy)
    _ = float(lin.e[0])

    @jax.jit
    def kern_full(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e):
        w = jnp.ones_like(e)
        return K.a12_accumulate(
            pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, w,
            cfg.num_pix, 3 * nk, cfg.spline_order,
        )

    args = (lin.pm_pix, lin.i_c, lin.i_p, lin.Jc, lin.Jp, lin.dx, lin.dy,
            lin.e)
    a12, px5, a11b = kern_full(*args)
    _ = float(a12[0, 0])  # sync (compile + first exec)
    ts = []
    for _i in range(5):
        t0 = time.perf_counter()
        a12, px5, a11b = kern_full(*args)
        _ = float(a12[0, 0]) + float(px5[0, 0]) + float(a11b[0, 0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    # block checksums for a cross-mode deviation estimate
    sums = {
        "a12_l1": float(jnp.abs(a12).sum()),
        "a11_l1": float(jnp.abs(a11b[:-8]).sum()),
        "px5_l1": float(jnp.abs(px5).sum()),
        "a12_s": float(a12[::513, ::129].sum()),
        "a11_s": float(a11b.sum()),
    }
    print(json.dumps({
        "mode": os.environ.get("EMBA_KERNEL_BF16", "0"),
        "n": n,
        "kernel_median_s": ts[len(ts) // 2],
        "kernel_best_s": ts[0],
        "events_per_s": n / ts[len(ts) // 2],
        "sums": sums,
    }))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    if os.environ.get("EMBA_AB_MODE"):
        measure(n_events)
        return
    r0 = run_mode("0", n_events)
    r1 = run_mode("1", n_events)
    rel = {
        k: abs(r1["sums"][k] - r0["sums"][k]) / (abs(r0["sums"][k]) + 1e-30)
        for k in r0["sums"]
    }
    out = {
        "n": n_events,
        "multipass_s": r0["kernel_median_s"],
        "bf16_s": r1["kernel_median_s"],
        "speedup": r0["kernel_median_s"] / r1["kernel_median_s"],
        "multipass_ev_s": r0["events_per_s"],
        "bf16_ev_s": r1["events_per_s"],
        "rel_dev": rel,
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "docs", "ab_bf16_kernel_r4.json"), "w") as f:
        json.dump({"r0": r0, "r1": r1, "summary": out}, f, indent=2)


if __name__ == "__main__":
    main()
