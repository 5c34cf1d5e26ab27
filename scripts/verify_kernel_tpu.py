"""TPU hardware parity check for the Pallas accumulation kernel.

Runs normal-equation forming at bench scale on the REAL TPU twice — Pallas
sorted-accumulation producer vs the XLA-scatter producer — and writes the
comparison to results/kernel_parity_tpu.json (re-runnable artifact replacing
any commit-message-only claim). Also checks the streamed producer.

Usage (TPU env, one process at a time):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.cache/jaxcache \
        python scripts/verify_kernel_tpu.py [num_events]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".cache", "jaxcache"),
)

import jax
import jax.numpy as jnp

import bench as B
from emba_tpu import model as M
from emba_tpu import pairing, spline


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    data = B.build_dataset()
    n = min(len(data["t"]), n_events)
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

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
        thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0, use_pallas=False,
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

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)

    def run(c):
        t0 = time.perf_counter()
        neq = M.form_normal_eq(lin, Gx, Gy, c, nk)
        _sync = float(neq.dropped)  # value-fetch sync
        return neq, time.perf_counter() - t0

    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    # warm (compile), then timed
    run(cfg)
    neq_x, t_x = run(cfg)
    run(cfg_p)
    neq_p, t_p = run(cfg_p)

    def cmp(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        absd = np.abs(a - b)
        scale = np.maximum(np.abs(a), np.abs(b))
        denom = np.where(scale > 0, scale, 1.0)
        return dict(
            max_abs=float(absd.max()),
            max_rel=float((absd / denom).max()),
            bit_exact=bool((a == b).all()),
        )

    report = {
        "num_events": int(n),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "blocks": {
            "A11": cmp(neq_p.A11, neq_x.A11),
            "b1": cmp(neq_p.b1, neq_x.b1),
            "A12": cmp(neq_p.A12, neq_x.A12),
            "a22_xx": cmp(neq_p.a22_xx, neq_x.a22_xx),
            "a22_xy": cmp(neq_p.a22_xy, neq_x.a22_xy),
            "a22_yy": cmp(neq_p.a22_yy, neq_x.a22_yy),
            "b2_x": cmp(neq_p.b2_x, neq_x.b2_x),
            "b2_y": cmp(neq_p.b2_y, neq_x.b2_y),
        },
        "form_seconds": {"xla": t_x, "pallas": t_p},
        "form_events_per_s": {"xla": n / t_x, "pallas": n / t_p},
    }

    # streamed producer parity (Pallas, chunked recompute)
    cfg_s = dataclasses.replace(cfg_p, stream_chunk=1 << 21)
    light = M.linearize(knots, Gx, Gy, dev, cfg_s, False)

    def run_s():
        t0 = time.perf_counter()
        neq = M.form_normal_eq_streamed(light, knots, Gx, Gy, dev, cfg_s, nk)
        _ = float(neq.dropped)
        return neq, time.perf_counter() - t0

    run_s()
    neq_s, t_s = run_s()
    report["streamed_vs_xla"] = {
        "A11": cmp(neq_s.A11, neq_x.A11),
        "A12": cmp(neq_s.A12, neq_x.A12),
        "b2_x": cmp(neq_s.b2_x, neq_x.b2_x),
    }
    report["form_seconds"]["pallas_streamed"] = t_s
    report["form_events_per_s"]["pallas_streamed"] = n / t_s

    # the LM loop tolerates ~1e-3 relative normal-equation noise; f32
    # accumulation-order differences sit orders of magnitude below that
    tol = 2e-4
    report["tolerance_rel"] = tol
    report["pass"] = all(
        v["max_rel"] <= tol or v["max_abs"] <= 1e-3
        for v in report["blocks"].values()
    )

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results"
    )
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "kernel_parity_tpu.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"pass": report["pass"], "artifact": out,
                      "form_events_per_s": report["form_events_per_s"]}))


if __name__ == "__main__":
    main()
