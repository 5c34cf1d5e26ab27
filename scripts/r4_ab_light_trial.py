"""A/B: light-trial classic LM vs classic two-phase (VERDICT r3 item 4).

Classic fused mode pays the full (D, N) Jacobian linearization on EVERY
trial, including rejected ones; light_trial computes cost-only trials and
relinearizes inside forming on accept (the reference's own structure,
solver.cpp:66-103). Measures the fused full-LM-loop rate at 2M and 16M
events (bench problem shape, tolerance disabled, median of 3 warm reps)
with the per-iteration accept trace so the win/loss decomposes by accept
ratio.

Usage (TPU): python scripts/r4_ab_light_trial.py
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emba_tpu import model, pairing, solver, spline  # noqa: E402

DATA = os.path.join(REPO, ".cache", "bench_s128_p512_n600_t4.8_c0.1.npz")
z = np.load(DATA)
ITERS = 12
OUT = os.path.join(REPO, ".cache", "r4", "ab_light_trial.json")

results = []
for n in (2_000_000, 16_000_000):
    traj = spline.Trajectory(
        t_beg=float(z["t_beg"]), dt=float(z["dt_knots"]),
        knots=np.asarray(z["knots"]), order=2,
    )
    rng = np.random.default_rng(1)
    steps = rng.normal(size=(traj.num_knots, 3)) * 0.01
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(traj, knots=spline._np_exp(walk) @ traj.knots)
    win = pairing.build_window(
        z["t"][:n], z["x"][:n], z["y"][:n], z["pol"][:n],
        int(z["sensor_width"]), traj0.locate, 100,
    )
    dev = model.DeviceWindow.from_window(
        win, z["bearing_lut"], int(z["sensor_width"]), jnp.float32
    )
    Gx = jnp.asarray(z["gx"], jnp.float32)
    Gy = jnp.asarray(z["gy"], jnp.float32)
    k0 = jnp.asarray(traj0.knots, jnp.float32)
    damping = jnp.asarray(1.0, jnp.float32)
    tolf = jnp.asarray(0.0, jnp.float32)  # convergence disabled

    for light in (False, True):
        cfg = model.ModelConfig(
            c_th=0.1, pano_width=1024, pano_height=512, thres_valid_pixel=3,
            alpha=0.5, outlier_dp_norm=3.0, use_pallas=True,
            light_trial=light,
        )

        def run():
            out = solver.solve_window_fused(
                k0, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
                max_num_iter=ITERS, return_trace=True,
            )
            n_it = int(out[4])
            trace = np.asarray(out[6])
            return n_it, trace

        n_it, trace = run()  # warm/compile
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            n_it, trace = run()
            walls.append(time.perf_counter() - t0)
        wall = sorted(walls)[1]
        accepts = int(trace[:n_it, 3].sum())
        r = dict(
            events=n, light_trial=light, iters=n_it, accepts=accepts,
            wall_s=wall, events_per_s=n * n_it / wall, walls=walls,
        )
        results.append(r)
        print(f"n={n//10**6}M light_trial={light}: {n*n_it/wall/1e6:.2f}M "
              f"ev/s ({n_it} iters, {accepts} accepts, wall {wall:.2f}s)",
              flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
print("done")
