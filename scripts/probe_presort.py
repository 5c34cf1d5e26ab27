"""A/B probe: does pre-sorting the window's events by their INITIAL warped
pano pixel (one host permutation per window) collapse the random-gather
tile amplification that dominates linearize + the kernel prepass?

Hypothesis: TPU random gathers pull whole (8,128) tiles (4-8 KB) per
element. After a pixel-presort, (a) the per-iteration bucket sort's
payload gather becomes near-sequential (the state drifts < a few px per LM
iteration, so sorted order ~= stored order), (b) the (5, HW) map gather at
pm_pix becomes near-monotonic, (c) prev-event gathers become near-adjacent
(same-pixel pairs sort together, stable sort keeps time order). Batch-id
gathers ((9|18, NB) pose tables) lose monotonicity but stay coalesced at
the pano-tile level.

Measures linearize / form_pallas / form_streamed / objective_streamed and
the full fused loop, unpermuted vs permuted, on the same problem.

Usage (TPU): python scripts/probe_presort.py [num_events] [stream_chunk]
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

import jax
import jax.numpy as jnp

import bench as B
from emba_tpu import model as M
from emba_tpu import pairing, solver, spline

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
SC = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def timed(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def permute_window(dev: M.DeviceWindow, perm: np.ndarray) -> M.DeviceWindow:
    """Apply a host permutation to every per-event array; remap prev_idx."""
    n = len(perm)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    prev = np.asarray(dev.prev_idx)[:n]
    hp = np.asarray(dev.has_prev)[:n]
    prev_new = np.where(hp[perm], inv[prev[perm]], 0).astype(np.int32)
    return M.DeviceWindow(
        bearings=jnp.asarray(np.asarray(dev.bearings)[:, :n][:, perm]),
        pol_signed=jnp.asarray(np.asarray(dev.pol_signed)[:n][perm]),
        prev_idx=jnp.asarray(prev_new),
        has_prev=jnp.asarray(hp[perm]),
        batch_ids=jnp.asarray(np.asarray(dev.batch_ids)[:n][perm]),
        batch_s=dev.batch_s,
        batch_u=dev.batch_u,
        sensor_pix=jnp.asarray(np.asarray(dev.sensor_pix)[:n][perm]),
    )


def main():
    data = B.build_dataset()
    n = min(len(data["t"]), N_EVENTS)
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
        thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0, use_pallas=True,
        stream_chunk=SC or None,
    )
    win = pairing.build_window(
        data["t"][:n], data["x"][:n], data["y"][:n], data["pol"][:n],
        int(data["sensor_width"]), traj0.locate, 100,
    )
    # unpadded on BOTH sides of the A/B (the chunk fns pad at trace time;
    # same extra copies for base and presort, so the comparison stays fair)
    dev = M.DeviceWindow.from_window(
        win, data["bearing_lut"], int(data["sensor_width"]), jnp.float32,
    )
    Gx = jnp.asarray(data["gx"], jnp.float32)
    Gy = jnp.asarray(data["gy"], jnp.float32)
    knots = jnp.asarray(traj0.knots, jnp.float32)
    nk = traj0.num_knots

    # the initial-state warp pixel -> stable presort permutation
    lin0 = M.linearize(knots, Gx, Gy, dev, cfg, False)
    pm_pix0 = np.asarray(lin0.pm_pix)[:n]
    perm = np.argsort(pm_pix0, kind="stable")
    dev_p = permute_window(dev, perm)
    print(f"[{time.strftime('%H:%M:%S')}] permuted window built", flush=True)

    res = {"num_events": n, "stream_chunk": SC or None}

    def suite(tag, d):
        def lin_d(k, gx, gy):
            return M.linearize(k, gx, gy, d, cfg, True)

        res[f"linearize_deriv_{tag}_s"] = timed(lin_d, knots, Gx, Gy)
        lin = lin_d(knots, Gx, Gy)

        @jax.jit
        def form_p(lin, Gx, Gy):
            neq = M.form_normal_eq(lin, Gx, Gy, cfg, nk)
            tot = jnp.zeros((), jnp.float32)
            for leaf in jax.tree_util.tree_leaves(neq):
                f = leaf.reshape(-1)
                tot = tot + f[:: max(1, f.shape[0] // 4096)].sum().astype(
                    jnp.float32
                )
            return tot

        res[f"form_pallas_{tag}_s"] = timed(form_p, lin, Gx, Gy)

        # cost consistency check (permutation must not change the math
        # beyond fp reordering)
        res[f"cost_{tag}"] = float(M.data_cost(lin.e, cfg))

        if SC:
            pb, pbid = M.prev_records(d)

            def obj_s(k, gx, gy):
                return M.cost_and_activity_streamed(
                    k, gx, gy, d, cfg, prev_bearings=pb, prev_bids=pbid
                )[0]

            res[f"objective_streamed_{tag}_s"] = timed(obj_s, knots, Gx, Gy)
            nem = M.cost_and_activity_streamed(
                knots, Gx, Gy, d, cfg, prev_bearings=pb, prev_bids=pbid
            )[1]

            def form_s(k, gx, gy):
                return M.form_normal_eq_streamed(
                    nem, k, gx, gy, d, cfg, nk,
                    prev_bearings=pb, prev_bids=pbid,
                ).A11

            res[f"form_streamed_{tag}_s"] = timed(form_s, knots, Gx, Gy)

        # full fused loop
        damping = jnp.asarray(1.0, jnp.float32)
        tolf = jnp.asarray(0.0, jnp.float32)
        out = solver.solve_window_fused(
            knots, Gx, Gy, d, cfg, damping, tolf, fix_first=True,
            max_num_iter=8,
        )
        jax.block_until_ready(out[0])
        float(out[3])
        t0 = time.perf_counter()
        out = solver.solve_window_fused(
            knots, Gx, Gy, d, cfg, damping, tolf, fix_first=True,
            max_num_iter=8,
        )
        n_it = int(out[4])
        cost_min = float(out[3])
        wall = time.perf_counter() - t0
        res[f"fused_{tag}_s"] = wall
        res[f"fused_{tag}_iters"] = n_it
        res[f"fused_{tag}_cost_min"] = cost_min
        res[f"fused_{tag}_events_per_s"] = n * n_it / wall
        print(f"[{time.strftime('%H:%M:%S')}] {tag} done", flush=True)

    suite("base", dev)
    suite("presort", dev_p)

    for k in sorted([k for k in res if k.endswith("_s")]):
        if not k.startswith("fused_"):
            res[k.replace("_s", "_events_per_s")] = res[k] and n / res[k]
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
