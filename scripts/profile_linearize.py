"""Differential profile of the linearize/objective phase on TPU.

Times (value-fetch synced, median of reps) jitted variants that drop one
piece at a time, so each component's in-program cost is a DIFFERENCE of two
real measurements (not an isolated-call estimate):

  * full linearize (need_deriv=True) + data cost   [the objective phase]
  * same minus the num_ev_map scatter-add
  * need_deriv=False (no Jacobian chain / prev-Jacobian gather)
  * cost-only (also skips num_ev_map + pm_pix rounding)
  * warp only (forward warp, no pairing/residual)
  * the accept path: linearize + form_normal_eq in ONE program

Usage: python scripts/profile_linearize.py [num_events]
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
from emba_tpu import pairing, spline, warp


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


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
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

    res = {"num_events": n}

    def consume_lin(lin):
        s = lin.e[::97].sum() + lin.dx[::97].sum() + lin.pm_pix[::97].sum()
        s = s + lin.num_ev_map[::1013].sum()
        if lin.Jc.shape[1]:
            s = s + lin.Jc[:, ::997].sum() + lin.Jp[:, ::997].sum()
        return s

    # objective phase: linearize(deriv) + costs (what the fused loop runs
    # per iteration, minus solve/update)
    @jax.jit
    def obj_full(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, True)
        c = M.data_cost(lin.e, cfg) + M.reg_cost(gx, gy, cfg.alpha)
        return c + consume_lin(lin)

    res["objective_deriv_s"] = timed(obj_full, knots, Gx, Gy)

    # without consuming num_ev_map (XLA DCEs the scatter-add)
    @jax.jit
    def obj_noscatter(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, True)
        c = M.data_cost(lin.e, cfg) + M.reg_cost(gx, gy, cfg.alpha)
        s = lin.e[::97].sum() + lin.dx[::97].sum() + lin.pm_pix[::97].sum()
        return c + s + lin.Jc[:, ::997].sum() + lin.Jp[:, ::997].sum()

    res["objective_deriv_noscatter_s"] = timed(obj_noscatter, knots, Gx, Gy)

    # need_deriv=False (incl. scatter)
    @jax.jit
    def obj_light(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, False)
        c = M.data_cost(lin.e, cfg) + M.reg_cost(gx, gy, cfg.alpha)
        return c + consume_lin(lin)

    res["objective_light_s"] = timed(obj_light, knots, Gx, Gy)

    # cost only: no scatter, no Jacobians (pure trial-cost evaluation)
    @jax.jit
    def cost_only(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, False)
        return M.data_cost(lin.e, cfg) + M.reg_cost(gx, gy, cfg.alpha)

    res["cost_only_s"] = timed(cost_only, knots, Gx, Gy)

    # forward warp alone
    @jax.jit
    def warp_only(k):
        pm, cp_idx, _ = warp.warp_events(
            k, dev.batch_s, dev.batch_u, dev.batch_ids, dev.bearings,
            cfg.pano, cfg.spline_order, need_jacobian=False,
        )
        return pm[0][::97].sum() + pm[1][::97].sum()

    res["warp_fwd_s"] = timed(warp_only, knots)

    # forward warp + jacobian chain (no pairing)
    @jax.jit
    def warp_jac(k):
        pm, cp_idx, dpm = warp.warp_events(
            k, dev.batch_s, dev.batch_u, dev.batch_ids, dev.bearings,
            cfg.pano, cfg.spline_order, need_jacobian=True,
        )
        return pm[0][::97].sum() + dpm[:, :, ::997].sum()

    res["warp_jac_s"] = timed(warp_jac, knots)

    # accept path: linearize(deriv) + form in ONE program
    @jax.jit
    def accept_path(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, True)
        neq = M.form_normal_eq(lin, gx, gy, cfg, nk)
        return neq.A11[0, 0] + neq.A12[::513, ::129].sum() + neq.dropped

    res["linearize_plus_form_s"] = timed(accept_path, knots, Gx, Gy)

    # one full fused LM iteration equivalent: solve+update+linearize+cost+form
    @jax.jit
    def full_iter(k, gx, gy):
        lin = M.linearize(k, gx, gy, dev, cfg, True)
        neq = M.form_normal_eq(lin, gx, gy, cfg, nk)
        x1, x2 = M.solve_normal_eq(neq, jnp.asarray(1e-3, jnp.float32), True)
        k2 = M.update_knots(k, x1, True)
        gx2, gy2 = M.update_map(gx, gy, x2, 1.0, neq)
        lin2 = M.linearize(k2, gx2, gy2, dev, cfg, True)
        c = M.data_cost(lin2.e, cfg) + M.reg_cost(gx2, gy2, cfg.alpha)
        return c + lin2.Jc[:, ::997].sum()

    res["full_iteration_s"] = timed(full_iter, knots, Gx, Gy)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
