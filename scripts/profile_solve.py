"""Profile the Schur solve phase component-wise on TPU.

The solve phase (``solver._solve_update``) measures ~50 ms at the 2M bench
shape while its roofline is ~5-10 ms (3.1e11 GEMM FLOPs + two passes over
the 1.6 GB A12 block); this decomposes it:

  * the two Schur-reduction GEMMs alone (A12 planes, contract over rows)
  * the (3K, 3K) Cholesky factor+solve alone
  * the back-substitution matvecs (Ae @ x1, Ao @ x1) alone
  * update_map / update_knots alone
  * full solve_normal_eq / full _solve_update

Usage: python scripts/profile_solve.py [num_events]
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
    dim = 3 * nk

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, nk)
    lam = jnp.asarray(1e-3, jnp.float32)
    damping = jnp.asarray(1.0, jnp.float32)

    res = {"num_events": n, "hw_pad": int(neq.A12.shape[0]),
           "dp_pad": int(neq.A12.shape[1] // 2), "dim_pose": dim}

    # full phase (what bench times)
    def full(knots, Gx, Gy, neq, lam):
        return solver._solve_update(knots, Gx, Gy, neq, lam, damping,
                                    True, False)

    res["solve_update_s"] = timed(full, knots, Gx, Gy, neq, lam)

    # solve_normal_eq alone
    def sne(neq, lam):
        return M.solve_normal_eq(neq, lam, True)

    res["solve_normal_eq_s"] = timed(sne, neq, lam)

    dp_pad = neq.A12.shape[1] // 2

    # Schur-reduction GEMMs alone (same operand shapes/precision)
    @jax.jit
    def schur_gemms(neq, lam):
        m00, m01, m11 = M._damped_a22_inv(neq, lam)
        Ae = neq.A12[:, :dp_pad]
        Ao = neq.A12[:, dp_pad:]
        Ze = Ae * m00[:, None] + Ao * m01[:, None]
        Zo = Ae * m01[:, None] + Ao * m11[:, None]
        S = jax.lax.dot_general(
            Ae, Ze, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            Ao, Zo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return S[::37, ::41].sum()

    res["schur_gemms_s"] = timed(schur_gemms, neq, lam)

    # Cholesky factor+solve alone, at the real (dim, dim) shape
    S0 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (dim, dim)))
    S0 = jnp.asarray(S0 @ S0.T + dim * np.eye(dim), jnp.float32)
    rhs0 = jnp.asarray(np.ones((dim,)), jnp.float32)

    @jax.jit
    def chol(S, rhs):
        c, lower = jax.scipy.linalg.cho_factor(S)
        return jax.scipy.linalg.cho_solve((c, lower), rhs).sum()

    res["cholesky_s"] = timed(chol, S0, rhs0)

    # back-substitution matvecs alone
    x1_pad = jnp.asarray(np.ones((dp_pad,)), jnp.float32)

    @jax.jit
    def matvecs(neq, x1_pad):
        Ae = neq.A12[:, :dp_pad]
        Ao = neq.A12[:, dp_pad:]
        return (Ae @ x1_pad).sum() + (Ao @ x1_pad).sum()

    res["back_matvecs_s"] = timed(matvecs, neq, x1_pad)

    # map/knot updates alone
    x2 = jnp.zeros((2, neq.A12.shape[0]), jnp.float32)
    x1 = jnp.zeros((dim,), jnp.float32)

    @jax.jit
    def upd(Gx, Gy, x2, x1, knots, neq):
        gx, gy = M.update_map(Gx, Gy, x2, damping, neq)
        kn = M.update_knots(knots, x1, True)
        return gx[0, 0] + gy[0, 0] + kn[0, 0, 0]

    res["updates_s"] = timed(upd, Gx, Gy, x2, x1, knots, neq)

    for k in sorted(res):
        if k.endswith("_s") and isinstance(res[k], float):
            res[k.replace("_s", "_ms")] = res[k] * 1e3
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
