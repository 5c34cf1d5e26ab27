"""Profile the normal-equation forming phase component-wise on TPU.

Times (value-fetch synced, median of reps):
  * linearize (no-deriv and with-deriv)
  * the sort_key_val prepass alone
  * the bucket re-layout (searchsorted/scatter/gathers) alone
  * the full Pallas a12_accumulate
  * full form_normal_eq (pallas + xla)

Usage: python scripts/profile_forming.py [num_events]
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
from emba_tpu import pairing, spline


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

    # NOTE: pass ``dev`` as an ARGUMENT everywhere (M.linearize etc. are
    # module-level jitted fns) — closing over it bakes the whole event
    # window into the HLO as a constant, which the remote compile service
    # rejects (HTTP 413) beyond a few M events.
    def lin_nd(k, gx, gy):
        return M.linearize(k, gx, gy, dev, cfg, False)

    def lin_d(k, gx, gy):
        return M.linearize(k, gx, gy, dev, cfg, True)

    res["linearize_noderiv_s"] = timed(lin_nd, knots, Gx, Gy)
    res["linearize_deriv_s"] = timed(lin_d, knots, Gx, Gy)
    lin = lin_d(knots, Gx, Gy)

    # sort prepass alone
    @jax.jit
    def sort_only(pm_pix):
        k, v = jax.lax.sort_key_val(
            pm_pix, jnp.arange(pm_pix.shape[0], dtype=jnp.int32)
        )
        return k[::97].sum() + v[::97].sum()  # consume both

    res["sort_key_val_s"] = timed(sort_only, lin.pm_pix)

    # bucket prepass alone (sort + searchsorted + payload gather)
    from emba_tpu.kernels import a12_accum as K0

    @jax.jit
    def prepass_only(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e):
        w = jnp.ones_like(e)
        t, payload_b = K0._bucket_prepass(
            pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, w, cfg.num_pix,
        )
        return t[::7].sum() + payload_b[1:, ::997].sum()

    res["bucket_prepass_s"] = timed(
        prepass_only, lin.pm_pix, lin.i_c, lin.i_p, lin.Jc, lin.Jp,
        lin.dx, lin.dy, lin.e,
    )

    # full kernel call (sort + bucket + pallas)
    from emba_tpu.kernels import a12_accum as K

    @jax.jit
    def kern_full(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e):
        w = jnp.ones_like(e)
        a12, px5, a11b = K.a12_accumulate(
            pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, w,
            cfg.num_pix, 3 * nk, cfg.spline_order,
        )
        return a12[::513, ::129].sum() + px5.sum() + a11b.sum()

    try:
        res["a12_accumulate_s"] = timed(
            kern_full, lin.pm_pix, lin.i_c, lin.i_p, lin.Jc, lin.Jp,
            lin.dx, lin.dy, lin.e,
        )
    except Exception as ex:  # noqa: BLE001
        res["a12_accumulate_error"] = repr(ex)[:300]

    # full forming, both producers. Consume EVERY output block (subsampled
    # sums) — consuming only A11[0,0] lets XLA dead-code-eliminate the
    # A12/A22/b2 scatters and fakes a ~3x-too-fast XLA number.
    def _consume(neq):
        tot = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(neq):
            f = leaf.reshape(-1)
            tot = tot + f[:: max(1, f.shape[0] // 4096)].sum().astype(
                jnp.float32
            )
        return tot

    @jax.jit
    def form_p(lin, Gx, Gy):
        return _consume(M.form_normal_eq(lin, Gx, Gy, cfg, nk))

    cfg_x = dataclasses.replace(cfg, use_pallas=False)

    @jax.jit
    def form_x(lin, Gx, Gy):
        return _consume(M.form_normal_eq(lin, Gx, Gy, cfg_x, nk))

    res["form_pallas_s"] = timed(form_p, lin, Gx, Gy)
    res["form_xla_s"] = timed(form_x, lin, Gx, Gy)
    res["form_pallas_events_per_s"] = n / res["form_pallas_s"]

    # streamed forming (chunk-recomputed linearization; no resident (D,N)).
    # dev rides as an argument through the module-level jitted fns (see the
    # NOTE above) and each variant is consumed via its `dropped` scalar —
    # cheap to fetch, depends on the whole forming pass.
    cfg_s = dataclasses.replace(cfg, stream_chunk=min(n, 2_097_152))

    num_ev_map = M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg_s)[1]

    def form_s(knots, Gx, Gy):
        return M.form_normal_eq_streamed(
            num_ev_map, knots, Gx, Gy, dev, cfg_s, nk
        ).A11

    try:
        res["form_streamed_s"] = timed(form_s, knots, Gx, Gy)
    except Exception as ex:  # noqa: BLE001
        res["form_streamed_error"] = repr(ex)[:300]

    # streamed LIGHT forming (resident (N,) residual fields from a
    # need_deriv=False linearize; Jacobian-only chunk recompute)
    cfg_sl = dataclasses.replace(cfg_s, stream_light=True)
    lin_light = lin_nd(knots, Gx, Gy)

    def form_sl(lin_l, knots, Gx, Gy):
        return M.form_normal_eq_streamed(
            lin_l, knots, Gx, Gy, dev, cfg_sl, nk
        ).A11

    try:
        res["form_streamed_light_s"] = timed(form_sl, lin_light, knots, Gx, Gy)
    except Exception as ex:  # noqa: BLE001
        res["form_streamed_light_error"] = repr(ex)[:300]

    # objective variants: chunked zero-residency vs one-pass light
    def obj_streamed(knots, Gx, Gy):
        return M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg_s)[0]

    def obj_light(knots, Gx, Gy):
        lin_l = M.linearize(knots, Gx, Gy, dev, cfg, False)
        return M.data_cost(lin_l.e, cfg)

    res["objective_streamed_s"] = timed(obj_streamed, knots, Gx, Gy)
    res["objective_light_s"] = timed(obj_light, knots, Gx, Gy)

    for k, v in sorted(res.items()):
        if k.endswith("_s") and isinstance(v, float):
            res[k.replace("_s", "_events_per_s")] = n / v
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
