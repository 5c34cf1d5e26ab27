"""Model parity tests: the vectorized TPU model vs the loop-based numpy
oracle (tests/oracle.py) that mirrors the reference control flow exactly —
residuals, event-count map, normal-equation blocks, and the Schur solve.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from emba_tpu import model as M
from emba_tpu import pairing, spline, synth

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module")
def scene():
    sensor = synth.default_sensor(48, 48, f=44.0)
    return synth.generate(
        np.random.default_rng(11),
        sensor,
        pano_width=128,
        pano_height=64,
        c_th=0.2,
        t_end=0.5,
        dt_knots=0.05,
        num_steps=120,
        motion_amp=0.3,
    )


def make_cfg(scene, **kw):
    base = dict(
        c_th=0.2,
        pano_width=128,
        pano_height=64,
        thres_valid_pixel=3,
        alpha=2.0,
        spline_order=2,
    )
    base.update(kw)
    return M.ModelConfig(**base)


def build_dev(scene, cfg, perturb=0.0):
    traj = scene.traj
    if perturb:
        noise = np.random.default_rng(5).normal(size=(traj.num_knots, 3)) * perturb
        traj = dataclasses.replace(
            traj, knots=spline._np_exp(noise) @ traj.knots
        )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, scene.cam.width, traj.locate, 100
    )
    lut = scene.cam.bearing_lut()
    dev = M.DeviceWindow.from_window(win, lut, scene.cam.width, jnp.float64)
    return traj, win, dev, lut


def test_linearize_matches_oracle(scene):
    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx * 0.9)  # imperfect map: nonzero residuals
    Gy = jnp.asarray(scene.gy * 0.9)

    lin = M.linearize(knots, Gx, Gy, dev, cfg, need_deriv=True)

    res = oracle.evaluate_and_form(
        traj,
        np.asarray(Gx),
        np.asarray(Gy),
        win.t,
        win.x,
        win.y,
        win.pol,
        lut,
        scene.cam.width,
        cfg,
        batch=100,
    )
    # warped positions agree
    np.testing.assert_allclose(np.asarray(lin.pm_pix) % cfg.pano_width,
                               np.round(res["pm"][:, 0]).clip(0, cfg.pano_width - 1),
                               atol=0) if False else None
    n = win.num_events
    assert n == len(res["pm"])

    # per-event warp parity (positions + chained jacobians)
    # recompute pm from lin is not stored; compare via oracle pm rounding vs pm_pix
    px = np.clip(np.floor(res["pm"][:, 0] + 0.5).astype(int), 0, cfg.pano_width - 1)
    py = np.clip(np.floor(res["pm"][:, 1] + 0.5).astype(int), 0, cfg.pano_height - 1)
    np.testing.assert_array_equal(np.asarray(lin.pm_pix), py * cfg.pano_width + px)

    # inlier count + cost + num_ev_map parity
    assert int(jnp.sum(lin.inlier)) == len(res["meas"])
    np.testing.assert_array_equal(
        np.asarray(lin.num_ev_map).reshape(cfg.pano_height, cfg.pano_width),
        res["num_ev_map"],
    )
    np.testing.assert_allclose(
        float(M.data_cost(lin.e, cfg)), res["cost_data"], rtol=1e-12
    )
    # residual multiset parity
    e_mine = np.sort(np.asarray(lin.e)[np.asarray(lin.inlier)])
    e_oracle = np.sort([m[2] for m in res["meas"]])
    np.testing.assert_allclose(e_mine, e_oracle, atol=1e-12)


@pytest.mark.parametrize("use_irls,cost_type", [(False, "quadratic"), (True, "cauchy"), (True, "huber")])
def test_normal_eq_matches_oracle(scene, use_irls, cost_type):
    cfg = make_cfg(scene, use_irls=use_irls, cost_type=cost_type, eta=0.5)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx * 0.9)
    Gy = jnp.asarray(scene.gy * 0.9)

    lin = M.linearize(knots, Gx, Gy, dev, cfg, need_deriv=True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, traj.num_knots)

    res = oracle.evaluate_and_form(
        traj, np.asarray(Gx), np.asarray(Gy),
        win.t, win.x, win.y, win.pol, lut, scene.cam.width, cfg, batch=100,
    )

    np.testing.assert_allclose(np.asarray(neq.A11), res["A11"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(neq.b1), res["b1"], atol=1e-10)

    # compare per-active-pixel quantities
    hw = cfg.num_pix
    act = np.asarray(neq.active)[:hw]
    np.testing.assert_array_equal(act, res["active"])
    a22 = np.stack(
        [np.asarray(neq.a22_xx), np.asarray(neq.a22_xy), np.asarray(neq.a22_yy)],
        axis=-1,
    )[:hw]
    b2 = np.stack([np.asarray(neq.b2_x), np.asarray(neq.b2_y)], axis=-1)[:hw]
    dim_pose = 3 * traj.num_knots
    A12full = np.asarray(neq.A12)
    dp_pad = A12full.shape[1] // 2
    # (HW, 2, dim): planes from the column halves
    A12 = np.stack(
        [A12full[:hw, :dim_pose], A12full[:hw, dp_pad : dp_pad + dim_pose]], axis=1
    )
    for pmpix, ai in res["active_ids"].items():
        blk = res["A22"][ai]
        np.testing.assert_allclose(
            a22[pmpix], [blk[0, 0], blk[0, 1], blk[1, 1]], atol=1e-10
        )
        np.testing.assert_allclose(
            b2[pmpix], res["b2"][2 * ai : 2 * ai + 2], atol=1e-10
        )
        np.testing.assert_allclose(
            A12[pmpix].T, res["A12"][:, 2 * ai : 2 * ai + 2], atol=1e-9
        )
    # inactive pixels carry no coupling
    assert np.abs(A12[~act]).max() == 0.0


def test_midpoint_sampling_matches_oracle(scene):
    """``sample_mode="mid"`` (midpoint-rule LEGM quadrature — a framework
    extension; ModelConfig.sample_mode): the full vectorized model vs the
    loop oracle in the same mode, plus streamed-forming equality."""
    import dataclasses as dc

    cfg = make_cfg(scene, sample_mode="mid")
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx * 0.9)
    Gy = jnp.asarray(scene.gy * 0.9)
    nk = traj.num_knots

    lin = M.linearize(knots, Gx, Gy, dev, cfg, need_deriv=True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, nk)

    res = oracle.evaluate_and_form(
        traj, np.asarray(Gx), np.asarray(Gy),
        win.t, win.x, win.y, win.pol, lut, scene.cam.width, cfg, batch=100,
    )
    assert int(jnp.sum(lin.inlier)) == len(res["meas"])
    np.testing.assert_array_equal(
        np.asarray(lin.num_ev_map).reshape(cfg.pano_height, cfg.pano_width),
        res["num_ev_map"],
    )
    np.testing.assert_allclose(
        float(M.data_cost(lin.e, cfg)), res["cost_data"], rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(neq.A11), res["A11"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(neq.b1), res["b1"], atol=1e-10)
    # map-side blocks key on the MIDPOINT pixels
    hw = cfg.num_pix
    a22 = np.stack(
        [np.asarray(neq.a22_xx), np.asarray(neq.a22_xy),
         np.asarray(neq.a22_yy)], axis=-1,
    )[:hw]
    b2 = np.stack([np.asarray(neq.b2_x), np.asarray(neq.b2_y)], axis=-1)[:hw]
    for pmpix, ai in res["active_ids"].items():
        blk = res["A22"][ai]
        np.testing.assert_allclose(
            a22[pmpix], [blk[0, 0], blk[0, 1], blk[1, 1]], atol=1e-10
        )
        np.testing.assert_allclose(
            b2[pmpix], res["b2"][2 * ai : 2 * ai + 2], atol=1e-10
        )

    # streamed forming matches classic under the midpoint mode too
    cfg_s = dc.replace(cfg, stream_chunk=977)
    cost_s, nem = M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg_s)
    np.testing.assert_allclose(
        float(cost_s), float(M.data_cost(lin.e, cfg)), rtol=1e-12
    )
    neq1 = M.form_normal_eq_streamed(nem, knots, Gx, Gy, dev, cfg_s, nk)
    np.testing.assert_allclose(
        np.asarray(neq1.A11), np.asarray(neq.A11), atol=1e-9, rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(neq1.A12), np.asarray(neq.A12),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(neq1.b1), np.asarray(neq.b1),
                               atol=1e-10)


def test_midpoint_reduces_model_error(scene):
    """At the GT trajectory and GT map the residual is pure LEGM quadrature
    error; the midpoint rule (O(|dp|^3) Taylor error vs the rectangle
    rule's O(|dp|^2)) must shrink it."""
    cfg_c = make_cfg(scene)
    cfg_m = make_cfg(scene, sample_mode="mid")
    traj, win, dev, lut = build_dev(scene, cfg_c)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lin_c = M.linearize(knots, Gx, Gy, dev, cfg_c, need_deriv=False)
    lin_m = M.linearize(knots, Gx, Gy, dev, cfg_m, need_deriv=False)

    def rms(lin):
        return float(
            jnp.sqrt(jnp.sum(lin.e * lin.e) / jnp.sum(lin.inlier))
        )

    assert rms(lin_m) < rms(lin_c)


@pytest.mark.parametrize("fix_first", [False, True])
def test_schur_solve_matches_oracle(scene, fix_first):
    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx * 0.9)
    Gy = jnp.asarray(scene.gy * 0.9)

    lin = M.linearize(knots, Gx, Gy, dev, cfg, need_deriv=True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, traj.num_knots)
    lam = 1e-3
    x1, x2 = M.solve_normal_eq(neq, lam, fix_first=fix_first)

    res = oracle.evaluate_and_form(
        traj, np.asarray(Gx), np.asarray(Gy),
        win.t, win.x, win.y, win.pol, lut, scene.cam.width, cfg, batch=100,
    )
    ox1, ox2 = oracle.schur_solve(res, lam, fix_first=fix_first)
    np.testing.assert_allclose(np.asarray(x1), ox1, atol=1e-8, rtol=1e-6)
    hw = cfg.num_pix
    x2_np = np.asarray(x2)[:, :hw]  # (2, HW)
    for pmpix, ai in res["active_ids"].items():
        np.testing.assert_allclose(
            x2_np[:, pmpix], ox2[2 * ai : 2 * ai + 2], atol=1e-8, rtol=1e-6
        )
    # inactive pixels receive zero increment
    assert np.abs(x2_np[:, ~np.asarray(neq.active)[:hw]]).max() == 0.0


def test_cg_solve_agrees_with_schur(scene):
    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx * 0.9)
    Gy = jnp.asarray(scene.gy * 0.9)
    lin = M.linearize(knots, Gx, Gy, dev, cfg, need_deriv=True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, traj.num_knots)
    x1s, x2s = M.solve_normal_eq(neq, 1e-2)
    x1c, x2c, it, err = M.solve_normal_eq_cg(neq, 1e-2, max_iter=500, tol=1e-10)
    np.testing.assert_allclose(np.asarray(x1c), np.asarray(x1s), atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x2c), np.asarray(x2s), atol=1e-6, rtol=1e-4)


def test_sobel_matches_numpy(scene):
    gx_j, gy_j = M.sobel_gradients(jnp.asarray(scene.brightness))
    gx_n, gy_n = synth.sobel_gradients_np(scene.brightness)
    np.testing.assert_allclose(np.asarray(gx_j), gx_n, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy_j), gy_n, atol=1e-12)


def test_form_normal_eq_pallas_path(scene):
    """The Pallas sorted-accumulation path must produce the same normal
    equations as the XLA scatter path (kernel runs interpreted on CPU)."""
    cfg = make_cfg(scene)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots, jnp.float32)
    Gx = jnp.asarray(scene.gx * 0.9, jnp.float32)
    Gy = jnp.asarray(scene.gy * 0.9, jnp.float32)
    dev32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, dev
    )
    lin = M.linearize(knots, Gx, Gy, dev32, cfg, need_deriv=True)
    neq0 = M.form_normal_eq(lin, Gx, Gy, cfg, traj.num_knots)
    neq1 = M.form_normal_eq(lin, Gx, Gy, cfg_p, traj.num_knots)
    # A11 runs a manual 3-pass bf16 hi/lo Gram expansion (~16-bit operand
    # mantissa; the dropped lo*lo term is below f32 round-off) — slightly
    # looser than the P-exact 2-pass A12 splits.
    np.testing.assert_allclose(
        np.asarray(neq1.A11), np.asarray(neq0.A11), rtol=3e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(neq1.A12), np.asarray(neq0.A12), rtol=1e-5, atol=1e-4
    )
    for f in ("a22_xx", "a22_xy", "a22_yy", "b2_x", "b2_y"):
        np.testing.assert_allclose(
            np.asarray(getattr(neq1, f)), np.asarray(getattr(neq0, f)),
            rtol=1e-5, atol=1e-4,
        )

    # compact mode through the Pallas kernel: same pose solve as the
    # compact XLA-scatter path
    n_active = int(neq0.active.sum())
    cfg_pc = dataclasses.replace(cfg_p, compact_cap=n_active + 9)
    cfg_sc = dataclasses.replace(cfg, compact_cap=n_active + 9)
    neq_pc = M.form_normal_eq(lin, Gx, Gy, cfg_pc, traj.num_knots)
    neq_sc = M.form_normal_eq(lin, Gx, Gy, cfg_sc, traj.num_knots)
    x1p, x2p = M.solve_normal_eq(neq_pc, jnp.asarray(1e-3, jnp.float32), True)
    x1s, x2s = M.solve_normal_eq(neq_sc, jnp.asarray(1e-3, jnp.float32), True)
    np.testing.assert_allclose(np.asarray(x1p), np.asarray(x1s), atol=5e-4)
    gp = M.update_map(Gx, Gy, x2p, 1.0, neq_pc)
    gs = M.update_map(Gx, Gy, x2s, 1.0, neq_sc)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]), atol=5e-4)


def test_compact_cap_equivalence(scene):
    """Active-pixel compaction (compact_cap) must reproduce the non-compact
    solve exactly: same pose increment, same map update (the row space is a
    permutation of the active pixels; reference solves the full pixel grid,
    model.cpp:700-860)."""
    import dataclasses as dc

    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    nk = traj.num_knots

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq0 = M.form_normal_eq(lin, Gx, Gy, cfg, nk)
    n_active = int(neq0.active.sum())

    cfg_c = dc.replace(cfg, compact_cap=n_active + 37)
    neq1 = M.form_normal_eq(lin, Gx, Gy, cfg_c, nk)
    assert neq1.a22_xx.shape[0] < neq0.a22_xx.shape[0]
    assert int(neq1.active.sum()) == n_active

    x1a, x2a = M.solve_normal_eq(neq0, jnp.asarray(1e-3), True)
    x1b, x2b = M.solve_normal_eq(neq1, jnp.asarray(1e-3), True)
    np.testing.assert_allclose(np.asarray(x1b), np.asarray(x1a), atol=1e-10)

    gxa, gya = M.update_map(Gx, Gy, x2a, 1.0, neq0)
    gxb, gyb = M.update_map(Gx, Gy, x2b, 1.0, neq1)
    np.testing.assert_allclose(np.asarray(gxb), np.asarray(gxa), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gyb), np.asarray(gya), atol=1e-10)


def test_compact_cap_overflow_drops_rows(scene):
    """A cap SMALLER than the active count must not crash: overflow pixels are
    dropped from the solve (their map entries zeroed as inactive-like)."""
    import dataclasses as dc

    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    nk = traj.num_knots

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq0 = M.form_normal_eq(lin, Gx, Gy, cfg, nk)
    n_active = int(neq0.active.sum())
    cap = max(8, n_active // 2)
    cfg_c = dc.replace(cfg, compact_cap=cap)
    neq1 = M.form_normal_eq(lin, Gx, Gy, cfg_c, nk)
    assert int(neq1.active.sum()) <= ((cap + 127) // 128) * 128
    x1, x2 = M.solve_normal_eq(neq1, jnp.asarray(1e-3), True)
    assert np.isfinite(np.asarray(x1)).all()
    gx, gy = M.update_map(Gx, Gy, x2, 1.0, neq1)
    assert np.isfinite(np.asarray(gx)).all()


def test_compact_cap_overflow_symmetric(scene):
    """Overflow measurements (active pixels beyond the cap) must drop from
    EVERY normal-equation block — pose block included — keeping the system
    symmetric; neq.dropped counts them (no silent truncation)."""
    import dataclasses as dc

    # shrink the kernel row-tile so the fixture's modest active set really
    # overflows an undersized cap (row padding granularity = TILE_PX)
    from emba_tpu.kernels import a12_accum

    tile_px = 64
    orig_tile = a12_accum.TILE_PX
    a12_accum.TILE_PX = tile_px
    try:
        cfg = make_cfg(scene, thres_valid_pixel=2)
        traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
        knots = jnp.asarray(traj.knots)
        Gx = jnp.asarray(scene.gx)
        Gy = jnp.asarray(scene.gy)
        nk = traj.num_knots

        lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
        neq0 = M.form_normal_eq(lin, Gx, Gy, cfg, nk)
        assert int(neq0.dropped) == 0
        assert int(neq0.active_count) == int(neq0.active.sum())
        n_active = int(neq0.active.sum())
        assert n_active > tile_px, "fixture too sparse for an overflow test"
        cap = max(8, n_active // 2)
        r_pad = -(-cap // tile_px) * tile_px
        _overflow_symmetry_check(lin, Gx, Gy, cfg, nk, cap, r_pad)
    finally:
        a12_accum.TILE_PX = orig_tile


def _overflow_symmetry_check(lin, Gx, Gy, cfg, nk, cap, r_pad):
    import dataclasses as dc

    # emulate the capped row space on host: active pixels in compact order
    active = np.asarray(lin.num_ev_map) >= cfg.thres_valid_pixel
    compact_id = np.cumsum(active.astype(np.int64)) - 1
    pix = np.asarray(lin.pm_pix)
    on_overflow = active[pix] & (compact_id[pix] >= r_pad)
    expected_dropped = int(
        np.sum(np.asarray(lin.inlier) & on_overflow)
    )
    assert expected_dropped > 0  # the fixture must actually overflow

    cfg_c = dc.replace(cfg, compact_cap=cap)
    neq1 = M.form_normal_eq(lin, Gx, Gy, cfg_c, nk)
    assert int(neq1.dropped) == expected_dropped

    # reference semantics check: pose block equals a no-cap build where the
    # overflow measurements are masked out entirely
    lin_masked = dataclasses.replace(
        lin,
        inlier=lin.inlier & jnp.asarray(~on_overflow),
        e=jnp.where(jnp.asarray(on_overflow), 0.0, lin.e),
    )
    neq2 = M.form_normal_eq(lin_masked, Gx, Gy, cfg, nk)
    np.testing.assert_allclose(
        np.asarray(neq1.A11), np.asarray(neq2.A11), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(neq1.b1), np.asarray(neq2.b1), atol=1e-10
    )


def test_streamed_form_matches_classic(scene):
    """The streamed forming pass (chunk-recomputed Jacobians, light
    linearization) must reproduce the classic linearize-then-form normal
    equations, including an odd chunk size exercising the tail mask."""
    import dataclasses as dc

    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    nk = traj.num_knots

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq0 = M.form_normal_eq(lin, Gx, Gy, cfg, nk)

    for sc in (977, 4096):
        cfg_s = dc.replace(cfg, stream_chunk=sc)
        # streamed objective: cost + activity map match the classic pass
        cost_s, nem = M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg_s)
        np.testing.assert_allclose(
            float(cost_s), float(M.data_cost(lin.e, cfg)), rtol=1e-12,
            err_msg=f"streamed cost sc={sc}",
        )
        np.testing.assert_array_equal(
            np.asarray(nem), np.asarray(lin.num_ev_map)
        )
        neq1 = M.form_normal_eq_streamed(nem, knots, Gx, Gy, dev, cfg_s, nk)
        np.testing.assert_allclose(
            np.asarray(neq1.A11), np.asarray(neq0.A11), atol=1e-9, rtol=1e-9,
            err_msg=f"A11 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.b1), np.asarray(neq0.b1), atol=1e-10,
            err_msg=f"b1 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.A12), np.asarray(neq0.A12), atol=1e-9,
            err_msg=f"A12 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.a22_xx), np.asarray(neq0.a22_xx), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(neq1.b2_x), np.asarray(neq0.b2_x), atol=1e-10
        )
        assert int(neq1.dropped) == 0

    # streamed + compaction compose
    n_active = int(neq0.active.sum())
    cfg_sc = dc.replace(cfg, stream_chunk=977, compact_cap=n_active + 11)
    _, nem = M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg_sc)
    neq2 = M.form_normal_eq_streamed(nem, knots, Gx, Gy, dev, cfg_sc, nk)
    x1a, _ = M.solve_normal_eq(neq0, jnp.asarray(1e-3), True)
    x1b, _ = M.solve_normal_eq(neq2, jnp.asarray(1e-3), True)
    np.testing.assert_allclose(np.asarray(x1b), np.asarray(x1a), atol=1e-10)


def test_streamed_light_form_matches_classic(scene):
    """The LIGHT streaming tier (resident (N,) residual fields from a
    need_deriv=False linearize; Jacobian-only chunk recompute) must
    reproduce the classic normal equations, including odd chunk sizes and
    composition with compaction."""
    import dataclasses as dc

    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    nk = traj.num_knots

    lin_full = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq0 = M.form_normal_eq(lin_full, Gx, Gy, cfg, nk)

    lin_light = M.linearize(knots, Gx, Gy, dev, cfg, False)
    assert lin_light.Jc.shape[1] == 0  # truly light: no resident Jacobians

    for sc in (977, 4096):
        cfg_l = dc.replace(cfg, stream_chunk=sc, stream_light=True)
        neq1 = M.form_normal_eq_streamed(lin_light, knots, Gx, Gy, dev,
                                         cfg_l, nk)
        np.testing.assert_allclose(
            np.asarray(neq1.A11), np.asarray(neq0.A11), atol=1e-9, rtol=1e-9,
            err_msg=f"A11 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.b1), np.asarray(neq0.b1), atol=1e-10,
            err_msg=f"b1 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.A12), np.asarray(neq0.A12), atol=1e-9,
            err_msg=f"A12 sc={sc}",
        )
        np.testing.assert_allclose(
            np.asarray(neq1.a22_xx), np.asarray(neq0.a22_xx), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(neq1.b2_x), np.asarray(neq0.b2_x), atol=1e-10
        )
        assert int(neq1.dropped) == 0

    # light tier + compaction compose
    n_active = int(neq0.active.sum())
    cfg_lc = dc.replace(cfg, stream_chunk=977, stream_light=True,
                        compact_cap=n_active + 11)
    neq2 = M.form_normal_eq_streamed(lin_light, knots, Gx, Gy, dev, cfg_lc,
                                     nk)
    x1a, _ = M.solve_normal_eq(neq0, jnp.asarray(1e-3), True)
    x1b, _ = M.solve_normal_eq(neq2, jnp.asarray(1e-3), True)
    np.testing.assert_allclose(np.asarray(x1b), np.asarray(x1a), atol=1e-9)


def test_linearize_streamed_light_matches_onepass(scene):
    """The chunk-streamed light linearization (the light tier's objective
    pass) must equal the one-pass need_deriv=False linearize bit-for-bit —
    both run the shared _pair_residual core; only the evaluation order
    differs."""
    import dataclasses as dc

    cfg = make_cfg(scene)
    traj, win, dev, lut = build_dev(scene, cfg, perturb=0.01)
    knots = jnp.asarray(traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)

    ref = M.linearize(knots, Gx, Gy, dev, cfg, False)
    ref_cost = M.data_cost(ref.e, cfg)

    for sc in (977, 4096):
        cfg_s = dc.replace(cfg, stream_chunk=sc, stream_light=True)
        lin, cost = M.linearize_streamed_light(knots, Gx, Gy, dev, cfg_s)
        np.testing.assert_array_equal(np.asarray(lin.e), np.asarray(ref.e))
        np.testing.assert_array_equal(
            np.asarray(lin.inlier), np.asarray(ref.inlier)
        )
        np.testing.assert_array_equal(
            np.asarray(lin.pm_pix), np.asarray(ref.pm_pix)
        )
        np.testing.assert_array_equal(
            np.asarray(lin.num_ev_map), np.asarray(ref.num_ev_map)
        )
        np.testing.assert_array_equal(np.asarray(lin.i_c), np.asarray(ref.i_c))
        np.testing.assert_array_equal(np.asarray(lin.i_p), np.asarray(ref.i_p))
        np.testing.assert_array_equal(np.asarray(lin.dx), np.asarray(ref.dx))
        np.testing.assert_allclose(float(cost), float(ref_cost), rtol=1e-12)
