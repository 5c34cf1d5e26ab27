"""End-to-end bundle adjustment on synthetic events: the recover-the-known-
trajectory fixture (SURVEY.md §4 — the validation the reference only does
manually against datasets).

Key regime note (validated during bring-up): the LEGM is a local
linearization — measurements with large inter-event displacement |dp| carry
systematic model error, so the synthetic scene uses sharp texture (small dp)
and a tight outlier cut. With those, BA from a several-degree perturbation
must recover the trajectory to well under a degree, mirroring the
reference's headline behavior (BASELINE.md: CMax-SLAM 1.69->0.92 deg etc.).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from emba_tpu import metrics, model, pairing, solver, spline, synth


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    sensor = synth.default_sensor(48, 48, f=44.0)
    B = synth.smooth_random_map(96, 192, rng, smooth=3, amp=3.0)
    scene = synth.generate(
        rng,
        sensor,
        pano_width=192,
        pano_height=96,
        c_th=0.1,
        t_end=1.0,
        dt_knots=0.05,
        num_steps=600,
        motion_amp=0.25,
        brightness=B,
    )
    cfg = model.ModelConfig(
        c_th=0.1,
        pano_width=192,
        pano_height=96,
        thres_valid_pixel=3,
        alpha=0.5,
        outlier_dp_norm=3.0,
    )
    return rng, sensor, scene, cfg


def test_ba_recovers_trajectory(setup):
    rng, sensor, scene, cfg = setup
    # large smooth perturbation (random-walk on the knots), several degrees
    steps = rng.normal(size=(scene.traj.num_knots, 3)) * 0.02
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    tt = np.linspace(0.05, 0.95, 200)
    R_gt = np.asarray(scene.traj.evaluate(tt))
    rmse0 = metrics.trajectory_rmse_deg(traj0, tt, R_gt)
    assert rmse0 > 1.5  # the perturbation is actually large

    knots, Gx, Gy, st = solver.solve_window(
        jnp.asarray(traj0.knots),
        jnp.asarray(scene.gx),
        jnp.asarray(scene.gy),
        dev,
        cfg,
        solver.LMConfig(max_num_iter=40),
        fix_first=True,
    )
    tA = dataclasses.replace(traj0, knots=np.asarray(knots))
    rmse1 = metrics.trajectory_rmse_deg(tA, tt, R_gt)

    # cost must drop by a large factor and RMSE recover to < 1 degree
    assert st.iterations[-1]["cost_min"] < 0.2 * st.iterations[0]["cost_min"]
    assert rmse1 < 1.0
    assert rmse1 < 0.5 * rmse0
    # map stays finite and correlated with GT gradients on active pixels
    gx = np.asarray(Gx)
    assert np.isfinite(gx).all()
    act = np.abs(gx) > 0
    corr = np.corrcoef(gx[act], scene.gx[act])[0, 1]
    assert corr > 0.8


def test_ba_small_window_no_nan(setup):
    """Sparse windows leave knots unobserved — the solve must stay finite
    (regression: singular Schur complement produced NaN knots)."""
    rng, sensor, scene, cfg = setup
    win = pairing.build_window(
        scene.t[:300],
        scene.x[:300],
        scene.y[:300],
        scene.pol[:300],
        sensor.width,
        scene.traj.locate,
        100,
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    knots, Gx, Gy, st = solver.solve_window(
        jnp.asarray(scene.traj.knots),
        jnp.asarray(scene.gx),
        jnp.asarray(scene.gy),
        dev,
        cfg,
        solver.LMConfig(max_num_iter=2),
        fix_first=True,
    )
    assert np.isfinite(np.asarray(knots)).all()
    assert np.isfinite(np.asarray(Gx)).all()


def test_ba_cubic_spline(setup):
    """Order-4 (cubic) trajectory end-to-end: linearize + solve one LM step
    reduces the cost (exercises D=12 Jacobian blocks through the whole
    normal-equation machinery; reference CubicTrajectory parity)."""
    rng, sensor, scene, cfg = setup
    import dataclasses as dc

    cfg4 = dc.replace(cfg, spline_order=4)
    # refit the GT trajectory as a cubic spline
    tt = np.linspace(0.0, 1.0, 300)
    R = np.asarray(scene.traj.evaluate(tt))
    traj4 = spline.Trajectory.from_poses(tt, R, 0.0, 1.0, 0.05, order=4)
    pert = np.random.default_rng(1).normal(size=(traj4.num_knots, 3)) * 0.01
    traj4p = dataclasses.replace(traj4, knots=spline._np_exp(pert) @ traj4.knots)
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj4p.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    knots, Gx, Gy, st = solver.solve_window(
        jnp.asarray(traj4p.knots),
        jnp.asarray(scene.gx),
        jnp.asarray(scene.gy),
        dev,
        cfg4,
        solver.LMConfig(max_num_iter=5),
        fix_first=True,
    )
    assert st.iterations[-1]["cost_min"] < 0.8 * st.iterations[0]["cost_min"]
    assert np.isfinite(np.asarray(knots)).all()


def test_mid_window_checkpoint_resume_bitexact(setup):
    """Mid-window LM checkpoint/resume (SURVEY.md §5): interrupt a
    host-loop solve partway, resume from the captured LM state, and
    BIT-match the uninterrupted run — every LM decision depends only on
    (state, lambda, cost_min, tol counter), all restored exactly."""
    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(9).normal(size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    k0 = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lmc = solver.LMConfig(max_num_iter=10)

    # uninterrupted reference run
    k_ref, gx_ref, gy_ref, st_ref = solver.solve_window(
        k0, Gx, Gy, dev, cfg, lmc, fix_first=True
    )

    # interrupted run: capture the state at iteration 4, then "die"
    class Killed(Exception):
        pass

    captured = {}

    def ck(state):
        captured.update(state)
        if state["it"] >= 4:
            raise Killed

    with pytest.raises(Killed):
        solver.solve_window(
            k0, Gx, Gy, dev, cfg, lmc, fix_first=True,
            checkpoint_cb=ck, checkpoint_every=1,
        )
    assert captured["it"] == 4

    # resume: the final state must BIT-match the uninterrupted run
    k_res, gx_res, gy_res, st_res = solver.solve_window(
        k0, Gx, Gy, dev, cfg, lmc, fix_first=True, resume_state=captured
    )
    assert len(st_res.iterations) == len(st_ref.iterations) - 4
    assert (
        st_res.iterations[-1]["cost_min"] == st_ref.iterations[-1]["cost_min"]
    )
    np.testing.assert_array_equal(np.asarray(k_res), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(gx_res), np.asarray(gx_ref))
    np.testing.assert_array_equal(np.asarray(gy_res), np.asarray(gy_ref))


def test_fused_solver_matches_host_loop(setup):
    """The on-device while_loop LM must follow the same accept/reject path
    as the host-driven loop (same final cost within float tolerance)."""
    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(7).normal(size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    k0 = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    kh, gxh, gyh, st = solver.solve_window(
        k0, Gx, Gy, dev, cfg, solver.LMConfig(max_num_iter=8), fix_first=True
    )
    kf, gxf, gyf, cost_f, it_f, conv_f = solver.solve_window_fused(
        k0, Gx, Gy, dev, cfg, jnp.asarray(1.0), jnp.asarray(1e-3),
        fix_first=True, max_num_iter=8,
    )
    assert int(it_f) == len(st.iterations)
    np.testing.assert_allclose(
        float(cost_f), st.iterations[-1]["cost_min"], rtol=1e-9
    )
    np.testing.assert_allclose(np.asarray(kf), np.asarray(kh), atol=1e-10)


def test_fused_solver_irls(setup):
    """Fused LM with IRLS (cauchy) runs and reduces the robust cost."""
    rng, sensor, scene, cfg = setup
    import dataclasses as dc

    cfg_i = dc.replace(cfg, use_irls=True, cost_type="cauchy", eta=0.5)
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, scene.traj.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    pert = np.random.default_rng(2).normal(size=(scene.traj.num_knots, 3)) * 0.01
    k0 = jnp.asarray(spline._np_exp(pert) @ scene.traj.knots)
    kf, gx, gy, cost, it, conv = solver.solve_window_fused(
        k0, jnp.asarray(scene.gx), jnp.asarray(scene.gy), dev, cfg_i,
        jnp.asarray(1.0), jnp.asarray(1e-3), fix_first=True, max_num_iter=6,
    )
    lin0 = model.linearize(k0, jnp.asarray(scene.gx), jnp.asarray(scene.gy),
                           dev, cfg_i, False)
    cost0 = float(model.data_cost(lin0.e, cfg_i)) + float(
        model.reg_cost(jnp.asarray(scene.gx), jnp.asarray(scene.gy), cfg_i.alpha)
    )
    assert float(cost) < 0.8 * cost0
    assert np.isfinite(np.asarray(kf)).all()


def test_light_trial_matches_classic(setup):
    """LIGHT-TRIAL classic mode (cfg.light_trial): trials pay only the cost
    pass, forming relinearizes on accept — the LM path (iterations,
    accepts) must be identical to the classic two-phase path, and results
    match to cross-program float-association tolerance (the recomputed
    Jacobians are the same ops on the same inputs; XLA may fuse the two
    programs differently at the ULP level)."""
    import dataclasses as dc

    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(7).normal(size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    knots = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)
    cfg_lt = dc.replace(cfg, light_trial=True)

    k1, gx1, gy1, c1, it1, cv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True, max_num_iter=8
    )
    k2, gx2, gy2, c2, it2, cv2 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_lt, damping, tolf, fix_first=True,
        max_num_iter=8,
    )
    assert int(it2) == int(it1)
    assert bool(cv2) == bool(cv1)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-9)

    # host loop, light trial: same final state
    k3, gx3, gy3, st = solver.solve_window(
        knots, Gx, Gy, dev, cfg_lt, solver.LMConfig(max_num_iter=8),
        fix_first=True,
    )
    assert len(st.iterations) == int(it1)
    np.testing.assert_allclose(np.asarray(k3), np.asarray(k1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx3), np.asarray(gx1), atol=1e-9)

    # IRLS composes with light trial (weights derive from the residual only)
    cfg_i = dc.replace(cfg, use_irls=True, cost_type="cauchy", eta=0.5)
    cfg_il = dc.replace(cfg_i, light_trial=True)
    k4, *_ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_i, damping, tolf, fix_first=True,
        max_num_iter=5,
    )
    k5, *_ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_il, damping, tolf, fix_first=True,
        max_num_iter=5,
    )
    np.testing.assert_allclose(np.asarray(k5), np.asarray(k4), atol=1e-10)


def test_fused_solver_streamed_matches_classic(setup):
    """solve_window_fused with streamed forming must walk the same LM
    iterates as the classic path (identical accept/reject, same result)."""
    import dataclasses as dc

    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(7).normal(size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    knots = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, c1, it1, cv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True, max_num_iter=6
    )
    cfg_s = dc.replace(cfg, stream_chunk=2048)
    k2, gx2, gy2, c2, it2, cv2 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_s, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it2) == int(it1)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-9)


def test_fused_solver_padded_window_matches(setup):
    """A window pre-padded to a chunk multiple (pad_multiple) must solve
    identically: padding slots are has_prev=False non-measurements, so they
    contribute to nothing (they only let the streamed passes hold zero
    padded copies at trace time)."""
    import dataclasses as dc

    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(7).normal(size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    cfg_s = dc.replace(cfg, stream_chunk=2048)
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    assert dev.pol_signed.shape[0] % 2048 != 0, "fixture should need padding"
    dev_pad = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64,
        pad_multiple=2048,
    )
    assert dev_pad.pol_signed.shape[0] % 2048 == 0
    knots = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, c1, it1, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_s, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    k2, gx2, gy2, c2, it2, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev_pad, cfg_s, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it2) == int(it1)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-12)


def test_fused_solver_streamed_light_matches_classic(setup):
    """The LIGHT streaming tier in the fused solver (host loop too) must
    walk the same LM iterates as the classic path: same accept/reject
    schedule, same result — the fast tier of two-tier streaming."""
    import dataclasses as dc

    rng, sensor, scene, cfg = setup
    steps = np.random.default_rng(7).normal(
        size=(scene.traj.num_knots, 3)) * 0.015
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj0.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    knots = jnp.asarray(traj0.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, c1, it1, cv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True, max_num_iter=6
    )
    cfg_l = dc.replace(cfg, stream_chunk=2048, stream_light=True)
    k2, gx2, gy2, c2, it2, cv2 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_l, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it2) == int(it1)
    assert bool(cv2) == bool(cv1)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-9)

    # host loop, light tier: same final state as the fused light solve
    k3, gx3, gy3, st = solver.solve_window(
        knots, Gx, Gy, dev, cfg_l, solver.LMConfig(max_num_iter=6),
        fix_first=True,
    )
    assert st.iterations, "host loop must record per-iteration data"
    np.testing.assert_allclose(np.asarray(k3), np.asarray(k2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx3), np.asarray(gx2), atol=1e-9)
