"""Map-only solve (fixed trajectory — the production high-resolution path).

The reference's 4K outputs are maps rendered from 1K-refined trajectories;
`model.solve_map_only` is the corresponding closed-form per-pixel solve.
Equivalence oracle: the joint producers' map blocks (form_normal_eq ->
a22_*/b2_* with the L2 reg applied) solved at lambda=0 must give the same
map as map_only_step, and the result must be the exact quadratic-cost
minimizer (zero gradient wrt the active-pixel map values).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from emba_tpu import model, pairing, spline, synth


def _small_problem(stream_chunk=1 << 12):
    rng = np.random.default_rng(7)
    cam = synth.default_sensor(48, 48, f=44.0)
    B = synth.smooth_random_map(96, 192, rng, smooth=3, amp=3.0)
    scene = synth.generate(rng, cam, pano_width=192, pano_height=96,
                           c_th=0.1, t_end=1.0, dt_knots=0.05, num_steps=400,
                           motion_amp=0.25, brightness=B)
    cfg = model.ModelConfig(c_th=0.1, pano_width=192, pano_height=96,
                            thres_valid_pixel=3, alpha=0.5,
                            outlier_dp_norm=3.0, stream_chunk=stream_chunk)
    # a perturbed-but-fixed trajectory (the map solve must not assume GT)
    steps = rng.normal(size=(scene.traj.num_knots, 3)) * 0.005
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj = dataclasses.replace(
        scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots
    )
    win = pairing.build_window(scene.t, scene.x, scene.y, scene.pol,
                               cam.width, traj.locate, 100)
    dev = model.DeviceWindow.from_window(win, cam.bearing_lut(), cam.width,
                                         jnp.float64)
    knots = jnp.asarray(traj.knots)
    gx = jnp.asarray(scene.gx)
    gy = jnp.asarray(scene.gy)
    return knots, gx, gy, dev, cfg


def test_map_only_matches_joint_map_blocks():
    """map_only_step == (form_normal_eq's map blocks solved at lambda=0,
    applied with update_map semantics), bit-tight in f64."""
    knots, gx, gy, dev, cfg = _small_problem()

    # joint-path oracle: full normal equations, take the map rows
    cfg_classic = dataclasses.replace(cfg, stream_chunk=None)
    lin = model.linearize(knots, gx, gy, dev, cfg_classic, True)
    neq = model.form_normal_eq(lin, gx, gy, cfg_classic, knots.shape[0])
    a = neq.a22_xx
    b = neq.a22_xy
    d = neq.a22_yy
    det = a * d - b * b
    ok = (neq.active & (jnp.abs(det) >= 1e-30))
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    x2x = (d * neq.b2_x - b * neq.b2_y) * inv
    x2y = (a * neq.b2_y - b * neq.b2_x) * inv
    gx_exp, gy_exp = model.update_map(
        gx, gy, jnp.stack([x2x, x2y]), 1.0, neq
    )

    gx_new, gy_new, cost0, nem = model.map_only_step(knots, gx, gy, dev, cfg)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_exp),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gy_new), np.asarray(gy_exp),
                               rtol=1e-12, atol=1e-12)
    # activity map matches the linearization's
    np.testing.assert_array_equal(np.asarray(nem),
                                  np.asarray(lin.num_ev_map))


def test_map_only_is_exact_quadratic_minimizer():
    """After one solve from ANY init (here: zeros), the regularized data
    cost has zero gradient wrt the active-pixel map values, and a second
    step is a fixed point."""
    knots, gx_gt, gy_gt, dev, cfg = _small_problem()
    z = jnp.zeros_like(gx_gt)
    gx1, gy1, cost0, nem = model.map_only_step(knots, z, z, dev, cfg)
    active = np.asarray(nem) >= cfg.thres_valid_pixel

    def masked_cost(g):
        gx, gy = g
        # total cost restricted to the free variables: data term (inliers
        # on active pixels contribute; inactive-pixel map values are pinned
        # at zero by update_map) + the active-pixel L2 regularizer
        gxa = jnp.where(jnp.asarray(active).reshape(gx.shape), gx, 0.0)
        gya = jnp.where(jnp.asarray(active).reshape(gy.shape), gy, 0.0)
        cost, _ = model.cost_and_activity_streamed(knots, gxa, gya, dev, cfg)
        return cost + model.reg_cost(gxa, gya, cfg.alpha)

    ggx, ggy = jax.grad(masked_cost)((gx1, gy1))
    act2 = active.reshape(np.asarray(gx1).shape)
    assert float(np.max(np.abs(np.asarray(ggx)[act2]))) < 1e-8
    assert float(np.max(np.abs(np.asarray(ggy)[act2]))) < 1e-8

    # fixed point + cost decrease
    gx2, gy2, cost1, _ = model.map_only_step(knots, gx1, gy1, dev, cfg)
    assert float(cost1) < float(cost0)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gy2), np.asarray(gy1), atol=1e-9)


def test_solve_map_only_wrapper():
    knots, gx_gt, gy_gt, dev, cfg = _small_problem()
    z = jnp.zeros_like(gx_gt)
    gx, gy, costs = model.solve_map_only(knots, z, z, dev, cfg, num_iters=1)
    assert len(costs) == 2 and costs[1] < costs[0]
    # the solved map correlates strongly with GT on active pixels
    _, _, _, nem = model.map_only_step(knots, z, z, dev, cfg)
    act = (np.asarray(nem) >= cfg.thres_valid_pixel).reshape(gx.shape)
    got = np.asarray(gx)[act]
    want = np.asarray(gx_gt)[act]
    c = np.corrcoef(got, want)[0, 1]
    assert c > 0.85, c
