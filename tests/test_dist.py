"""Distribution tests on the virtual 8-device CPU mesh: the sharded BA step
must agree with the single-device computation bit-for-bit in f64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emba_tpu import dist, model, pairing, synth


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(9)
    sensor = synth.default_sensor(32, 32, f=30.0)
    scene = synth.generate(
        rng,
        sensor,
        pano_width=128,
        pano_height=64,
        c_th=0.15,
        t_end=0.5,
        dt_knots=0.05,
        num_steps=150,
        motion_amp=0.2,
    )
    cfg = model.ModelConfig(
        c_th=0.15, pano_width=128, pano_height=64, thres_valid_pixel=2, alpha=1.0
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, scene.traj.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    return scene, cfg, dev


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_single(problem, mesh_shape):
    scene, cfg, dev = problem
    assert len(jax.devices()) >= 8

    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lam = jnp.asarray(1e-3, jnp.float64)

    # single device reference
    mesh1 = dist.make_mesh(1, 1, jax.devices()[:1])
    step1 = dist.make_sharded_step(mesh1, cfg, scene.traj.num_knots, True)
    k1, gx1, gy1, co1, cn1 = step1(
        dist.replicate(mesh1, knots), dist.replicate(mesh1, Gx),
        dist.replicate(mesh1, Gy), dist.shard_window(dev, mesh1), lam,
    )

    mesh = dist.make_mesh(mesh_shape[0], mesh_shape[1], jax.devices()[:8])
    step = dist.make_sharded_step(mesh, cfg, scene.traj.num_knots, True)
    k8, gx8, gy8, co8, cn8 = step(
        dist.replicate(mesh, knots), dist.replicate(mesh, Gx),
        dist.replicate(mesh, Gy), dist.shard_window(dev, mesh), lam,
    )

    np.testing.assert_allclose(float(co8), float(co1), rtol=1e-12)
    np.testing.assert_allclose(float(cn8), float(cn1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-10)


def test_sharded_step_compact_matches(problem):
    """Active-pixel compaction composes with the GSPMD step (the compact row
    space is a global cumsum over the psum'd activity map): the compact
    sharded step equals the non-compact sharded step."""
    import dataclasses as dc

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lam = jnp.asarray(1e-3, jnp.float64)

    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    args = (
        dist.replicate(mesh, knots), dist.replicate(mesh, Gx),
        dist.replicate(mesh, Gy), dist.shard_window(dev, mesh), lam,
    )
    step = dist.make_sharded_step(mesh, cfg, scene.traj.num_knots, True)
    k0, gx0, gy0, co0, cn0 = step(*args)

    cfg_c = dc.replace(cfg, compact_cap=512)  # > active count
    step_c = dist.make_sharded_step(mesh, cfg_c, scene.traj.num_knots, True)
    kc, gxc, gyc, coc, cnc = step_c(*args)

    np.testing.assert_allclose(float(coc), float(co0), rtol=1e-12)
    np.testing.assert_allclose(float(cnc), float(cn0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(kc), np.asarray(k0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gxc), np.asarray(gx0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gyc), np.asarray(gy0), atol=1e-10)


def test_pad_window_masks_tail(problem):
    scene, cfg, dev = problem
    padded = dist.pad_window(dev, 7)
    n0 = dev.pol_signed.shape[0]
    assert padded.pol_signed.shape[0] % 7 == 0
    assert not bool(padded.has_prev[n0:].any())
    # padded events produce no measurements -> same cost
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lin0 = model.linearize(knots, Gx, Gy, dev, cfg, False)
    lin1 = model.linearize(knots, Gx, Gy, padded, cfg, False)
    np.testing.assert_allclose(
        float(model.data_cost(lin1.e, cfg)), float(model.data_cost(lin0.e, cfg)),
        rtol=1e-12,
    )


NUM_SENSOR_PIX = 32 * 32


def test_shardmap_normal_eq_matches_single(problem):
    """The explicit-collective (shard_map) normal-equation build matches the
    single-device build EXACTLY: the halo exchange supplies every cross-shard
    prev event, so no pairs are dropped (reference pairs with no regard to
    any partitioning, model.cpp:179-246)."""
    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)

    import emba_tpu.model as M

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, scene.traj.num_knots)

    for mesh_shape in [(1, 1), (4, 2), (8, 1)]:
        mesh = dist.make_mesh(*mesh_shape, jax.devices()[: np.prod(mesh_shape)])
        f = dist.make_shardmap_normal_eq(
            mesh, cfg, scene.traj.num_knots, NUM_SENSOR_PIX
        )
        n8 = f(*dist.replicate(mesh, knots, Gx, Gy), dist.shard_window(dev, mesh))
        np.testing.assert_allclose(
            np.asarray(n8.A11), np.asarray(neq.A11), atol=1e-9,
            err_msg=f"A11 {mesh_shape}",
        )
        np.testing.assert_allclose(
            np.asarray(n8.b1), np.asarray(neq.b1), atol=1e-10,
            err_msg=f"b1 {mesh_shape}",
        )
        np.testing.assert_allclose(
            np.asarray(n8.A12), np.asarray(neq.A12), atol=1e-9,
            err_msg=f"A12 {mesh_shape}",
        )
        np.testing.assert_allclose(
            np.asarray(n8.a22_xx), np.asarray(neq.a22_xx), atol=1e-9,
            err_msg=f"a22_xx {mesh_shape}",
        )
        np.testing.assert_allclose(
            np.asarray(n8.b2_x), np.asarray(neq.b2_x), atol=1e-10,
            err_msg=f"b2_x {mesh_shape}",
        )
        assert int(n8.active_count) == int(neq.active_count)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_solve_window_sharded_matches_fused(problem, mesh_shape):
    """The COMPLETE sharded LM window (halo pairing + distributed Schur +
    accept/reject lambda schedule on the mesh) must reproduce the
    single-device fused solver: same iterate count, same final cost, same
    knots and maps (f64, tight tolerance)."""
    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=8,
    )

    mesh = dist.make_mesh(*mesh_shape, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=8,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )

    assert int(it8) == int(it1)
    assert bool(conv8) == bool(conv1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


@pytest.fixture(scope="module")
def problem4(problem):
    """Order-4 (cubic) variant of the problem fixture: the GT trajectory
    refit as a cubic spline (reference CubicTrajectory,
    src/utils/trajectory.cpp:481-626), same events, D=12 blocks."""
    import dataclasses as dc

    from emba_tpu import spline, synth

    scene, cfg, _ = problem
    sensor = synth.default_sensor(32, 32, f=30.0)
    tt = np.linspace(0.0, 0.5, 200)
    R = np.asarray(scene.traj.evaluate(tt))
    traj4 = spline.Trajectory.from_poses(tt, R, 0.0, 0.5, 0.05, order=4)
    cfg4 = dc.replace(cfg, spline_order=4)
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width, traj4.locate, 100
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    return scene, traj4, cfg4, dev


def test_solve_window_sharded_matches_fused_order4(problem4):
    """ORDER-4 at full depth (VERDICT r3 item 3): the sharded LM window on
    an 8-shard virtual mesh and the host loop must both reproduce the
    single-device fused solver at spline_order=4 — D=12 Jacobian blocks
    through the halo pairing, the distributed Schur reduction, and the
    accept/reject schedule."""
    from emba_tpu import solver

    scene, traj4, cfg4, dev = problem4
    knots = jnp.asarray(traj4.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg4, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it1) >= 2  # the cubic problem does real work

    mesh = dist.make_mesh(8, 1, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg4, traj4.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    assert bool(conv8) == bool(conv1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)

    # host loop (the reference-shaped control flow) at order 4
    kh, gxh, gyh, st = solver.solve_window(
        knots, Gx, Gy, dev, cfg4, solver.LMConfig(max_num_iter=6),
        fix_first=True,
    )
    assert len(st.iterations) == int(it1)
    np.testing.assert_allclose(np.asarray(kh), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gxh), np.asarray(gx1), atol=1e-8)


def test_solve_window_sharded_streamed_order4(problem4):
    """Streamed forming (chunk-recomputed D=12 Jacobians) + light-trial at
    order 4: both must match the classic fused order-4 solve."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, traj4, cfg4, dev = problem4
    knots = jnp.asarray(traj4.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg4, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    # streamed fused (single-device)
    cfg_s = dc.replace(cfg4, stream_chunk=1024)
    k2, gx2, gy2, cost2, it2, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_s, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it2) == int(it1)
    np.testing.assert_allclose(float(cost2), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k1), atol=1e-9)
    # streamed SHARDED at order 4
    mesh = dist.make_mesh(8, 1, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg_s, traj4.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k3, gx3, gy3, cost3, it3, _ = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it3) == int(it1)
    np.testing.assert_allclose(float(cost3), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k3), np.asarray(k1), atol=1e-9)
    # light-trial classic at order 4
    cfg_lt = dc.replace(cfg4, light_trial=True)
    k4, gx4, gy4, cost4, it4, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_lt, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    assert int(it4) == int(it1)
    np.testing.assert_allclose(np.asarray(k4), np.asarray(k1), atol=1e-9)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4)])
def test_solve_window_sharded_streamed_matches_fused(problem, mesh_shape):
    """Streamed forming composes with the sharded LM window: per-event
    Jacobians recomputed in chunks shard-locally (O(N_shard) carry), with
    cross-shard prev bearings/batch-ids resolved ONCE through the halo
    (they are state-independent). Must reproduce the single-device CLASSIC
    fused solver exactly (streamed forming == classic forming in f64)."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=6,
    )

    cfg_s = dc.replace(cfg, stream_chunk=2048)
    mesh = dist.make_mesh(*mesh_shape, jax.devices()[:8])
    solve_s = dist.make_solve_window_sharded(
        mesh, cfg_s, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve_s(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    assert bool(conv8) == bool(conv1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


def test_solve_window_sharded_streamed_compact(problem):
    """Streamed forming + active-pixel compaction + sharding all compose:
    equal to the single-device classic solve."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, _ = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=5,
    )

    cfg_sc = dc.replace(cfg, stream_chunk=2048, compact_cap=512)
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg_sc, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=5,
    )
    k8, gx8, gy8, cost8, it8, _ = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


def test_solve_window_sharded_with_compaction(problem):
    """Active-pixel compaction composes with the sharded LM window: the
    compact row space is derived from the psum'd global activity map
    (identical on every shard), so the compact sharded solve equals the
    non-compact sharded solve (mirror of test_compact_cap_equivalence)."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    cfg_c = dc.replace(cfg, compact_cap=512)  # > active count; pow2 row pad

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=6,
    )

    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve_c = dist.make_solve_window_sharded(
        mesh, cfg_c, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve_c(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


def test_sharded_trace_matches_fused_trace(problem):
    """The per-iteration trace (lm.TRACE_COLS) of the sharded window must
    equal the single-device fused solver's trace: same lambda path, same
    per-iteration costs, same accepts, same Np — multi-chip runs report the
    reference's per-iteration observability (solver.cpp:176-178, 283-293)."""
    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1, tr1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=8, return_trace=True,
    )
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve = dist.solve_window_sharded_cached(
        mesh, cfg, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=8, return_trace=True,
    )
    k8, gx8, gy8, cost8, it8, conv8, tr8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    n = int(it1)
    assert int(it8) == n and n > 2
    t1, t8 = np.asarray(tr1)[:n], np.asarray(tr8)[:n]
    np.testing.assert_allclose(t8[:, 0], t1[:, 0], rtol=1e-12)  # lambda
    np.testing.assert_allclose(t8[:, 1:3], t1[:, 1:3], rtol=1e-9)  # costs
    np.testing.assert_array_equal(t8[:, 3], t1[:, 3])  # accept
    np.testing.assert_array_equal(t8[:, 4], t1[:, 4])  # Np (global)
    np.testing.assert_array_equal(t8[:, 5], t1[:, 5])  # dropped (psum'd)

    # the trace decodes into per-iteration records + per-form Np lists
    from emba_tpu import lm

    recs = lm.trace_records(t8, n)
    assert len(recs) == n and recs[0]["active_px"] > 0
    act, drop = lm.forming_stats_from_trace(t8, n)
    assert 1 <= len(act) <= n and all(d == 0 for d in drop)


def test_solve_window_sharded_cache_reuses_executable(problem):
    """solve_window_sharded_cached must return the SAME closure (= the same
    jit cache entry) for an identical signature and a different one when any
    shape-determining argument changes — multi-window sharded runs compile
    once per distinct signature, not once per window."""
    scene, cfg, dev = problem
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    args = (mesh, cfg, scene.traj.num_knots, NUM_SENSOR_PIX)
    f1 = dist.solve_window_sharded_cached(*args, fix_first=True)
    f2 = dist.solve_window_sharded_cached(*args, fix_first=True)
    assert f1 is f2
    f3 = dist.solve_window_sharded_cached(*args, fix_first=False)
    assert f3 is not f1
    f4 = dist.solve_window_sharded_cached(
        mesh, cfg, scene.traj.num_knots + 1, NUM_SENSOR_PIX, fix_first=True
    )
    assert f4 is not f1


def test_solve_window_sharded_streamed_light_matches_fused(problem):
    """The LIGHT streaming tier composes with the sharded window: the
    shard-local light linearization's resident (N,) fields feed the
    Jacobian-only streamed forming (cross-shard prevs from the halo).
    Must equal the single-device CLASSIC fused solve."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    cfg_l = dc.replace(cfg, stream_chunk=2048, stream_light=True)
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg_l, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    assert bool(conv8) == bool(conv1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


def test_solve_window_sharded_host_matches_host_loop(problem):
    """The host-driven sharded LM loop (per-phase SPMD programs driven by
    lm.HostSchedule — the multi-chip recording path) must walk the same
    iterates as the single-device host loop: same per-iteration records,
    same Np/dropped per form, same result. Callbacks fire per iteration
    (reference saveEvoData, solver.cpp:370-425)."""
    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lm_cfg = solver.LMConfig(max_num_iter=6)

    k1, gx1, gy1, st1 = solver.solve_window(
        knots, Gx, Gy, dev, cfg, lm_cfg, fix_first=True
    )

    calls = []
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    k8, gx8, gy8, st8 = dist.solve_window_sharded_host(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh),
        mesh, cfg, NUM_SENSOR_PIX, lm_cfg, fix_first=True,
        callback=lambda it, gx, gy, info: calls.append((it, info["cost_min"])),
    )
    assert len(st8.iterations) == len(st1.iterations)
    assert calls and calls[0][0] == 0  # per-iteration callbacks fired
    assert st8.active_px_per_form == st1.active_px_per_form
    assert st8.dropped_meas_per_form == st1.dropped_meas_per_form
    for r8, r1 in zip(st8.iterations, st1.iterations):
        np.testing.assert_allclose(r8["cost_new"], r1["cost_new"], rtol=1e-9)
        np.testing.assert_allclose(
            r8["log10_lambda"], r1["log10_lambda"], atol=1e-12
        )
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-8)


def test_solve_window_sharded_host_streamed_light(problem):
    """Host-driven sharded loop composes with LIGHT-tier streaming (halo
    prev-src resolved once per window, Jacobian-only chunk recompute on
    each shard) — equals the single-device classic host loop."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lm_cfg = solver.LMConfig(max_num_iter=6)

    k1, gx1, gy1, st1 = solver.solve_window(
        knots, Gx, Gy, dev, cfg, lm_cfg, fix_first=True
    )

    cfg_l = dc.replace(cfg, stream_chunk=2048, stream_light=True)
    mesh = dist.make_mesh(8, 1, jax.devices()[:8])
    k8, gx8, gy8, st8 = dist.solve_window_sharded_host(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh),
        mesh, cfg_l, NUM_SENSOR_PIX, lm_cfg, fix_first=True,
    )
    assert len(st8.iterations) == len(st1.iterations)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)


def test_solve_window_sharded_irls_matches_fused(problem):
    """IRLS (robust cauchy weights, reference formNormalEqIRLS
    model.cpp:493-687) flows through the sharded window unchanged — weights
    are per-measurement and shard-local, the robust cost psums. Must equal
    the single-device fused IRLS solve."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    cfg_i = dc.replace(cfg, use_irls=True, cost_type="cauchy", eta=0.2)
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg_i, damping, tolf, fix_first=True,
        max_num_iter=6,
    )
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg_i, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=6,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)


def test_solve_window_sharded_cg_matches_single(problem):
    """Distributed CG (row-chunked matvecs, psum'd dot products —
    dist._solve_cg_rowchunks; reference solveNormalEqCG model.cpp:794-840):
    the sharded CG window must match the single-device CG solve. Covers the
    fused sharded window AND the host-driven sharded loop (no silent
    Schur-only fallback for use_cg)."""
    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    damping = jnp.asarray(1.0, jnp.float64)
    tolf = jnp.asarray(1e-3, jnp.float64)

    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
        use_cg=True, max_num_iter=5,
    )
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    solve = dist.make_solve_window_sharded(
        mesh, cfg, scene.traj.num_knots, NUM_SENSOR_PIX, fix_first=True,
        max_num_iter=5, use_cg=True,
    )
    k8, gx8, gy8, cost8, it8, conv8 = solve(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh), damping, tolf,
    )
    assert int(it8) == int(it1)
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-6)

    # host-driven sharded loop with CG
    lm_cfg = solver.LMConfig(max_num_iter=5)
    k1h, gx1h, gy1h, st1 = solver.solve_window(
        knots, Gx, Gy, dev, cfg, lm_cfg, fix_first=True, use_cg=True
    )
    kh, gxh, gyh, sth = dist.solve_window_sharded_host(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh),
        mesh, cfg, NUM_SENSOR_PIX, lm_cfg, fix_first=True, use_cg=True,
    )
    assert len(sth.iterations) == len(st1.iterations)
    np.testing.assert_allclose(np.asarray(kh), np.asarray(k1h), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gxh), np.asarray(gx1h), atol=1e-6)


def test_solve_window_sharded_host_streamed_full(problem):
    """Host-driven sharded loop, zero-residency FULL streaming tier (the
    production default for large windows): shard-local chunk-recomputed
    forming from the psum'd activity map — equals the single-device classic
    host loop."""
    import dataclasses as dc

    from emba_tpu import solver

    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)
    lm_cfg = solver.LMConfig(max_num_iter=6)

    k1, gx1, gy1, st1 = solver.solve_window(
        knots, Gx, Gy, dev, cfg, lm_cfg, fix_first=True
    )
    cfg_s = dc.replace(cfg, stream_chunk=2048, stream_light=False)
    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    k8, gx8, gy8, st8 = dist.solve_window_sharded_host(
        *dist.replicate(mesh, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh),
        mesh, cfg_s, NUM_SENSOR_PIX, lm_cfg, fix_first=True,
    )
    assert len(st8.iterations) == len(st1.iterations)
    np.testing.assert_allclose(np.asarray(k8), np.asarray(k1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-8)


@pytest.mark.parametrize(
    "mesh_shape,variant", [((8, 1), "quad"), ((2, 4), "cauchy"),
                           ((8, 1), "mid")]
)
def test_map_only_sharded_matches_single(problem, mesh_shape, variant):
    """The distributed map-only solve (production super-res path) must
    reproduce model.map_only_step on the 8-device mesh: same activity map,
    cost, and solved maps — including IRLS weighting and midpoint
    sampling."""
    import dataclasses as dc

    scene, cfg, dev = problem
    if variant == "cauchy":
        cfg = dc.replace(cfg, use_irls=True, cost_type="cauchy", eta=0.5)
    elif variant == "mid":
        cfg = dc.replace(cfg, sample_mode="mid")
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx * 0.7)  # imperfect input map
    Gy = jnp.asarray(scene.gy * 0.7)

    cfg_s = dc.replace(cfg, stream_chunk=1024)
    gx1, gy1, cost1, nem1 = model.map_only_step(knots, Gx, Gy, dev, cfg_s)

    mesh = dist.make_mesh(mesh_shape[0], mesh_shape[1], jax.devices()[:8])
    fn = dist.make_map_only_sharded(mesh, cfg, NUM_SENSOR_PIX)
    dev_s = dist.shard_window_all(dev, mesh)
    gx8, gy8, cost8, nem8 = fn(
        dist.replicate(mesh, knots), dist.replicate(mesh, Gx),
        dist.replicate(mesh, Gy), dev_s,
    )

    np.testing.assert_array_equal(np.asarray(nem8), np.asarray(nem1))
    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(gy8), np.asarray(gy1), atol=1e-10)
    # updateMap semantics: inactive pixels are zero
    act = (np.asarray(nem8) >= cfg.thres_valid_pixel).reshape(gx8.shape)
    assert np.abs(np.asarray(gx8)[~act]).max() == 0.0
