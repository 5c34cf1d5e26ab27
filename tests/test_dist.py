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


def test_shardmap_normal_eq_matches_single(problem):
    """The explicit-collective (shard_map) normal-equation build matches the
    single-device build (up to the documented cross-shard pair masking —
    here events are padded so no pairs cross shards... they may; compare
    against a single-shard mesh run of the SAME function instead)."""
    scene, cfg, dev = problem
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx)
    Gy = jnp.asarray(scene.gy)

    mesh1 = dist.make_mesh(1, 1, jax.devices()[:1])
    f1 = dist.make_shardmap_normal_eq(mesh1, cfg, scene.traj.num_knots)
    n1 = f1(*dist.replicate(mesh1, knots, Gx, Gy), dist.shard_window(dev, mesh1))

    # single-shard shard_map == plain single-device build
    import emba_tpu.model as M

    lin = M.linearize(knots, Gx, Gy, dev, cfg, True)
    neq = M.form_normal_eq(lin, Gx, Gy, cfg, scene.traj.num_knots)
    np.testing.assert_allclose(np.asarray(n1.A11), np.asarray(neq.A11), atol=1e-9)
    np.testing.assert_allclose(np.asarray(n1.b1), np.asarray(neq.b1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(n1.A12), np.asarray(neq.A12), atol=1e-9)

    # multi-shard: must EXACTLY match a manual 4-way split with the same
    # cross-shard-pair masking semantics (pairs whose prev event lives in
    # another shard are dropped — negligible at production event densities,
    # large in this tiny fixture; the GSPMD path keeps them exactly).
    import dataclasses as dc

    mesh = dist.make_mesh(4, 2, jax.devices()[:8])
    f8 = dist.make_shardmap_normal_eq(mesh, cfg, scene.traj.num_knots)
    n8 = f8(*dist.replicate(mesh, knots, Gx, Gy), dist.shard_window(dev, mesh))

    n = dev.pol_signed.shape[0]
    nl = n // 4
    # global activity map with the same masking
    counts = None
    links = []
    for k in range(4):
        sl = slice(k * nl, (k + 1) * nl)
        lp = np.asarray(dev.prev_idx)[sl] - k * nl
        ins = (lp >= 0) & (lp < nl)
        devk = model.DeviceWindow(
            bearings=dev.bearings[:, sl],
            pol_signed=dev.pol_signed[sl],
            prev_idx=jnp.asarray(np.clip(lp, 0, nl - 1)),
            has_prev=dev.has_prev[sl] & jnp.asarray(ins),
            batch_ids=dev.batch_ids[sl],
            batch_s=dev.batch_s,
            batch_u=dev.batch_u,
        )
        lk = model.linearize(knots, Gx, Gy, devk, cfg, True)
        links.append(lk)
        counts = lk.num_ev_map if counts is None else counts + lk.num_ev_map
    expected_A11 = None
    exp_a22 = None
    for lk in links:
        lk = dc.replace(lk, num_ev_map=counts)
        nq = model.form_normal_eq(lk, Gx, Gy, cfg, scene.traj.num_knots)
        expected_A11 = nq.A11 if expected_A11 is None else expected_A11 + nq.A11
        exp_a22 = nq.a22_xx if exp_a22 is None else exp_a22 + nq.a22_xx
    np.testing.assert_allclose(
        np.asarray(n8.A11), np.asarray(expected_A11), atol=1e-8
    )
    # a22 was regularized once per shard in the manual sum: remove 3 extras
    exp_a22 = exp_a22 - 3.0 * cfg.alpha * nq.active.astype(exp_a22.dtype)
    np.testing.assert_allclose(
        np.asarray(n8.a22_xx), np.asarray(exp_a22), atol=1e-8
    )
