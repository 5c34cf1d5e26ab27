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
