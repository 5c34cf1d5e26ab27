"""Camera tests: equirect projection round-trip, numerical Jacobians,
bearing LUT properties, YAML loading."""

import numpy as np
import jax.numpy as jnp

from emba_tpu import synth
from emba_tpu.camera import EquirectangularCamera, PinholeCamera

RNG = np.random.default_rng(7)


def test_project_lift_roundtrip():
    cam = EquirectangularCamera(512, 256)
    v = RNG.normal(size=(256, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pm = np.asarray(cam.project(jnp.asarray(v), need_jacobian=False))
    assert (pm[:, 0] >= 0).all() and (pm[:, 0] <= 512).all()
    assert (pm[:, 1] >= 0).all() and (pm[:, 1] <= 256).all()
    v2 = np.asarray(cam.lift_to_unit_sphere(jnp.asarray(pm)))
    np.testing.assert_allclose(v2, v, atol=1e-9)


def test_project_jacobian_numerical():
    cam = EquirectangularCamera(1024, 512)
    P = RNG.normal(size=(64, 3)) * 2.0
    # exclude near-pole and near-z-axis degenerate points from random draw
    P = P[np.abs(P[:, 1]) / np.linalg.norm(P, axis=1) < 0.95]
    pm, J = cam.project(jnp.asarray(P), need_jacobian=True)
    pm, J = np.asarray(pm), np.asarray(J)
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        pm2 = np.asarray(cam.project(jnp.asarray(P + d), need_jacobian=False))
        num = (pm2 - pm) / eps
        np.testing.assert_allclose(J[:, :, k], num, atol=1e-4, rtol=1e-4)


def test_project_scale_invariance():
    cam = EquirectangularCamera(512, 256)
    P = RNG.normal(size=(32, 3))
    pm1 = np.asarray(cam.project(jnp.asarray(P), need_jacobian=False))
    pm2 = np.asarray(cam.project(jnp.asarray(P * 7.3), need_jacobian=False))
    np.testing.assert_allclose(pm1, pm2, atol=1e-10)


def test_bearing_lut_pinhole():
    cam = synth.default_sensor(32, 24, f=40.0)
    lut = cam.bearing_lut()
    assert lut.shape == (32 * 24, 3)
    np.testing.assert_allclose(np.linalg.norm(lut, axis=1), 1.0, atol=1e-12)
    # center pixel looks along +z
    c = lut[12 * 32 + 16]
    assert c[2] > 0.99
    # principal-point ray: K^-1 [cx, cy, 1] = [0, 0, 1]
    K = cam.K
    x, y = cam.undistort_normalized(np.array([K[0, 2]]), np.array([K[1, 2]]))
    assert abs(x[0]) < 1e-12 and abs(y[0]) < 1e-12


def test_undistort_inverts_distortion():
    K = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
    D = np.array([-0.3, 0.1, 1e-3, -2e-3, 0.0])
    cam = PinholeCamera.from_calib(128, 96, K, D=D)
    # forward-distort some normalized points, then check undistort recovers
    xn = RNG.uniform(-0.3, 0.3, size=50)
    yn = RNG.uniform(-0.3, 0.3, size=50)
    k1, k2, p1, p2, k3 = D
    r2 = xn**2 + yn**2
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn**2)
    yd = yn * radial + p1 * (r2 + 2 * yn**2) + 2 * p2 * xn * yn
    u = K[0, 0] * xd + K[0, 2]
    v = K[1, 1] * yd + K[1, 2]
    xu, yu = cam.undistort_normalized(u, v)
    np.testing.assert_allclose(xu, xn, atol=1e-6)
    np.testing.assert_allclose(yu, yn, atol=1e-6)


def test_load_camera_yaml():
    from emba_tpu.camera import load_camera_yaml

    cam = load_camera_yaml("/root/reference/calib/DVS-playroom.yaml")
    assert cam.width == 128 and cam.height == 128
    np.testing.assert_allclose(cam.K[0, 0], 91.4014729896821)
    np.testing.assert_allclose(cam.K[0, 2], 64.0)
    assert np.all(cam.D == 0)
