"""Unit tests for the SO(3) core: round-trips, identities, numerical Jacobians.

Adapts the reference's numerical-vs-analytic harness
(basalt ``test/src/test_spline.cpp`` central differences, eps 1e-8 tol 1e-3)
to jax finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emba_tpu import lie

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=1.0):
    return RNG.normal(size=(n, 3)) * scale


@pytest.mark.parametrize("scale", [1.0, 1e-3, 1e-7, 2.5])
def test_exp_log_roundtrip(scale):
    v = random_rotvecs(64, scale)
    v = np.where(
        np.linalg.norm(v, axis=-1, keepdims=True) > 3.1,
        v * (3.1 / np.linalg.norm(v, axis=-1, keepdims=True)),
        v,
    )
    R = lie.exp(v)
    # orthonormality
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3)).max()
    assert err < 1e-12
    v2 = lie.log(R)
    np.testing.assert_allclose(np.asarray(v2), v, rtol=1e-8, atol=1e-9)


def test_hat_vee():
    v = random_rotvecs(16)
    np.testing.assert_allclose(np.asarray(lie.vee(lie.hat(v))), v, atol=1e-15)
    w = random_rotvecs(16)
    cross = np.cross(v, w)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", lie.hat(v), w)), cross, atol=1e-12
    )


@pytest.mark.parametrize("scale", [1.0, 1e-4, 1e-8])
def test_left_jacobian_identity(scale):
    """Jl(v) satisfies exp((v + Jl(v) eps)) ~ exp(eps') exp(v)... use the
    defining identity: d/deps exp(v + eps) = exp(Jl... Instead verify the
    standard property Jl(v) @ Jl_inv(v) = I and the finite-difference
    characterization exp(v + d) ~ exp(Jl(v) d) exp(v)."""
    v = random_rotvecs(32, scale)
    Jl = lie.left_jacobian(v)
    Jli = lie.left_jacobian_inv(v)
    np.testing.assert_allclose(
        np.asarray(Jl @ Jli), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-10
    )
    # finite-difference check of the left-Jacobian property
    eps = 1e-7
    for k in range(3):
        d = np.zeros(3)
        d[k] = eps
        lhs = lie.exp(v + d)  # exp(v + d)
        rhs = lie.exp((Jl @ d)) @ lie.exp(v)  # exp(Jl d) exp(v)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=5e-7)


def test_small_angle_grad_safe():
    """Gradients through exp/log/Jl at exactly zero must be finite."""

    def f(v):
        return jnp.sum(lie.exp(v) ** 2)

    g = jax.grad(f)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))

    def h(v):
        return jnp.sum(lie.left_jacobian(v) ** 2) + jnp.sum(
            lie.left_jacobian_inv(v) ** 2
        )

    g = jax.grad(h)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))

    def l(v):
        return jnp.sum(lie.log(lie.exp(v)))

    g = jax.grad(l)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_roundtrip():
    v = random_rotvecs(128, 1.5)
    R = lie.exp(v)
    q = lie.matrix_to_quat(R)
    R2 = lie.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-12)
    # near-pi rotations
    axis = RNG.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    v = axis * (np.pi - 1e-9)
    R = lie.exp(v)
    R2 = lie.quat_to_matrix(lie.matrix_to_quat(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-9)


def test_slerp_endpoints():
    R1 = lie.exp(random_rotvecs(8, 0.5))
    R2 = lie.exp(random_rotvecs(8, 0.5))
    np.testing.assert_allclose(
        np.asarray(lie.slerp(R1, R2, jnp.zeros(8))), np.asarray(R1), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lie.slerp(R1, R2, jnp.ones(8))), np.asarray(R2), atol=1e-12
    )
