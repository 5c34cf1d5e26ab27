"""Poisson reconstruction tests: transform identities, operator parity with
a dense 5-point Laplacian solve, and gradient->brightness round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from emba_tpu import recon

RNG = np.random.default_rng(21)


def test_dst1_identity():
    x = RNG.normal(size=(5, 17))
    out = np.asarray(recon.dst1(recon.dst1(jnp.asarray(x))))
    np.testing.assert_allclose(out, (17 + 1) / 2.0 * x, atol=1e-10)


def test_dst1_matches_direct():
    n = 9
    x = RNG.normal(size=n)
    direct = np.array(
        [
            sum(x[j] * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1)) for j in range(n))
            for k in range(n)
        ]
    )
    np.testing.assert_allclose(np.asarray(recon.dst1(jnp.asarray(x))), direct, atol=1e-10)


def test_dct1_identity():
    x = RNG.normal(size=(4, 12))
    out = np.asarray(recon.dct1(recon.dct1(jnp.asarray(x))))
    # DCT1 * DCT1 = (n-1)/2 * I  on the half-weighted convention only for
    # interior; check against a direct dense DCT-I matrix instead.
    n = 12
    C = np.array(
        [[np.cos(np.pi * j * k / (n - 1)) for j in range(n)] for k in range(n)]
    )
    W = np.diag(np.r_[0.5, np.ones(n - 2), 0.5])
    direct = x @ (W @ C.T + (C.T @ W - W @ C.T) * 0)  # DCT1: sum w_j x_j cos
    # our dct1 computes sum_j x_j cos(pi j k/(n-1)) with half-weight on j=0,last
    mine = np.asarray(recon.dct1(jnp.asarray(x)))
    np.testing.assert_allclose(mine, x @ (C @ W).T, atol=1e-10)
    del out, direct


def dense_dirichlet_solve(F):
    """Dense reference solve of the 5-point Dirichlet Poisson system."""
    n1, n2 = F.shape
    N = n1 * n2
    A = np.zeros((N, N))
    for i in range(n1):
        for j in range(n2):
            k = i * n2 + j
            A[k, k] = -4.0
            for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                ii, jj = i + di, j + dj
                if 0 <= ii < n1 and 0 <= jj < n2:
                    A[k, ii * n2 + jj] = 1.0
    return np.linalg.solve(A, F.reshape(-1)).reshape(n1, n2)


def test_poisson_dirichlet_matches_dense():
    F = RNG.normal(size=(12, 18))
    U = np.asarray(recon.poisson_solve(jnp.asarray(F), "dirichlet"))
    U_ref = dense_dirichlet_solve(F)
    np.testing.assert_allclose(U, U_ref, atol=1e-8)


def test_poisson_neumann_residual():
    F = RNG.normal(size=(16, 16))
    F -= F.mean()  # compatibility condition
    U = np.asarray(recon.poisson_solve(jnp.asarray(F), "neumann"))
    # DCT-I basis implies whole-sample reflection ghosts (u[-1] = u[1]).
    P = np.pad(U, 1, mode="reflect")
    lap = P[:-2, 1:-1] + P[2:, 1:-1] + P[1:-1, :-2] + P[1:-1, 2:] - 4 * U
    np.testing.assert_allclose(lap, F - F.mean() + lap.mean(), atol=1e-7)


def test_reconstruct_roundtrip():
    """Smooth zero-boundary image -> forward-difference gradients ->
    reconstruction. The reference's divergence stencil carries a half-pixel
    shift (visualization path), so compare at low frequency with a loose
    bound plus a correlation check."""
    n = 64
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    img = np.sin(np.pi * (xx + 1) / (n + 1)) * np.sin(np.pi * (yy + 1) / (n + 1))
    gx = np.zeros_like(img)
    gy = np.zeros_like(img)
    gx[:, :-1] = img[:, 1:] - img[:, :-1]
    gy[:-1, :] = img[1:, :] - img[:-1, :]
    M = np.asarray(recon.reconstruct_from_gradient(jnp.asarray(gx), jnp.asarray(gy)))
    corr = np.corrcoef(M.ravel(), img.ravel())[0, 1]
    assert corr > 0.99
    assert np.std(M - img) < 0.15 * np.std(img)
