"""Poisson brightness reconstruction: gradient map -> panorama.

TPU-native replacement for the reference's vendored FFTW spectral solver
(``src/image_rec/poisson_reconstruction.cpp:9-50`` +
``src/image_rec/laplace.cpp:587-818``):

* divergence of (Gx, Gy) by forward differences
  (``poisson_reconstruction.cpp:21-29``),
* solve ``u_xx + u_yy = F`` with Dirichlet (DST-I) or Neumann (DCT-I)
  boundaries by eigen-decomposition of the 5-point Laplacian:
  transform -> divide by ``lambda_i + lambda_j`` -> inverse transform
  (``laplace.cpp:641-776``; eigenvalues ``laplace.cpp:697-709``),
* DST-I/DCT-I built from ``jnp.fft.rfft`` over odd/even extensions
  (XLA FFT runs on the TPU; no FFTW).

Also provides the finite-difference gradient/divergence/Laplacian operators
(the reference's ``laplace.h:92-209`` utility surface).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def dst1(x, axis: int = -1):
    """Type-I discrete sine transform along ``axis`` (orthogonal up to a
    factor: DST1(DST1(x)) = (n+1)/2 * x). Matches FFTW's RODFT00 up to its
    factor of 2 (FFTW computes 2*DST1)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    z = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    ext = jnp.concatenate([z, x, z, -x[..., ::-1]], axis=-1)  # length 2(n+1)
    X = jnp.fft.rfft(ext, axis=-1)
    out = -X.imag[..., 1 : n + 1] / 2.0
    return jnp.moveaxis(out.astype(x.dtype), -1, axis)


def dct1(x, axis: int = -1):
    """Type-I discrete cosine transform along ``axis``
    (DCT1(DCT1(x)) = (n-1)/2 * x for the interior). Matches FFTW's REDFT00
    up to its factor of 2."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    ext = jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)  # length 2(n-1)
    X = jnp.fft.rfft(ext, axis=-1)
    out = X.real[..., :n] / 2.0
    return jnp.moveaxis(out.astype(x.dtype), -1, axis)


@partial(jax.jit, static_argnames=("boundary",))
def poisson_solve(F, boundary: str = "dirichlet", bound_value: float = 0.0):
    """Solve ``u_xx + u_yy = F`` on the unit grid (a1=a2=h1=h2=1, the
    parameters EMBA uses, ``poisson_reconstruction.cpp:36-38``).

    Dirichlet: u = bound_value on the (virtual) boundary just outside the
    grid; Neumann: du/dn = bound_value.

    Reference math: ``laplace.cpp:587-796``.
    """
    F = jnp.asarray(F)
    n1, n2 = F.shape
    dt = F.dtype

    if boundary == "dirichlet":
        if bound_value != 0.0:
            # adjust rhs: F[0,:] -= bd/h^2 etc (laplace.cpp:610-631)
            F = F.at[0, :].add(-bound_value)
            F = F.at[-1, :].add(-bound_value)
            F = F.at[:, 0].add(-bound_value)
            F = F.at[:, -1].add(-bound_value)
        lam1 = -4.0 * jnp.sin(jnp.pi * (jnp.arange(n1) + 1) / (2.0 * (n1 + 1))) ** 2
        lam2 = -4.0 * jnp.sin(jnp.pi * (jnp.arange(n2) + 1) / (2.0 * (n2 + 1))) ** 2
        # forward: DST-I both axes; normalization such that applying the
        # transform twice is identity: DST1^2 = ((n1+1)/2)((n2+1)/2).
        Fh = dst1(dst1(F, axis=0), axis=1)
        div = lam1[:, None].astype(dt) + lam2[None, :].astype(dt)
        Uh = Fh / div  # div < 0 strictly for Dirichlet: no zero mode
        U = dst1(dst1(Uh, axis=0), axis=1) * (4.0 / ((n1 + 1) * (n2 + 1)))
        return U
    elif boundary == "neumann":
        if bound_value != 0.0:
            F = F.at[0, :].add(-2.0 * bound_value)
            F = F.at[-1, :].add(-2.0 * bound_value)
            F = F.at[:, 0].add(-2.0 * bound_value)
            F = F.at[:, -1].add(-2.0 * bound_value)
        lam1 = -4.0 * jnp.sin(jnp.pi * jnp.arange(n1) / (2.0 * (n1 - 1))) ** 2
        lam2 = -4.0 * jnp.sin(jnp.pi * jnp.arange(n2) / (2.0 * (n2 - 1))) ** 2
        # Eigen basis is DCT-I with half-weighted first/last coefficients
        # (laplace.cpp:654-673): forward = w . DCT1(F); inverse = DCT1(U/w).
        w1 = jnp.ones(n1, dt).at[0].set(0.5).at[-1].set(0.5)
        w2 = jnp.ones(n2, dt).at[0].set(0.5).at[-1].set(0.5)
        wgrid = w1[:, None] * w2[None, :]
        Fh = dct1(dct1(F, axis=0), axis=1) * wgrid / ((n1 - 1) * (n2 - 1))
        div = lam1[:, None].astype(dt) + lam2[None, :].astype(dt)
        div_safe = jnp.where(div == 0.0, jnp.ones_like(div), div)
        Uh = jnp.where(div == 0.0, 0.0, Fh / div_safe)  # project out zero mode
        U = 4.0 * dct1(dct1(Uh / wgrid, axis=0), axis=1)
        return U
    raise ValueError(f"unknown boundary {boundary!r}")


@jax.jit
def divergence(gx, gy):
    """Forward-difference divergence with zeroed last row/column
    (reference ``poisson_reconstruction.cpp:21-29``)."""
    F = jnp.zeros_like(gx)
    F = F.at[:-1, :-1].set(
        gx[:-1, 1:] - gx[:-1, :-1] + gy[1:, :-1] - gy[:-1, :-1]
    )
    return F


def reconstruct_from_gradient(gx, gy, boundary: str = "dirichlet"):
    """Gradient maps -> brightness panorama (reference
    ``reconstructFromGradient``, poisson_reconstruction.cpp:9-50)."""
    return poisson_solve(divergence(gx, gy), boundary=boundary)


# ---------------------------------------------------------------------------
# Finite-difference operators (reference laplace.h:92-209 surface).
# ---------------------------------------------------------------------------


def grad_central(u, h1: float = 1.0, h2: float = 1.0):
    """Central-difference gradient (interior), one-sided at borders."""
    gy = (jnp.roll(u, -1, 0) - jnp.roll(u, 1, 0)) / (2 * h1)
    gy = gy.at[0, :].set((u[1, :] - u[0, :]) / h1)
    gy = gy.at[-1, :].set((u[-1, :] - u[-2, :]) / h1)
    gx = (jnp.roll(u, -1, 1) - jnp.roll(u, 1, 1)) / (2 * h2)
    gx = gx.at[:, 0].set((u[:, 1] - u[:, 0]) / h2)
    gx = gx.at[:, -1].set((u[:, -1] - u[:, -2]) / h2)
    return gx, gy


def laplacian_5pt(u, h1: float = 1.0, h2: float = 1.0, boundary_value: float = 0.0):
    """5-point Laplacian with constant Dirichlet padding."""
    p = jnp.pad(u, 1, constant_values=boundary_value)
    return (p[:-2, 1:-1] - 2 * u + p[2:, 1:-1]) / h1**2 + (
        p[1:-1, :-2] - 2 * u + p[1:-1, 2:]
    ) / h2**2
