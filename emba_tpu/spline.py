"""Cumulative uniform SO(3) B-spline trajectory, order-parametric (N=2, N=4).

TPU-native re-derivation of the reference's trajectory layer:

* continuous-time rotation R(t) as a cumulative B-spline over SO(3) knots
  (reference: ``thirdparty/basalt-headers/include/basalt/spline/so3_spline.h``),
* analytic Jacobians of the evaluated rotation w.r.t. left-perturbations of
  the involved knots (reference: ``so3_spline.h:218-274``; closed form for the
  linear spline cross-checked against ``src/test/event_map_test.cpp:131-155``),
* spline fitting from discrete poses by lift-solve-retract (reference:
  ``src/utils/trajectory.cpp:149-229`` linear, ``:481-563`` cubic) and the
  chunked long-interval variant (``trajectory.cpp:258-294``),
* the host-side :class:`Trajectory` manager replacing the reference's
  ``Trajectory``/``LinearTrajectory``/``CubicTrajectory`` class hierarchy
  (``include/utils/trajectory.h:23-273``).

Design notes (TPU-first):

* Device evaluation is vectorized over query points and takes precomputed
  ``(segment index s, normalized offset u)`` pairs. Computing (s, u) from
  raw float timestamps is done on the host in f64 (mirroring the reference's
  int64-nanosecond arithmetic, ``so3_spline.h:219-225``) so that f32 device
  code never subtracts large nearby timestamps.
* The N-1 factor recursion is statically unrolled (N is 2 or 4), everything
  batched 3x3 matrix algebra on the MXU/VPU.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from . import lie


# ---------------------------------------------------------------------------
# Blending matrices (host, f64).
# ---------------------------------------------------------------------------


def _binom(n: int, k: int) -> int:
    return math.comb(n, k)


def blending_matrix(order: int, cumulative: bool = True) -> np.ndarray:
    """Uniform B-spline blending matrix M (order x order).

    Matches the construction in the reference's
    ``spline_common.h:70-100`` (``computeBlendingMatrix``): row/col convention
    such that the coefficient vector is ``coeff = M @ [1, u, u^2, ...]^T``.
    """
    n = order
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for j in range(n):
            s = sum(
                (-1.0) ** (k - j) * _binom(n, k - j) * (n - k - 1.0) ** (n - 1.0 - i)
                for k in range(j, n)
            )
            m[j, i] = _binom(n - 1, n - 1 - i) * s
    if cumulative:
        for i in range(n):
            for j in range(i + 1, n):
                m[i] += m[j]
    return m / math.factorial(n - 1)


# ---------------------------------------------------------------------------
# Device-side evaluation.
# ---------------------------------------------------------------------------


def evaluate(knots, s, u, order: int, need_jacobian: bool = True):
    """Evaluate the cumulative SO(3) B-spline at query points.

    Args:
      knots: (K, 3, 3) rotation matrices (control poses).
      s: (Q,) int32 segment start indices (first involved knot).
      u: (Q,) normalized offsets in [0, 1).
      order: spline order N (2 = linear, 4 = cubic). Static.
      need_jacobian: if True also return d(left-pert of R(t)) /
        d(left-pert of knot s+i) for i in [0, N).

    Returns:
      R: (Q, 3, 3); and if ``need_jacobian``: J: (Q, N, 3, 3).

    The recursion follows the cumulative form
    ``R(t) = P_s * prod_i exp(c_i * log(P_{s+i-1}^-1 P_{s+i}))`` with analytic
    knot Jacobians (reference math: ``so3_spline.h:232-273``). For N=2 this
    reduces to the closed form ``J = [I - A(u), A(u)]`` with
    ``A(u) = u * Jl(u*phi) * Jl^-1(phi)``, ``phi = log(P1 P0^-1)``
    (reference oracle: ``event_map_test.cpp:143-153``).
    """
    knots = jnp.asarray(knots)
    dtype = knots.dtype
    u = jnp.asarray(u, dtype)
    s = jnp.asarray(s)

    n = order
    blend = jnp.asarray(blending_matrix(n, cumulative=True), dtype)
    # p = [1, u, u^2, ...]; coeff = M_cum @ p  (coeff[0] is always 1).
    powers = jnp.stack([u**i for i in range(n)], axis=-1)  # (Q, N)
    coeff = powers @ blend.T  # (Q, N)

    # Gather the N involved knots per query: (Q, N, 3, 3).
    idx = s[:, None] + jnp.arange(n)[None, :]
    P = knots[idx]

    res = P[:, 0]
    if need_jacobian:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), res.shape)
        j_helper = eye
        j_out = []
    for i in range(n - 1):
        p0 = P[:, i]
        p1 = P[:, i + 1]
        delta = lie.log(jnp.swapaxes(p0, -1, -2) @ p1)  # (Q, 3)
        c = coeff[:, i + 1]
        kdelta = c[:, None] * delta
        if need_jacobian:
            jl_inv_delta = lie.left_jacobian_inv(delta)
            jl_kdelta = lie.left_jacobian(kdelta)
            a = (
                c[:, None, None]
                * (res @ jl_kdelta @ jl_inv_delta @ jnp.swapaxes(p0, -1, -2))
            )
            j_out.append(j_helper - a)
            j_helper = a
        res = res @ lie.exp(kdelta)
    if need_jacobian:
        j_out.append(j_helper)
        return res, jnp.stack(j_out, axis=1)
    return res


def evaluate_derivatives(knots, s, u, dt: float, order: int, degree: int = 2):
    """Time derivatives of the cumulative SO(3) B-spline in the BODY frame:
    angular velocity, acceleration, and jerk (reference: basalt
    ``so3_spline.h:321-740`` — ``velocityBody``/``accelerationBody``/
    ``jerkBody`` — re-derived rather than ported; unused by EMBA's BA but
    part of the trajectory layer's parity surface).

    Derivation: with ``R = P_s prod_j A_j``, ``A_j = exp(c_j(u) delta_j)``
    and a FIXED axis per factor, ``dA_j/dt = A_j cdot_j hat(delta_j)``
    (exp(c delta) commutes with hat(delta)); stacking
    ``hat(omega_b) = R^T dR/dt`` gives the forward recursions over factors

      V_j   = A_j^T V_{j-1} + cdot_j delta_j                    (velocity)
      Vd_j  = A_j^T Vd_{j-1} - cdot_j delta_j x (A_j^T V_{j-1})
              + cddot_j delta_j                                  (accel)
      Vdd_j = A_j^T Vdd_{j-1} - 2 cdot_j delta_j x (A_j^T Vd_{j-1})
              - cddot_j delta_j x (A_j^T V_{j-1})
              + cdot_j^2 delta_j x (delta_j x (A_j^T V_{j-1}))
              + cdddot_j delta_j                                 (jerk)

    with ``c``-derivatives from the cumulative blending polynomial and the
    chain rule ``du/dt = 1/dt``.

    Args:
      knots: (K, 3, 3); s: (Q,) int32 segment starts; u: (Q,) offsets.
      dt: knot spacing [s]; order: spline order N (any N >= 2, static).
      degree: 1 = velocity only, 2 = + acceleration, 3 = + jerk.

    Returns (R, omega[, alpha[, jerk]]) with R (Q, 3, 3) and each
    derivative (Q, 3) in the body frame.
    """
    knots = jnp.asarray(knots)
    dtype = knots.dtype
    u = jnp.asarray(u, dtype)
    s = jnp.asarray(s)
    n = order
    blend = jnp.asarray(blending_matrix(n, cumulative=True), dtype)

    def upow(deriv: int):
        # d^deriv/du^deriv of [1, u, u^2, ...]
        cols = []
        for i in range(n):
            fac = 1.0
            for k in range(deriv):
                fac *= i - k
            cols.append(
                fac * u ** (i - deriv) if i >= deriv else jnp.zeros_like(u)
            )
        return jnp.stack(cols, axis=-1)  # (Q, N)

    coeff = upow(0) @ blend.T
    dcoeff = (upow(1) @ blend.T) / dt
    ddcoeff = (upow(2) @ blend.T) / dt**2 if degree >= 2 else None
    dddcoeff = (upow(3) @ blend.T) / dt**3 if degree >= 3 else None

    idx = s[:, None] + jnp.arange(n)[None, :]
    P = knots[idx]  # (Q, N, 3, 3)

    res = P[:, 0]
    zeros = jnp.zeros(u.shape + (3,), dtype)
    V = zeros
    Vd = zeros
    Vdd = zeros
    for i in range(n - 1):
        p0 = P[:, i]
        p1 = P[:, i + 1]
        delta = lie.log(jnp.swapaxes(p0, -1, -2) @ p1)  # (Q, 3)
        c = coeff[:, i + 1]
        A = lie.exp(c[:, None] * delta)
        At = jnp.swapaxes(A, -1, -2)

        def rot(x):
            return jnp.einsum("qij,qj->qi", At, x)

        cd = dcoeff[:, i + 1][:, None]
        tV = rot(V)
        if degree >= 3:
            cdd = ddcoeff[:, i + 1][:, None]
            cddd = dddcoeff[:, i + 1][:, None]
            tVd = rot(Vd)
            Vdd = (
                rot(Vdd)
                - 2.0 * cd * jnp.cross(delta, tVd)
                - cdd * jnp.cross(delta, tV)
                + cd**2 * jnp.cross(delta, jnp.cross(delta, tV))
                + cddd * delta
            )
        if degree >= 2:
            cdd = ddcoeff[:, i + 1][:, None]
            Vd = rot(Vd) - cd * jnp.cross(delta, tV) + cdd * delta
        V = tV + cd * delta
        res = res @ A

    out = [res, V]
    if degree >= 2:
        out.append(Vd)
    if degree >= 3:
        out.append(Vdd)
    return tuple(out)


# ---------------------------------------------------------------------------
# Host-side time bucketing and fitting.
# ---------------------------------------------------------------------------


def locate(t, t_beg: float, dt: float, num_knots: int, order: int):
    """Map absolute times -> (segment index s, normalized offset u), f64 host.

    Clamps to the valid segment range [0, K - N] so queries at the exact end
    of the spline remain valid (the reference asserts instead:
    ``so3_spline.h:227-230``).
    """
    t = np.asarray(t, dtype=np.float64)
    rel = (t - t_beg) / dt
    s = np.floor(rel).astype(np.int64)
    s = np.clip(s, 0, num_knots - order)
    u = rel - s
    return s.astype(np.int32), u


def fit_knots(
    times,
    rotations,
    t_beg: float,
    dt: float,
    num_knots: int,
    order: int,
) -> np.ndarray:
    """Fit spline knots to discrete poses by lift-solve-retract (host, f64).

    Mirrors the reference algorithm (``trajectory.cpp:149-229`` /
    ``:481-563``): log-map all poses relative to the first pose, solve the
    linear system ``N @ P = D`` per axis in the tangent space, retract with
    the offset. Valid only for short intervals (small increments); use
    :func:`fit_knots_long` for long spans.

    Args:
      times: (M,) pose timestamps [s].
      rotations: (M, 3, 3) pose rotations.
      t_beg: spline start time.
      dt: knot spacing.
      num_knots: number of knots to fit.
      order: spline order N.

    Returns: (num_knots, 3, 3) f64 knot rotations.
    """
    times = np.asarray(times, dtype=np.float64)
    rotations = np.asarray(rotations, dtype=np.float64)
    if len(times) < num_knots:
        raise ValueError(
            f"need >= {num_knots} poses to fit {num_knots} knots, got {len(times)}"
        )

    offset = rotations[0]
    rel = np.einsum("ji,mjk->mik", offset, rotations)  # offset^T @ R_m
    d = np.asarray(_np_log(rel))  # (M, 3)

    m_blend = blending_matrix(order, cumulative=False)
    nmat = np.zeros((len(times), num_knots), dtype=np.float64)
    rel_t = (times - t_beg) / dt
    seg = np.clip(np.floor(rel_t).astype(np.int64), 0, num_knots - order)
    u = rel_t - seg
    upow = np.stack([u**i for i in range(order)], axis=-1)  # (M, N)
    weights = upow @ m_blend.T  # (M, N): non-cumulative basis weights
    for j in range(order):
        nmat[np.arange(len(times)), seg + j] = weights[:, j]

    sol, *_ = np.linalg.lstsq(nmat, d, rcond=None)
    return np.einsum("ij,mjk->mik", offset, _np_exp(sol))


def fit_knots_long(
    times,
    rotations,
    t_beg: float,
    t_end: float,
    dt: float,
    order: int,
    sub_interval: float | None = None,
) -> np.ndarray:
    """Chunked fitting for long intervals (reference
    ``trajectory.cpp:258-294``): fit each ``sub_interval`` independently and
    merge, dropping the first knot(s) of every chunk after the first.
    """
    if sub_interval is None:
        sub_interval = dt
    times = np.asarray(times, dtype=np.float64)
    rotations = np.asarray(rotations, dtype=np.float64)
    span = t_end - t_beg
    num_chunks = int(np.floor(span / sub_interval + 1e-6))
    head = order - 1  # knots shared with the previous chunk
    out: list[np.ndarray] = []
    for i in range(num_chunks):
        c_beg = t_beg + i * sub_interval
        c_end = c_beg + sub_interval
        mask = (times > c_beg) & (times < c_end)
        # knots per chunk (reference: round(interval/dt)+1 linear, +3 cubic).
        n_k = int(round(sub_interval / dt)) + order - 1
        chunk = fit_knots(times[mask], rotations[mask], c_beg, dt, n_k, order)
        out.append(chunk if i == 0 else chunk[head:])
    return np.concatenate(out, axis=0)


def _np_log(R: np.ndarray) -> np.ndarray:
    """Batched f64 SO(3) log on host (numpy mirror of lie.log)."""
    tr = np.trace(R, axis1=-2, axis2=-1)
    ct = np.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    th = np.arccos(ct)
    small = th < 1e-7
    sin_safe = np.where(small, 1.0, np.sin(th))
    k = np.where(small, 0.5 + th**2 / 12.0, th / (2.0 * sin_safe))
    w = np.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    return k[..., None] * w


def _np_exp(v: np.ndarray) -> np.ndarray:
    """Batched f64 SO(3) exp on host (numpy mirror of lie.exp)."""
    th = np.linalg.norm(v, axis=-1)
    small = th < 1e-7
    th_safe = np.where(small, 1.0, th)
    K = np.zeros(v.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -v[..., 2], v[..., 1]
    K[..., 1, 0], K[..., 1, 2] = v[..., 2], -v[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -v[..., 1], v[..., 0]
    a = np.where(small, 1.0 - th**2 / 6.0, np.sin(th_safe) / th_safe)
    b = np.where(small, 0.5 - th**2 / 24.0, (1.0 - np.cos(th_safe)) / th_safe**2)
    return np.eye(3) + a[..., None, None] * K + b[..., None, None] * (K @ K)


# ---------------------------------------------------------------------------
# Trajectory manager (host-side state, device-side math).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Trajectory:
    """Uniform cumulative SO(3) B-spline trajectory.

    Host-side replacement for the reference's ``LinearTrajectory`` /
    ``CubicTrajectory`` (``include/utils/trajectory.h:106-273``): owns the
    knots (f64 numpy) plus (t_beg, dt, order); device math goes through
    :func:`evaluate`. ``order=2`` is the linear spline, ``order=4`` cubic.
    """

    t_beg: float
    dt: float
    knots: np.ndarray  # (K, 3, 3) f64
    order: int = 2

    # -- constructors ------------------------------------------------------

    @classmethod
    def empty(cls, t_beg: float, dt: float, order: int = 2) -> "Trajectory":
        return cls(t_beg=t_beg, dt=dt, knots=np.zeros((0, 3, 3)), order=order)

    @classmethod
    def from_poses(
        cls,
        times,
        rotations,
        t_beg: float,
        t_end: float,
        dt: float,
        order: int = 2,
        chunked: bool = True,
    ) -> "Trajectory":
        """Fit a new trajectory from discrete (time, rotation) samples.

        ``chunked=True`` uses the long-interval chunked fit the reference
        orchestrator uses (``emba.cpp:416-417``).
        """
        if chunked:
            knots = fit_knots_long(times, rotations, t_beg, t_end, dt, order)
        else:
            n_k = int(round((t_end - t_beg) / dt)) + order - 1
            knots = fit_knots(times, rotations, t_beg, dt, n_k, order)
        return cls(t_beg=t_beg, dt=dt, knots=knots, order=order)

    # -- queries -----------------------------------------------------------

    @property
    def num_knots(self) -> int:
        return len(self.knots)

    @property
    def t_end(self) -> float:
        """Last representable time (end of the final full segment)."""
        return self.t_beg + (self.num_knots - self.order + 1) * self.dt

    def knot_time(self, i: int) -> float:
        return self.t_beg + i * self.dt

    def locate(self, t):
        return locate(t, self.t_beg, self.dt, self.num_knots, self.order)

    def evaluate(self, t, need_jacobian: bool = False):
        """Evaluate R(t) (and optionally knot Jacobians) at times ``t``."""
        s, u = self.locate(np.atleast_1d(t))
        return evaluate(self.knots, s, u, self.order, need_jacobian)

    # -- mutation (host-side bookkeeping, mirrors reference API) -----------

    def pushback(self, knots: np.ndarray) -> None:
        self.knots = np.concatenate([self.knots, np.asarray(knots)], axis=0)

    def incremental_update(self, drotv: np.ndarray, idx_beg: int = 0) -> "Trajectory":
        """Left-multiplicative knot update ``P_i <- exp(d_i) P_i``.

        Reference: ``trajectory.cpp:296-304``.
        """
        assert idx_beg + len(drotv) == self.num_knots
        upd = self.knots.copy()
        upd[idx_beg:] = _np_exp(np.asarray(drotv)) @ upd[idx_beg:]
        return dataclasses.replace(self, knots=upd)

    def clone(self) -> "Trajectory":
        return dataclasses.replace(self, knots=self.knots.copy())

    def segment(self, idx_beg: int, idx_end: int) -> "Trajectory":
        """Clone knots [idx_beg, idx_end) as a new trajectory
        (reference ``cloneSegment``, ``trajectory.cpp:317-330``)."""
        return Trajectory(
            t_beg=self.t_beg + idx_beg * self.dt,
            dt=self.dt,
            knots=self.knots[idx_beg:idx_end].copy(),
            order=self.order,
        )

    def replace_with(
        self, src: "Trajectory", num_copy: int, idx_src: int, idx_dst: int
    ) -> None:
        """Overwrite knots from another trajectory
        (reference ``replaceWith``, ``trajectory.cpp:332-343``)."""
        self.knots[idx_dst : idx_dst + num_copy] = src.knots[
            idx_src : idx_src + num_copy
        ]

    # -- IO ----------------------------------------------------------------

    def write_tum(self, path: str, time_offset: float = 0.0) -> None:
        """Write knots as a TUM-format trajectory txt
        (reference ``trajectory.cpp:98-114``; also implements the cubic
        variant the reference left as a TODO at ``trajectory.cpp:443-446``).
        """
        quats = np.asarray(
            jnp.asarray(lie.matrix_to_quat(jnp.asarray(self.knots)))
        )
        with open(path, "w") as f:
            for i in range(self.num_knots):
                t = self.knot_time(i) - time_offset
                qx, qy, qz, qw = quats[i]
                f.write(f"{t} 0.0 0.0 0.0 {qx} {qy} {qz} {qw}\n")
