"""LEGM: the Linearized Event Generation Model — residuals, Jacobians, and
normal equations, TPU-shaped.

Reference semantics re-derived from ``src/emba/model.cpp``:

* residual per paired events (prev, curr) at a sensor pixel:
  ``e = 2(pol-0.5) C_th - G(pm_curr) . (pm_curr - pm_prev)``
  (``model.cpp:194-221``), with outlier cut ``|dp| > 10`` (``:199-205``),
* pose Jacobians: curr ``(G(pm) + dp^T grad G(pm)) . dpm_curr/dcp``; prev
  ``-G(pm_curr) . dpm_prev/dcp`` (``model.cpp:238-241, 449, 459``),
* map Jacobian ``dM/dG = dp`` (``model.cpp:426-427``),
* normal equations: dense pose block A11 (3K x 3K), per-pixel 2x2 map blocks
  A22, pose-map coupling A12, rhs b1/b2 (``model.cpp:316-491``); IRLS variant
  with Huber/Cauchy weights (``model.cpp:493-687``); L2 map regularizer
  (``model.cpp:689-719``).

TPU-first design (SURVEY.md §7): the reference's three per-event hot loops
become dense batched array ops over static shapes; the dynamic
active/inactive pixel sets become masks; every per-measurement scatter is a
segment-sum over precomputed indices; A11 is assembled from per-segment
block segment-sums (the spline locality: one measurement touches knot
windows [i_c, i_c+order) and [i_p, i_p+order)); A22 inversion is a batched
closed-form 2x2 inverse.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import warp
from .camera import EquirectangularCamera


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model configuration (subset of the reference's ``BASettings``,
    ``include/emba/params.h:15-61``)."""

    c_th: float = 0.2
    pano_width: int = 1024
    pano_height: int = 512
    thres_valid_pixel: int = 5
    alpha: float = 5.0
    outlier_dp_norm: float = 10.0
    use_irls: bool = False
    cost_type: str = "quadratic"  # quadratic | huber | cauchy
    eta: float = 1.0
    spline_order: int = 2

    @property
    def num_pix(self) -> int:
        return self.pano_width * self.pano_height

    @property
    def dim_block(self) -> int:
        return 3 * self.spline_order

    @property
    def pano(self) -> EquirectangularCamera:
        return EquirectangularCamera(self.pano_width, self.pano_height)


# ---------------------------------------------------------------------------
# Map gradients (reference model.cpp:88-97).
# ---------------------------------------------------------------------------


def _reflect_pad(G):
    """BORDER_REFLECT_101 padding by 1 (OpenCV's Sobel default)."""
    return jnp.pad(G, 1, mode="reflect")


def sobel_gradients(G):
    """3x3 Sobel x/y derivatives scaled by 1/8 (reference model.cpp:89-96).

    Separable: d/dx = smooth_y([1,2,1]) * diff_x([-1,0,1]) / 8.
    """
    P = _reflect_pad(G)
    # smooth along y then diff along x
    sy = P[:-2, :] + 2.0 * P[1:-1, :] + P[2:, :]  # (H, W+2)
    gx = (sy[:, 2:] - sy[:, :-2]) * 0.125
    sx = P[:, :-2] + 2.0 * P[:, 1:-1] + P[:, 2:]  # (H+2, W)
    gy = (sx[2:, :] - sx[:-2, :]) * 0.125
    return gx, gy


def second_order_gradients(Gx, Gy):
    """(Gxx, Gxy_sym, Gyy): Sobel of the gradient maps with the symmetrized
    mixed term (reference model.cpp:88-97)."""
    gxx, gxy = sobel_gradients(Gx)
    gyx, gyy = sobel_gradients(Gy)
    return gxx, 0.5 * (gxy + gyx), gyy


# ---------------------------------------------------------------------------
# Device-side window data.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceWindow:
    """Static per-window event data resident on device (all jnp arrays)."""

    bearings: jax.Array  # (N, 3) per-event unit bearing vectors
    pol_signed: jax.Array  # (N,) +-1 * 1.0 (curr-event polarity sign)
    prev_idx: jax.Array  # (N,) int32, clipped to >= 0
    has_prev: jax.Array  # (N,) bool
    s: jax.Array  # (N,) int32 spline segment (shared within a batch)
    u: jax.Array  # (N,) normalized offset (batch mid-time)

    @classmethod
    def from_window(cls, win, bearing_lut: np.ndarray, sensor_width: int, dtype):
        b = bearing_lut[win.sensor_flat_idx(sensor_width)]
        ids = win.batch_ids()
        return cls(
            bearings=jnp.asarray(b, dtype),
            pol_signed=jnp.asarray(2.0 * (win.pol.astype(np.float64) - 0.5), dtype),
            prev_idx=jnp.asarray(np.maximum(win.prev_idx, 0), jnp.int32),
            has_prev=jnp.asarray(win.prev_idx >= 0),
            s=jnp.asarray(win.batch_s[ids], jnp.int32),
            u=jnp.asarray(win.batch_u[ids], dtype),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Linearization:
    """Per-measurement quantities produced by one model linearization.

    The measurement k is the event pair (prev_idx[k], k); entries of
    non-measurements (first event at a pixel, outliers) are masked to zero.
    """

    e: jax.Array  # (N,) residuals (0 for non-inliers)
    inlier: jax.Array  # (N,) bool
    pm_pix: jax.Array  # (N,) int32 flat pano pixel of curr event
    num_ev_map: jax.Array  # (HW,) int32 inlier count per pano pixel
    d: jax.Array  # (N, 2) dM/dG = dp
    Jc: jax.Array  # (N, D) pose Jacobian, curr half
    Jp: jax.Array  # (N, D) pose Jacobian, prev half
    i_c: jax.Array  # (N,) int32 segment of curr event
    i_p: jax.Array  # (N,) int32 segment of prev event


@partial(jax.jit, static_argnames=("cfg", "need_deriv"))
def linearize(knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig, need_deriv=True):
    """Warp + pair + residual + per-measurement Jacobians
    (reference ``LEGM::evaluateDataError``, model.cpp:72-258)."""
    pano = cfg.pano
    pm, cp_idx, dpm_dcp = warp.warp_events(
        knots,
        dev.s,
        dev.u,
        dev.bearings,
        pano,
        cfg.spline_order,
        need_jacobian=need_deriv,
    )

    pm_prev = pm[dev.prev_idx]
    dp = pm - pm_prev
    dp_norm2 = jnp.sum(dp * dp, axis=-1)
    inlier = dev.has_prev & (dp_norm2 <= cfg.outlier_dp_norm**2)

    # Nearest pano pixel of the curr event (std::round = half away from zero;
    # pm >= 0 here so floor(pm + 0.5) matches; reference model.cpp:209-211).
    px = jnp.clip(jnp.floor(pm[:, 0] + 0.5).astype(jnp.int32), 0, cfg.pano_width - 1)
    py = jnp.clip(jnp.floor(pm[:, 1] + 0.5).astype(jnp.int32), 0, cfg.pano_height - 1)
    pm_pix = py * cfg.pano_width + px

    gx = Gx.reshape(-1)[pm_pix]
    gy = Gy.reshape(-1)[pm_pix]
    c_pred = gx * dp[:, 0] + gy * dp[:, 1]
    c_meas = dev.pol_signed * cfg.c_th
    e = jnp.where(inlier, c_meas - c_pred, 0.0)

    num_ev_map = jnp.zeros((cfg.num_pix,), jnp.int32).at[pm_pix].add(
        inlier.astype(jnp.int32), mode="drop"
    )

    if not need_deriv:
        zeros_d = jnp.zeros((pm.shape[0], cfg.dim_block), pm.dtype)
        return Linearization(
            e=e,
            inlier=inlier,
            pm_pix=pm_pix,
            num_ev_map=num_ev_map,
            d=dp,
            Jc=zeros_d,
            Jp=zeros_d,
            i_c=cp_idx,
            i_p=cp_idx[dev.prev_idx],
        )

    gxx_m, gxy_m, gyy_m = second_order_gradients(Gx, Gy)
    gxx = gxx_m.reshape(-1)[pm_pix]
    gxy = gxy_m.reshape(-1)[pm_pix]
    gyy = gyy_m.reshape(-1)[pm_pix]
    # temp = Gpm + dp^T G2pm  (1x2; reference model.cpp:238)
    tx = gx + dp[:, 0] * gxx + dp[:, 1] * gxy
    ty = gy + dp[:, 0] * gxy + dp[:, 1] * gyy

    # Jc = temp . dpm_dcp(curr) ; Jp = -Gpm . dpm_dcp(prev)
    Jc = tx[:, None] * dpm_dcp[:, 0, :] + ty[:, None] * dpm_dcp[:, 1, :]
    dpm_dcp_prev = dpm_dcp[dev.prev_idx]
    Jp = -(gx[:, None] * dpm_dcp_prev[:, 0, :] + gy[:, None] * dpm_dcp_prev[:, 1, :])

    return Linearization(
        e=e,
        inlier=inlier,
        pm_pix=pm_pix,
        num_ev_map=num_ev_map,
        d=dp,
        Jc=Jc,
        Jp=Jp,
        i_c=cp_idx,
        i_p=cp_idx[dev.prev_idx],
    )


# ---------------------------------------------------------------------------
# Costs (reference model.cpp:279-314 and solver.cpp:84-91).
# ---------------------------------------------------------------------------


def data_cost(e, cfg: ModelConfig):
    if not cfg.use_irls:
        return 0.5 * jnp.sum(e * e)
    a = cfg.eta
    if cfg.cost_type == "cauchy":
        return (0.5 / a) * jnp.sum(jnp.log1p(a * e * e))
    # huber
    abs_e = jnp.abs(e)
    quad = 0.5 * abs_e * abs_e
    lin = a * abs_e - 0.5 * a * a
    return jnp.sum(jnp.where(abs_e < a, quad, lin))


def reg_cost(Gx, Gy, alpha):
    return alpha * 0.5 * (jnp.sum(Gx * Gx) + jnp.sum(Gy * Gy))


def irls_weights(e, cfg: ModelConfig):
    """Per-measurement IRLS weights (reference model.cpp:599-617)."""
    if not cfg.use_irls:
        return jnp.ones_like(e)
    a = cfg.eta
    if cfg.cost_type == "cauchy":
        return 1.0 / (1.0 + a * e * e)
    abs_e = jnp.abs(e)
    return jnp.where(abs_e < a, 1.0, a / jnp.maximum(abs_e, 1e-30))


# ---------------------------------------------------------------------------
# Normal equations.
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalEq:
    A11: jax.Array  # (3K, 3K)
    b1: jax.Array  # (3K,)
    A22: jax.Array  # (HW, 3): xx, xy, yy per pano pixel (0 where inactive)
    b2: jax.Array  # (HW, 2)
    A12: jax.Array  # (HW, 2, 3K) pose-map coupling (0 where inactive)
    active: jax.Array  # (HW,) bool


def _place_blocks(A, blocks, row_seg, col_seg, d):
    """Scatter-add (M, d, d) blocks into A at (3*row_seg, 3*col_seg)."""
    r = 3 * row_seg[:, None, None] + jnp.arange(d)[None, :, None]
    c = 3 * col_seg[:, None, None] + jnp.arange(d)[None, None, :]
    return A.at[r, c].add(blocks)


@partial(jax.jit, static_argnames=("cfg", "num_knots"))
def form_normal_eq(
    lin: Linearization, Gx, Gy, cfg: ModelConfig, num_knots: int
) -> NormalEq:
    """Build the Schur-structured normal equations (reference
    ``formNormalEq``/``formNormalEqIRLS`` model.cpp:316-687 + ``applyL2Reg``
    model.cpp:689-719), as segment-sums over static shapes.

    Masking replaces the reference's dynamic active-pixel sets: a measurement
    enters iff it is an inlier AND its curr event lands on an active pixel
    (>= thres_valid_pixel inliers, model.cpp:407-411)."""
    dt = lin.e.dtype
    d = cfg.dim_block
    nseg = num_knots - cfg.spline_order + 1
    dim_pose = 3 * num_knots

    active = lin.num_ev_map >= cfg.thres_valid_pixel
    w = lin.inlier & active[lin.pm_pix]
    yi = irls_weights(lin.e, cfg)
    wA = jnp.where(w, yi, 0.0).astype(dt)  # weight for LHS terms
    we = wA * lin.e  # reweighted residual for RHS terms

    Jc, Jp = lin.Jc, lin.Jp
    i_c, i_p = lin.i_c, lin.i_p

    # ---- A11: per-segment block segment-sums ------------------------------
    cc = jax.ops.segment_sum(
        wA[:, None, None] * (Jc[:, :, None] * Jc[:, None, :]),
        i_c,
        num_segments=nseg,
        indices_are_sorted=True,
    )
    pp = jax.ops.segment_sum(
        wA[:, None, None] * (Jp[:, :, None] * Jp[:, None, :]),
        i_p,
        num_segments=nseg,
    )
    cross = jax.ops.segment_sum(
        wA[:, None, None] * (Jc[:, :, None] * Jp[:, None, :]),
        i_c * nseg + i_p,
        num_segments=nseg * nseg,
    )
    A11 = jnp.zeros((dim_pose, dim_pose), dt)
    segs = jnp.arange(nseg, dtype=jnp.int32)
    A11 = _place_blocks(A11, cc, segs, segs, d)
    A11 = _place_blocks(A11, pp, segs, segs, d)
    keys_c = jnp.repeat(segs, nseg)
    keys_p = jnp.tile(segs, nseg)
    A11 = _place_blocks(A11, cross, keys_c, keys_p, d)
    A11 = _place_blocks(A11, jnp.swapaxes(cross, -1, -2), keys_p, keys_c, d)

    # ---- b1 ---------------------------------------------------------------
    b1c = jax.ops.segment_sum(
        we[:, None] * Jc, i_c, num_segments=nseg, indices_are_sorted=True
    )
    b1p = jax.ops.segment_sum(we[:, None] * Jp, i_p, num_segments=nseg)
    b1 = jnp.zeros((dim_pose,), dt)
    cols = 3 * segs[:, None] + jnp.arange(d)[None, :]
    b1 = b1.at[cols].add(b1c)
    b1 = b1.at[cols].add(b1p)

    # ---- A22 (2x2 blocks as xx, xy, yy), b2 -------------------------------
    dx, dy = lin.d[:, 0], lin.d[:, 1]
    a22_vals = jnp.stack([wA * dx * dx, wA * dx * dy, wA * dy * dy], axis=-1)
    A22 = jax.ops.segment_sum(a22_vals, lin.pm_pix, num_segments=cfg.num_pix)
    b2_vals = jnp.stack([we * dx, we * dy], axis=-1)
    b2 = jax.ops.segment_sum(b2_vals, lin.pm_pix, num_segments=cfg.num_pix)

    # ---- A12: (HW, 2, 3K) scatter of compact (D, 2) half-blocks -----------
    A12 = jnp.zeros((cfg.num_pix, 2, dim_pose), dt)
    col_c = 3 * i_c[:, None] + jnp.arange(d)[None, :]  # (N, D)
    col_p = 3 * i_p[:, None] + jnp.arange(d)[None, :]
    two = jnp.arange(2)[None, :, None]
    vals_c = (wA[:, None] * lin.d)[:, :, None] * Jc[:, None, :]  # (N, 2, D)
    vals_p = (wA[:, None] * lin.d)[:, :, None] * Jp[:, None, :]
    A12 = A12.at[lin.pm_pix[:, None, None], two, col_c[:, None, :]].add(vals_c)
    A12 = A12.at[lin.pm_pix[:, None, None], two, col_p[:, None, :]].add(vals_p)

    # ---- L2 map regularizer (active pixels only) --------------------------
    alpha = jnp.asarray(cfg.alpha, dt)
    act_f = active.astype(dt)
    A22 = A22.at[:, 0].add(alpha * act_f)
    A22 = A22.at[:, 2].add(alpha * act_f)
    g_flat = jnp.stack([Gx.reshape(-1), Gy.reshape(-1)], axis=-1)
    b2 = b2 - alpha * act_f[:, None] * g_flat

    return NormalEq(A11=A11, b1=b1, A22=A22, b2=b2, A12=A12, active=active)


# ---------------------------------------------------------------------------
# Solving (reference solveNormalEq, model.cpp:721-792).
# ---------------------------------------------------------------------------


def _damped_a22_inv(A22, active, lam):
    """Per-pixel inverse of the LM-damped 2x2 blocks; zero where inactive
    (inactive pixels are excluded from the system, matching the reference's
    compaction). A22m = A22 + lam * diag(A22) (model.cpp:747-750)."""
    dt = A22.dtype
    a = A22[:, 0] * (1.0 + lam)
    b = A22[:, 1]
    c = A22[:, 2] * (1.0 + lam)
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    inv = jnp.stack([c, -b, a], axis=-1) / det_safe[:, None]
    mask = (active & (jnp.abs(det) >= 1e-30)).astype(dt)[:, None]
    return inv * mask  # (HW, 3): m00, m01, m11


def _a22inv_apply(inv, v):
    """Apply per-pixel symmetric 2x2 (stored xx, xy, yy) to (HW, 2, ...)."""
    m00, m01, m11 = inv[:, 0], inv[:, 1], inv[:, 2]
    if v.ndim == 2:
        return jnp.stack(
            [m00 * v[:, 0] + m01 * v[:, 1], m01 * v[:, 0] + m11 * v[:, 1]], axis=1
        )
    return jnp.stack(
        [
            m00[:, None] * v[:, 0] + m01[:, None] * v[:, 1],
            m01[:, None] * v[:, 0] + m11[:, None] * v[:, 1],
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("fix_first",))
def solve_normal_eq(neq: NormalEq, lam, fix_first: bool = False):
    """Schur-complement solve (reference model.cpp:721-792):

      A11m = A11 + lam diag(A11);  A22m^-1 per 2x2 block (batched);
      S = A11m - A12 A22m^-1 A12^T  (one big MXU GEMM over pixel rows);
      x1 = chol_solve(S, b1 - A12 A22m^-1 b2);
      x2 = A22m^-1 (b2 - A12^T x1).

    ``fix_first`` gauge-fixes the first control pose by masking its rows and
    columns (the TPU-shaped equivalent of the reference's row deletion,
    solver.cpp:156-165)."""
    dt = neq.b1.dtype
    dim = neq.b1.shape[0]
    A11, b1, A12 = neq.A11, neq.b1, neq.A12
    if fix_first:
        m = (jnp.arange(dim) >= 3).astype(dt)
        A11 = A11 * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b1 = b1 * m
        A12 = A12 * m[None, None, :]

    A11m = A11 + lam * jnp.diag(jnp.diag(A11))
    inv = _damped_a22_inv(neq.A22, neq.active, lam)

    Z = _a22inv_apply(inv, A12)  # (HW, 2, 3K) = A22m^-1 A12
    a12_flat = A12.reshape(-1, dim)  # (2 HW, 3K)
    z_flat = Z.reshape(-1, dim)
    S = A11m - jnp.dot(
        a12_flat.T, z_flat, preferred_element_type=dt
    )  # Schur complement

    invb2 = _a22inv_apply(inv, neq.b2)  # (HW, 2)
    rhs = b1 - a12_flat.T @ invb2.reshape(-1)

    # Keep S factorizable when some knots are unobserved (zero rows — e.g.
    # sparse windows): their b1 is zero, so with a tiny diagonal floor the
    # corresponding increments solve to zero instead of NaN.
    eps = 1e-10 * jnp.maximum(jnp.max(jnp.diag(S)), 1.0) + 1e-30
    S = S + eps * jnp.eye(dim, dtype=dt)

    chol, lower = jax.scipy.linalg.cho_factor(S)
    x1 = jax.scipy.linalg.cho_solve((chol, lower), rhs)

    a12t_x1 = (a12_flat @ x1).reshape(-1, 2)  # (HW, 2)
    x2 = _a22inv_apply(inv, neq.b2 - a12t_x1)
    return x1, x2


@partial(jax.jit, static_argnames=("fix_first", "max_iter"))
def solve_normal_eq_cg(
    neq: NormalEq, lam, fix_first: bool = False, max_iter: int = 100, tol=1e-6
):
    """Matrix-free conjugate gradient on the full system
    [A11m A12; A12^T A22m] (reference ``solveNormalEqCG``,
    model.cpp:794-840: Eigen CG, max 100 iters, tol 1e-6).

    The TPU formulation never concatenates sparse matrices: the operator is
    applied blockwise (dense GEMV for A11/A12, per-pixel 2x2 for A22)."""
    dt = neq.b1.dtype
    dim = neq.b1.shape[0]
    A11, b1, A12 = neq.A11, neq.b1, neq.A12
    if fix_first:
        m = (jnp.arange(dim) >= 3).astype(dt)
        A11 = A11 * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b1 = b1 * m
        A12 = A12 * m[None, None, :]

    A11m = A11 + lam * jnp.diag(jnp.diag(A11))
    a = neq.A22[:, 0] * (1.0 + lam)
    b = neq.A22[:, 1]
    c = neq.A22[:, 2] * (1.0 + lam)
    act = neq.active.astype(dt)
    a12_flat = A12.reshape(-1, dim)

    def matvec(x1, x2):
        # x2: (HW, 2). Inactive pixels: identity (keeps system nonsingular,
        # their rhs is zero so their solution stays zero).
        y1 = A11m @ x1 + a12_flat.T @ x2.reshape(-1)
        a22x = jnp.stack(
            [a * x2[:, 0] + b * x2[:, 1], b * x2[:, 0] + c * x2[:, 1]], axis=1
        )
        y2 = (a12_flat @ x1).reshape(-1, 2) + jnp.where(
            neq.active[:, None], a22x, x2
        )
        return y1, y2

    b2 = neq.b2 * act[:, None]
    bnorm2 = jnp.sum(b1 * b1) + jnp.sum(b2 * b2)

    def body(state):
        x1, x2, r1, r2, p1, p2, rs, it = state
        ap1, ap2 = matvec(p1, p2)
        alpha_ = rs / (jnp.sum(p1 * ap1) + jnp.sum(p2 * ap2) + 1e-300)
        x1, x2 = x1 + alpha_ * p1, x2 + alpha_ * p2
        r1, r2 = r1 - alpha_ * ap1, r2 - alpha_ * ap2
        rs_new = jnp.sum(r1 * r1) + jnp.sum(r2 * r2)
        beta = rs_new / (rs + 1e-300)
        return x1, x2, r1, r2, r1 + beta * p1, r2 + beta * p2, rs_new, it + 1

    def cond(state):
        *_, rs, it = state
        return (it < max_iter) & (rs > tol * tol * bnorm2)

    x1 = jnp.zeros_like(b1)
    x2 = jnp.zeros_like(b2)
    state = (x1, x2, b1, b2, b1, b2, bnorm2, jnp.asarray(0))
    x1, x2, _, _, _, _, rs, it = jax.lax.while_loop(cond, body, state)
    return x1, x2 * act[:, None], it, jnp.sqrt(rs / jnp.maximum(bnorm2, 1e-300))


@jax.jit
def update_map(Gx, Gy, x2, damping, active):
    """Apply the map increment: active pixels ``G += damping * x2``; inactive
    pixels reset to zero (reference ``updateMap``, model.cpp:863-903)."""
    shape = Gx.shape
    act = active.reshape(shape)
    gx = jnp.where(act, Gx + damping * x2[:, 0].reshape(shape), 0.0)
    gy = jnp.where(act, Gy + damping * x2[:, 1].reshape(shape), 0.0)
    return gx, gy


def update_knots(knots, x1, fix_first: bool = False):
    """Left-multiplicative trajectory update from the solved perturbation
    (reference Model::updateTraj, model.cpp:22-53). ``fix_first`` zeroes the
    first knot's increment (gauge: solver.cpp:229)."""
    from . import lie

    drotv = x1.reshape(-1, 3)
    if fix_first:
        drotv = drotv.at[0].set(0.0)
    return lie.exp(drotv) @ knots
