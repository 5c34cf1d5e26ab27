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

TPU-first design (SURVEY.md §7 + hardware layout rules):

* every per-event array is 1-D ``(N,)`` or transposed ``(small, N)`` — XLA
  TPU tiles the last two dims to (8, 128), so ``(N, 6)``-style layouts would
  pad 21x in memory (this OOM'd a 4M-event problem at 19 GB),
* the reference's three per-event hot loops become dense batched array ops
  over static shapes; dynamic active-pixel sets become masks,
* the normal equations have two producers sharing one layout (NormalEq):
  the default TPU path is the Pallas sorted-accumulation kernel
  (``kernels/a12_accum.py``: A11/b1/A12/A22/b2 in one pass of MXU GEMMs over
  pixel-bucketed measurements); the fallback (CPU / f64 / sharded) is a
  ``lax.scan`` over measurement chunks — one-hot row expansion + GEMM for
  A11/b1, 1-D per-pixel scatter-adds for A22/b2/A12,
* the Schur reduction and back-substitution are plain 2-D GEMMs over the
  A12 column planes; A22 inversion is a batched closed-form 2x2.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import warp
from .camera import EquirectangularCamera

# Measurement-chunk size for the normal-equation scan (static).
CHUNK = 1 << 16

# Bias added to int32 values before bitcasting them into f32 payload rows:
# raw small ints are f32 denormals, which TPU compute/copy passes flush to
# zero (FTZ). 0x40000000 puts every id < 2^23 at exponent 0x80 (a normal
# float in [2, 4)), making the bitcast round-trip FTZ-proof.
_BID_BIAS = 0x40000000


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
    # Use the Pallas sorted-accumulation kernel for A12/A22/b2 (TPU only).
    use_pallas: bool = False
    # Active-pixel compaction: build the map-domain normal equations over at
    # most `compact_cap` ACTIVE pixels instead of the full panorama (the
    # reference's compact active-pixel indexing, model.cpp:371-378, made
    # static). None = full pixel domain. Shrinks the Schur GEMMs by the
    # inactive fraction and makes 4K panoramas fit on one chip; measurements
    # on active pixels beyond the cap are dropped (choose the cap >= the
    # expected active count — it is bounded by both HW and the measurement
    # count).
    compact_cap: int | None = None
    # Streamed normal-equation forming: recompute per-event Jacobians in
    # chunks of this many events inside the accumulation pass instead of
    # holding (D, N) Jacobians for the whole window. The linearization goes
    # "light" — only (N,)-sized fields stay resident — which is what lets
    # windows of 10^7-10^8 events (SURVEY.md §6 problem sizes) fit one chip.
    # None = classic two-phase linearize-then-form.
    stream_chunk: int | None = None
    # Light-trial classic mode: LM trial evaluations compute the COST ONLY
    # (a light linearization with no (D, N) Jacobians); the Jacobians are
    # recomputed inside the forming pass, which runs only after ACCEPTED
    # steps — the reference's own trial structure (solver.cpp:66-103
    # relinearizes only on accept). Rejected iterations therefore never pay
    # the Jacobian chain + (2+2D, N) prev gather. Same LM path and results
    # as the classic two-phase path (to cross-program float-association
    # tolerance). Ignored when stream_chunk is set (the
    # streamed FULL tier already has this structure).
    light_trial: bool = False
    # Map sampling point of the LEGM residual/Jacobians. "curr" is the
    # reference formulation: G and its second-order gradients are evaluated
    # at the CURR event's pano pixel (model.cpp:194-221, 238-241). "mid"
    # evaluates them at the (pm_prev, pm_curr) MIDPOINT pixel — a midpoint-
    # rule quadrature of the brightness increment G . dp whose Taylor error
    # is O(|dp|^3) instead of the rectangle rule's O(|dp|^2), halving the
    # LEGM's systematic error on large inter-event displacements at zero
    # extra cost (same gathers, same block structure; the pose Jacobians
    # become symmetric: Jc = (G + dp^T G2 / 2) . dpm_c,
    # Jp = (dp^T G2 / 2 - G) . dpm_p; map blocks key on the midpoint pixel).
    # A framework extension beyond the reference (measured A/B in
    # docs/suite_table_ecrot_r5.md).
    sample_mode: str = "curr"  # curr | mid
    # Two-tier streaming (with stream_chunk set): the LIGHT tier keeps the
    # (N,)-sized residual fields of the linearization resident and
    # chunk-recomputes ONLY the (D, N) Jacobians — the fast tier, ~25 B/event
    # of residency, fits one chip to ~32M events. False = the FULL tier:
    # the whole residual chain is recomputed per chunk and NO O(N) output
    # survives either LM phase (zero residency beyond the window data —
    # the 10^8-event tier). The pipeline auto-selects by per-device event
    # count. Both tiers are bit-identical to classic forming.
    stream_light: bool = False

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
    """Static per-window event data resident on device (all jnp arrays,
    layouts chosen for TPU tiling: 1-D per-event vectors, (3, N) bearings)."""

    bearings: jax.Array  # (3, N) per-event unit bearing vectors
    pol_signed: jax.Array  # (N,) +-1 * 1.0 (curr-event polarity sign)
    prev_idx: jax.Array  # (N,) int32, clipped to >= 0
    has_prev: jax.Array  # (N,) bool
    batch_ids: jax.Array  # (N,) int32 event -> pose batch
    batch_s: jax.Array  # (NB,) int32 spline segment per batch
    batch_u: jax.Array  # (NB,) normalized offset per batch (mid-time)
    # (N,) int32 flat sensor pixel — the key of the cross-shard pairing halo
    # exchange (dist.py). None on windows built before sharding was in play.
    sensor_pix: jax.Array | None = None

    @classmethod
    def from_window(cls, win, bearing_lut: np.ndarray, sensor_width: int,
                    dtype, pad_multiple: int = 1):
        """``pad_multiple``: pre-pad the per-event arrays to a multiple of
        this length (set it to ``cfg.stream_chunk`` for streamed windows).
        Padding slots are valid non-measurements — unit z bearing (a zero
        bearing would warp to NaN), ``has_prev=False`` so they are inliers
        nowhere — letting the streamed passes slice chunks with ZERO padded
        copies at trace time (see ``_make_stream_chunk_fn``)."""
        spix = win.sensor_flat_idx(sensor_width)
        n = len(spix)
        pad = -(-n // pad_multiple) * pad_multiple - n

        def pad1(a, v=0):
            if pad == 0:
                return a
            return np.concatenate([a, np.full(pad, v, a.dtype)])

        b = np.ascontiguousarray(bearing_lut[spix].T)
        if pad:
            b = np.concatenate(
                [b, np.tile(np.array([[0.0], [0.0], [1.0]], b.dtype), pad)],
                axis=1,
            )
        return cls(
            bearings=jnp.asarray(b, dtype),
            pol_signed=jnp.asarray(
                pad1(2.0 * (win.pol.astype(np.float64) - 0.5)), dtype
            ),
            prev_idx=jnp.asarray(
                pad1(np.maximum(win.prev_idx, 0).astype(np.int32)), jnp.int32
            ),
            has_prev=jnp.asarray(pad1(win.prev_idx >= 0, False)),
            batch_ids=jnp.asarray(
                pad1(win.batch_ids().astype(np.int32)), jnp.int32
            ),
            batch_s=jnp.asarray(win.batch_s, jnp.int32),
            batch_u=jnp.asarray(win.batch_u, dtype),
            sensor_pix=jnp.asarray(pad1(spix.astype(np.int32)), jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Linearization:
    """Per-measurement quantities produced by one model linearization.

    The measurement k is the event pair (prev_idx[k], k); entries of
    non-measurements (first event at a pixel, outliers) are masked to zero.
    All fields are (N,) or (small, N) — TPU-friendly layouts.
    """

    e: jax.Array  # (N,) residuals (0 for non-inliers)
    inlier: jax.Array  # (N,) bool
    pm_pix: jax.Array  # (N,) int32 flat pano pixel of curr event
    num_ev_map: jax.Array  # (HW,) int32 inlier count per pano pixel
    dx: jax.Array  # (N,) dM/dGx = dp_x
    dy: jax.Array  # (N,) dM/dGy = dp_y
    Jc: jax.Array  # (D, N) pose Jacobian, curr half
    Jp: jax.Array  # (D, N) pose Jacobian, prev half
    i_c: jax.Array  # (N,) int32 segment of curr event
    i_p: jax.Array  # (N,) int32 segment of prev event


@partial(jax.jit, static_argnames=("cfg", "need_deriv"))
def linearize(knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig, need_deriv=True):
    """Warp + pair + residual + per-measurement Jacobians
    (reference ``LEGM::evaluateDataError``, model.cpp:72-258)."""
    pm, cp_idx, dpm_dcp = warp.warp_events(
        knots,
        dev.batch_s,
        dev.batch_u,
        dev.batch_ids,
        dev.bearings,
        cfg.pano,
        cfg.spline_order,
        need_jacobian=need_deriv,
    )
    pmx, pmy = pm  # (N,), (N,)
    d = cfg.dim_block

    # local pairing: gather the prev event's warped data by index. TPU
    # random gathers fetch whole (8,128) tiles per element, so (pmx, pmy)
    # and the 2D Jacobian rows ride ONE stacked gather (2+2D rows) instead
    # of two separate ones (1 + ceil(2D/8) tile fetches per element fewer).
    if need_deriv:
        prev_src = jnp.concatenate(
            [jnp.stack([pmx, pmy]), dpm_dcp.reshape(2 * d, -1)], axis=0
        )  # (2 + 2D, N)
        prev_g = jnp.take(prev_src, dev.prev_idx, axis=1)
        pm_prev = prev_g[:2]
        dpm_prev = prev_g[2:].reshape(2, d, -1)
    else:
        pm_prev = jnp.take(jnp.stack([pmx, pmy]), dev.prev_idx, axis=1)
        dpm_prev = None
    i_p = cp_idx[dev.prev_idx]
    return linearize_from_warp(
        pmx, pmy, cp_idx, dpm_dcp, pm_prev, dpm_prev, i_p, dev.has_prev,
        dev.pol_signed, Gx, Gy, cfg, need_deriv,
    )


def _pair_residual(pmx, pmy, ppx, ppy, has_prev, pol_signed, gmaps, cfg):
    """Pairing displacement + residual core (reference model.cpp:186-227),
    shared verbatim between the full linearization and the streamed per-chunk
    recompute so the two are bit-identical.

    Returns (dx, dy, inlier, pm_pix, g_at, e); ``g_at`` is the stacked map
    gather at pm_pix ((2|5, n) depending on the rows of ``gmaps``)."""
    dx = pmx - ppx
    dy = pmy - ppy
    dp_norm2 = dx * dx + dy * dy
    inlier = has_prev & (dp_norm2 <= cfg.outlier_dp_norm**2)

    # Map sampling point: the curr event (reference model.cpp:209-211) or
    # the pair midpoint (cfg.sample_mode="mid", midpoint-rule quadrature —
    # see ModelConfig). Surviving pairs have |dp| <= outlier_dp_norm, so the
    # midpoint never straddles the pano seam further than dp itself does.
    if cfg.sample_mode == "mid":
        sx = 0.5 * (pmx + ppx)
        sy = 0.5 * (pmy + ppy)
    else:
        sx, sy = pmx, pmy
    # Nearest pano pixel (std::round = half away from zero; pm >= 0 here so
    # floor(pm + 0.5) matches; reference model.cpp:209-211).
    px = jnp.clip(jnp.floor(sx + 0.5).astype(jnp.int32), 0, cfg.pano_width - 1)
    py = jnp.clip(jnp.floor(sy + 0.5).astype(jnp.int32), 0, cfg.pano_height - 1)
    pm_pix = py * cfg.pano_width + px

    # One map gather for everything indexed by pm_pix: (Gx, Gy) and, in
    # derivative mode, the three second-order maps ride the SAME (5, HW)
    # stacked gather (one tile fetch per element instead of two).
    g_at = jnp.take(gmaps, pm_pix, axis=1)  # one fused gather -> (2|5, n)
    gx, gy = g_at[0], g_at[1]
    c_pred = gx * dx + gy * dy
    c_meas = pol_signed * cfg.c_th
    e = jnp.where(inlier, c_meas - c_pred, 0.0)
    return dx, dy, inlier, pm_pix, g_at, e


def _pose_jac_coeffs(g_at, dx, dy, cfg):
    """Pose-Jacobian row coefficients shared by every producer:
    ``Jc = tx * dpm_c[0] + ty * dpm_c[1]``, ``Jp = hx * dpm_p[0] + hy *
    dpm_p[1]``. "curr" mode is the reference math — temp = Gpm + dp^T G2pm
    on the curr side (model.cpp:238), Jp = -Gpm . dpm_prev (:449, 459).
    "mid" mode differentiates G(midpoint) . dp symmetrically (see
    ModelConfig.sample_mode)."""
    gx, gy = g_at[0], g_at[1]
    if cfg.sample_mode == "mid":
        sx = dx * g_at[2] + dy * g_at[3]
        sy = dx * g_at[3] + dy * g_at[4]
        return gx + 0.5 * sx, gy + 0.5 * sy, 0.5 * sx - gx, 0.5 * sy - gy
    # association kept exactly as the pre-helper inline form ((gx + a) + b)
    # so "curr" stays bit-identical across program versions
    return (
        gx + dx * g_at[2] + dy * g_at[3],
        gy + dx * g_at[3] + dy * g_at[4],
        -gx,
        -gy,
    )


def _stacked_gmaps(Gx, Gy, need_deriv: bool):
    """(2|5, HW) stacked map planes: values (+ second-order gradients when
    linearizing) share one gather per event."""
    if need_deriv:
        gxx_m, gxy_m, gyy_m = second_order_gradients(Gx, Gy)
        return jnp.stack(
            [Gx.reshape(-1), Gy.reshape(-1), gxx_m.reshape(-1),
             gxy_m.reshape(-1), gyy_m.reshape(-1)]
        )
    return jnp.stack([Gx.reshape(-1), Gy.reshape(-1)])


def linearize_from_warp(
    pmx, pmy, cp_idx, dpm_dcp, pm_prev, dpm_prev, i_p, has_prev, pol_signed,
    Gx, Gy, cfg: ModelConfig, need_deriv=True,
):
    """Residual + Jacobian core given warped curr events and their PREV-event
    data. The single-device path gathers prevs locally (``linearize``); the
    sharded path supplies cross-shard prevs from a halo exchange
    (``dist.py``) — the math (reference model.cpp:179-246) is identical.
    """
    gmaps = _stacked_gmaps(Gx, Gy, need_deriv)
    dx, dy, inlier, pm_pix, g_at, e = _pair_residual(
        pmx, pmy, pm_prev[0], pm_prev[1], has_prev, pol_signed, gmaps, cfg
    )

    num_ev_map = jnp.zeros((cfg.num_pix,), jnp.int32).at[pm_pix].add(
        inlier.astype(jnp.int32), mode="drop"
    )

    if not need_deriv:
        # empty (D, 0) placeholders: a "light" linearization carries no
        # per-event Jacobians (the streamed forming pass recomputes them
        # chunk-wise — the 10^7-10^8-event memory story)
        zeros_d = jnp.zeros((cfg.dim_block, 0), pmx.dtype)
        return Linearization(
            e=e,
            inlier=inlier,
            pm_pix=pm_pix,
            num_ev_map=num_ev_map,
            dx=dx,
            dy=dy,
            Jc=zeros_d,
            Jp=zeros_d,
            i_c=cp_idx,
            i_p=i_p,
        )

    # temp = Gpm + dp^T G2pm (1x2; reference model.cpp:238); Jp coefficients
    # -Gpm (:459) — or the symmetric midpoint halves (ModelConfig.sample_mode)
    tx, ty, hx, hy = _pose_jac_coeffs(g_at, dx, dy, cfg)

    # dpm_dcp: (2, D, N). Jc = temp . dpm_dcp(curr); Jp = (hx, hy) . dpm(prev)
    Jc = tx[None, :] * dpm_dcp[0] + ty[None, :] * dpm_dcp[1]  # (D, N)
    Jp = hx[None, :] * dpm_prev[0] + hy[None, :] * dpm_prev[1]

    return Linearization(
        e=e,
        inlier=inlier,
        pm_pix=pm_pix,
        num_ev_map=num_ev_map,
        dx=dx,
        dy=dy,
        Jc=Jc,
        Jp=Jp,
        i_c=cp_idx,
        i_p=i_p,
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NormalEq:
    """Schur-structured normal equations over the map ROW space.

    A12 is stored as (R_pad, 2*dp_pad) with dp_pad = round_up(3K, 128):
    columns [0:dp_pad) are the Gx plane, [dp_pad:2dp_pad) the Gy plane. A
    row is a pano pixel (R_pad = HW_pad) or, with active-pixel compaction
    (``ModelConfig.compact_cap``), a compact active-pixel slot (R_pad =
    round_up(cap)). ``pix2row`` maps pano pixels to rows (out-of-range =
    dropped); ``active_pix`` is pixel-space activity for the map update.
    This layout makes the Schur reduction two plain 2-D GEMMs contracting
    over rows and matches the Pallas accumulation kernel's output.
    """

    A11: jax.Array  # (3K, 3K)
    b1: jax.Array  # (3K,)
    a22_xx: jax.Array  # (R_pad,)
    a22_xy: jax.Array  # (R_pad,)
    a22_yy: jax.Array  # (R_pad,)
    b2_x: jax.Array  # (R_pad,)
    b2_y: jax.Array  # (R_pad,)
    A12: jax.Array  # (R_pad, 2*dp_pad)
    active: jax.Array  # (R_pad,) bool row validity
    pix2row: jax.Array  # (HW,) int32 pano pixel -> row (>= R_pad: dropped)
    active_pix: jax.Array  # (HW,) bool pixel-space activity
    # Scalars for observability (and cheap host sync points): Np — the
    # active-pixel count the reference logs per iteration (solver.cpp:283-293)
    # — and the number of measurements dropped by compaction-cap overflow
    # (0 unless compact_cap is undersized; no silent truncation).
    active_count: jax.Array  # () int32
    dropped: jax.Array  # () int32


def _pad_to_chunks(x, n_pad, value=0):
    return jnp.pad(x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1), constant_values=value)


@partial(jax.jit, static_argnames=("cfg", "num_knots"))
def form_normal_eq(
    lin: Linearization, Gx, Gy, cfg: ModelConfig, num_knots: int,
    reg_scale=None,
) -> NormalEq:
    """Build the Schur-structured normal equations (reference
    ``formNormalEq``/``formNormalEqIRLS`` model.cpp:316-687 + ``applyL2Reg``
    model.cpp:689-719).

    Masking replaces the reference's dynamic active-pixel sets: a measurement
    enters iff it is an inlier AND its curr event lands on an active pixel
    (>= thres_valid_pixel inliers, model.cpp:407-411).

    ``reg_scale``: optional traced multiplier on the L2 regularizer — the
    sharded builders pass ``1.0`` on exactly one shard and ``0.0`` elsewhere
    so the psum-reduced system applies the regularizer exactly once
    (reference applies it once, model.cpp:689-719).
    """
    dt = lin.e.dtype
    dim_pose = 3 * num_knots

    active, r_pad, pix2row, row_active = _row_space(lin.num_ev_map, cfg)
    # non-compact: rows ARE pixels — skip the (N,)-sized indirection gather
    row_of_meas = (
        lin.pm_pix if cfg.compact_cap is None else pix2row[lin.pm_pix]
    )
    wA, we, dropped = _meas_weights(
        lin.e, lin.inlier, lin.pm_pix, active, row_of_meas, r_pad, cfg, dt
    )

    if cfg.use_pallas and dt == jnp.float32:
        A12, px5, a11b = _pallas_accumulate(
            row_of_meas, lin.i_c, lin.i_p, lin.Jc, lin.Jp, lin.dx, lin.dy,
            lin.e, wA, we, r_pad, dim_pose, cfg.spline_order,
        )
        return _finish_from_pallas(
            A12, px5, a11b, row_active, pix2row, active, Gx, Gy, cfg, r_pad,
            dt, dropped, reg_scale, dim_pose,
        )

    carry0 = _xla_carry0(dim_pose, r_pad, dt)
    carry = _xla_accumulate(
        carry0, wA, we, lin.i_c, lin.i_p, lin.Jc, lin.Jp, lin.dx, lin.dy,
        row_of_meas, cfg, dim_pose, r_pad, dt,
    )
    A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12 = carry
    A12 = A12.reshape(r_pad, 2 * _round_up(dim_pose, 128))
    return _finish_normal_eq(
        A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12, row_active, pix2row,
        active, Gx, Gy, cfg, r_pad, dt, dropped, reg_scale,
    )


@partial(jax.jit, static_argnames=("cfg", "num_knots"))
def form_normal_eq_light(
    lin: Linearization, knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    num_knots: int, reg_scale=None,
) -> NormalEq:
    """Relinearize-on-accept forming for the LIGHT-TRIAL classic mode:
    ``lin`` is the light linearization from the objective pass
    (``linearize(..., need_deriv=False)`` — (N,)-resident residual fields,
    no Jacobians); this pass recomputes the (D, N) Jacobians (curr warp
    derivative chain + prev-event gather, reference model.cpp:238-241, 449,
    459) and forms the normal equations. Same math as
    ``form_normal_eq(linearize(..., need_deriv=True))`` — the same ops on
    the same inputs (equal up to cross-program float association). Because
    forming runs only after ACCEPTED steps (the
    reference's own structure, solver.cpp:66-103), rejected LM trials never
    pay the Jacobian cost."""
    d = cfg.dim_block
    _, _, dpm = warp.warp_events(
        knots, dev.batch_s, dev.batch_u, dev.batch_ids, dev.bearings,
        cfg.pano, cfg.spline_order, need_jacobian=True,
    )
    dpm_prev = jnp.take(
        dpm.reshape(2 * d, -1), dev.prev_idx, axis=1
    ).reshape(2, d, -1)
    gmaps = _stacked_gmaps(Gx, Gy, True)
    g_at = jnp.take(gmaps, lin.pm_pix, axis=1)  # (5, N) one fused gather
    # temp = Gpm + dp^T G2pm (model.cpp:238); Jp = -Gpm . dpm_prev (:459),
    # or the symmetric midpoint halves (ModelConfig.sample_mode)
    tx, ty, hx, hy = _pose_jac_coeffs(g_at, lin.dx, lin.dy, cfg)
    Jc = tx[None, :] * dpm[0] + ty[None, :] * dpm[1]
    Jp = hx[None, :] * dpm_prev[0] + hy[None, :] * dpm_prev[1]
    full = dataclasses.replace(lin, Jc=Jc, Jp=Jp)
    return form_normal_eq(full, Gx, Gy, cfg, num_knots, reg_scale)


def _row_space(num_ev_map, cfg: ModelConfig):
    """Active-pixel mask + the map-domain row space (full pixel domain or
    compacted actives — reference model.cpp:371-378 made static)."""
    from .kernels.a12_accum import TILE_PX

    hw = cfg.num_pix
    active = num_ev_map >= cfg.thres_valid_pixel
    if cfg.compact_cap is not None:
        r_dom = min(cfg.compact_cap, hw)
        r_pad = _round_up(r_dom, TILE_PX)
        compact_id = jnp.cumsum(active.astype(jnp.int32)) - 1
        # active pixels -> their compact slot (beyond-cap slots overflow past
        # r_pad and are dropped everywhere); inactive pixels -> dropped
        pix2row = jnp.where(active, compact_id, r_pad).astype(jnp.int32)
        pix2row = jnp.where(pix2row >= r_pad, r_pad, pix2row)
        num_active = jnp.sum(active.astype(jnp.int32))
        row_active = jnp.arange(r_pad) < jnp.minimum(num_active, r_dom)
    else:
        r_pad = _round_up(hw, TILE_PX)
        pix2row = jnp.arange(hw, dtype=jnp.int32)
        row_active = jnp.pad(active, (0, r_pad - hw))
    return active, r_pad, pix2row, row_active


def _meas_weights(e, inlier, pm_pix, active, row_of_meas, r_pad, cfg, dt):
    """Per-measurement LHS weight wA and RHS residual weight we
    (IRLS-aware, model.cpp:599-617), with compaction-overflow drop count."""
    w = inlier & active[pm_pix]
    if cfg.compact_cap is not None:
        # Measurements on active pixels beyond the compaction cap must drop
        # from EVERY block (not just the map blocks their scatter overflows
        # past), or the normal equations turn asymmetric when the adaptive
        # cap is transiently undersized. Count them — no silent truncation.
        in_row = row_of_meas < r_pad
        # sum promotes to int64 under x64; keep the counter int32
        dropped = jnp.sum(w & ~in_row, dtype=jnp.int32)
        w = w & in_row
    else:
        dropped = jnp.zeros((), jnp.int32)
    yi = irls_weights(e, cfg)
    wA = jnp.where(w, yi, 0.0).astype(dt)  # weight for LHS terms
    we = wA * e  # reweighted residual for RHS terms
    return wA, we, dropped


def _pallas_accumulate(
    row_of_meas, i_c, i_p, Jc, Jp, dx, dy, e, wA, we, r_pad, dim_pose, order,
    carry=None,
):
    """One Pallas sorted-accumulation pass (kernels/a12_accum.py) over a
    measurement set; returns the kernel's raw (A12, px5, a11b) outputs.
    Streamed callers pass the previous chunk's outputs as ``carry`` — the
    kernel accumulates INTO them in place (input_output_aliases), so
    chaining costs no extra buffers. All derived per-measurement quantities
    (sqrt(w)-scaled Jacobians, the five per-pixel accumulants) are built
    inside the kernel's prepass — only the raw linearization enters (``we``
    is unused; the kernel derives it from e and wA)."""
    del we
    from .kernels.a12_accum import a12_accumulate

    return a12_accumulate(
        row_of_meas, i_c, i_p, Jc, Jp, dx, dy, e, wA, r_pad, dim_pose, order,
        carry=carry,
    )


def _finish_from_pallas(
    A12, px5, a11b, row_active, pix2row, active, Gx, Gy, cfg, r_pad, dt,
    dropped, reg_scale, dim_pose,
):
    dp_pad = _round_up(dim_pose, 128)
    A11 = a11b[:dim_pose, :dim_pose]
    b1 = a11b[dp_pad, :dim_pose]
    a22xx, a22xy, a22yy = px5[:, 0], px5[:, 1], px5[:, 2]
    b2x, b2y = px5[:, 3], px5[:, 4]
    return _finish_normal_eq(
        A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12, row_active, pix2row,
        active, Gx, Gy, cfg, r_pad, dt, dropped, reg_scale,
    )


def _xla_carry0(dim_pose, r_pad, dt):
    dp_pad = _round_up(dim_pose, 128)
    return (
        jnp.zeros((dim_pose, dim_pose), dt),
        jnp.zeros((dim_pose,), dt),
        jnp.zeros((r_pad,), dt),
        jnp.zeros((r_pad,), dt),
        jnp.zeros((r_pad,), dt),
        jnp.zeros((r_pad,), dt),
        jnp.zeros((r_pad,), dt),
        jnp.zeros((r_pad * 2 * dp_pad,), dt),
    )


def _xla_accumulate(
    carry, wA, we, i_c, i_p, Jc, Jp, dx, dy, row_of_meas, cfg, dim_pose,
    r_pad, dt,
):
    """XLA-scatter accumulation scan (the CPU / f64 fallback producer):
    one-hot row expansion + GEMM for A11/b1, 1-D per-pixel scatter-adds for
    A22/b2/A12, CHUNK measurements at a time. Chainable: pass the previous
    carry to accumulate across streamed chunks."""
    d = cfg.dim_block
    order = cfg.spline_order
    dp_pad = _round_up(dim_pose, 128)
    n = wA.shape[0]
    n_chunks = -(-n // CHUNK)
    pad = n_chunks * CHUNK - n
    wA_c = _pad_to_chunks(wA, pad).reshape(n_chunks, CHUNK)
    we_c = _pad_to_chunks(we, pad).reshape(n_chunks, CHUNK)
    ic_c = _pad_to_chunks(i_c, pad).reshape(n_chunks, CHUNK)
    ip_c = _pad_to_chunks(i_p, pad).reshape(n_chunks, CHUNK)
    Jc_c = jnp.moveaxis(
        jnp.pad(Jc, [(0, 0), (0, pad)]).reshape(d, n_chunks, CHUNK), 1, 0
    )
    Jp_c = jnp.moveaxis(
        jnp.pad(Jp, [(0, 0), (0, pad)]).reshape(d, n_chunks, CHUNK), 1, 0
    )
    dx_c = _pad_to_chunks(dx, pad).reshape(n_chunks, CHUNK)
    dy_c = _pad_to_chunks(dy, pad).reshape(n_chunks, CHUNK)
    # padded tail rows go out of range -> dropped by scatter mode="drop"
    pix_c = _pad_to_chunks(row_of_meas, pad, value=r_pad).reshape(n_chunks, CHUNK)

    def chunk_body(carry, inp):
        A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12 = carry
        wAk, wek, ick, ipk, Jck, Jpk, dxk, dyk, pixk = inp

        # rows: (CHUNK, 3K) measurement rows by one-hot knot placement of the
        # curr/prev half-Jacobians. Built directly in 2-D (a (CHUNK, K, 3)
        # intermediate would tile-pad 3 -> 128); the sum of broadcast
        # compares fuses into a single VPU loop.
        knot_of_col = jnp.arange(dim_pose, dtype=jnp.int32) // 3  # (3K,)
        comp_of_col = jnp.arange(dim_pose, dtype=jnp.int32) % 3
        rows = jnp.zeros((CHUNK, dim_pose), dt)
        for j in range(order):
            for comp in range(3):
                colmask_base = comp_of_col[None, :] == comp
                oc = colmask_base & (knot_of_col[None, :] == ick[:, None] + j)
                op = colmask_base & (knot_of_col[None, :] == ipk[:, None] + j)
                rows = rows + oc.astype(dt) * Jck[3 * j + comp][:, None]
                rows = rows + op.astype(dt) * Jpk[3 * j + comp][:, None]

        # A11 += rows^T diag(wA) rows; b1 += rows^T (wA e)   (MXU)
        wrows = rows * wAk[:, None]
        A11 = A11 + jnp.dot(rows.T, wrows, preferred_element_type=dt)
        b1 = b1 + rows.T @ wek

        # A22 / b2: 1-D per-pixel scatter adds.
        a22xx = a22xx.at[pixk].add(wAk * dxk * dxk, mode="drop")
        a22xy = a22xy.at[pixk].add(wAk * dxk * dyk, mode="drop")
        a22yy = a22yy.at[pixk].add(wAk * dyk * dyk, mode="drop")
        b2x = b2x.at[pixk].add(wek * dxk, mode="drop")
        b2y = b2y.at[pixk].add(wek * dyk, mode="drop")

        # A12 fallback: one fused flat scatter in (HW_pad, 2*dp_pad) index
        # space: idx = pix*(2*dp_pad) + plane*dp_pad + (3*seg + j).
        idx_list = []
        val_list = []
        rowbase = pixk * (2 * dp_pad)
        for seg, Jh in ((ick, Jck), (ipk, Jpk)):
            colbase = 3 * seg  # (CHUNK,)
            for j in range(d):
                idx_list.append(rowbase + colbase + j)
                val_list.append(wAk * Jh[j] * dxk)
                idx_list.append(rowbase + dp_pad + colbase + j)
                val_list.append(wAk * Jh[j] * dyk)
        idx = jnp.stack(idx_list).reshape(-1)
        vals = jnp.stack(val_list).reshape(-1)
        A12 = A12.at[idx].add(vals, mode="drop")

        return (A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12), None

    carry, _ = jax.lax.scan(
        chunk_body,
        carry,
        (wA_c, we_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, pix_c),
    )
    return carry


@jax.jit
def prev_records(dev: DeviceWindow):
    """State-independent PREV-event records: ``(prev_bearings (3, N),
    prev_bids (N,))`` gathered by ``dev.prev_idx`` ONCE per window.

    Prevs are scattered, so this gather pulls a whole (8, 128) tile per
    element — but bearings and batch ids never change across LM iterations,
    so doing it once and handing the result to the streamed passes (which
    then read contiguous chunk slices) removes a random gather from every
    chunk of every objective/forming pass of every iteration. Costs
    16 B/event of extra residency (1 GB at 64M events).

    The bearings come back FLAT (3N,) — row-major [x row | y row | z row] —
    not (3, N): a (3, N) f32 intermediate living across the fused LM
    while_loop gets a transposed remat/compression copy from XLA whose
    (8,128) tiling pads the 3-dim to 128 (42.7x -> 8 GB at 16M events, a
    compile-time OOM); a 1-D buffer cannot be transpose-padded. The chunk
    fns accept either layout."""
    pb = jnp.take(dev.bearings, dev.prev_idx, axis=1)
    pbid = jnp.take(dev.batch_ids, dev.prev_idx)
    return pb.reshape(-1), pbid


def _make_stream_chunk_fn(
    knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig, need_deriv: bool,
    prev_bearings=None, prev_bids=None,
):
    """Shared chunk-recompute core of the streamed passes: pads the window
    to a chunk multiple, builds the per-batch pose tables once, and returns
    ``(n, n_chunks, pieces)`` where ``pieces(c)`` re-runs warp + pairing +
    residual (+ Jacobians when ``need_deriv``) for chunk ``c`` from scratch
    — bit-identical to :func:`linearize_from_warp` via the shared
    ``_pair_residual`` core, holding no O(N) linearization arrays.

    ``prev_bearings`` (3, N) / ``prev_bids`` (N,) optionally supply each
    measurement's PREV-event bearing and batch id directly instead of the
    ``dev.prev_idx`` gather — the sharded window resolves cross-shard prevs
    through its halo exchange once (they are state-independent) and passes
    them here, so the streamed passes compose with event sharding.
    """
    dt = Gx.dtype
    order = cfg.spline_order
    sc = cfg.stream_chunk
    n = dev.pol_signed.shape[0]
    n_chunks = -(-n // sc)

    # per-batch pose tables once (NB-sized), reused by every chunk
    R_b, J_b = warp.spline_tables(knots, dev.batch_s, dev.batch_u, order,
                                  need_deriv)
    # One stacked (2|5, HW) map plane: values (+ second-order gradients when
    # linearizing) share each chunk's pm_pix gather (one tile fetch per
    # element instead of two).
    gmaps = _stacked_gmaps(Gx, Gy, need_deriv)

    # Chunk inputs are CONTIGUOUS slices: pad every per-event array once to
    # a chunk multiple so the loop body runs plain dynamic_slices instead of
    # clamped gathers (a real cost at 10^7-10^8 events). The prev-event
    # bearings keep a random gather (prevs are scattered), but the prev
    # batch id rides the same gather as a bitcast f32 row (4 rows = 1 tile).
    pad = n_chunks * sc - n

    # ``pad`` is static: when the window was built pre-padded to a chunk
    # multiple (DeviceWindow.from_window(..., pad_multiple=stream_chunk)),
    # every branch below is an alias and the program holds NO padded copies
    # — at 64M events the pad copies alone were ~2 GB of while-loop-resident
    # temps, a real bite out of the single-chip HBM budget.
    def pad1(a, v=0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),), constant_values=v)

    pol_pd = pad1(dev.pol_signed)
    hp_pd = pad1(dev.has_prev, False)
    have_prev_src = prev_bearings is not None
    if have_prev_src:
        # normalize prev bearings to FLAT (3 * n_pad,) row-major — a (3, N)
        # f32 intermediate living across the fused LM while_loop draws a
        # transposed remat copy padded 42.7x (see prev_records); the sharded
        # halo path still hands (3, nl)
        pb_flat = (
            prev_bearings.reshape(-1)
            if prev_bearings.ndim == 2
            else prev_bearings
        )
        if pad:
            pb_flat = (
                jnp.pad(pb_flat.reshape(3, n), ((0, 0), (0, pad)))
                .at[2, n:].set(1.0)
                .reshape(-1)
            )
        pbid_pd = pad1(prev_bids)
        n_pd = n + pad
    else:
        prev_pd = pad1(dev.prev_idx)
    bid_pd = pad1(dev.batch_ids)
    # pad with a unit bearing (z=1): an all-zero bearing makes the warp
    # produce NaN (0/0), which survives the zero measurement weight
    bear_pd = (
        dev.bearings if pad == 0
        else jnp.pad(dev.bearings, ((0, 0), (0, pad))).at[2, n:].set(1.0)
    )
    merge_prev = dt == jnp.float32 and not have_prev_src
    if merge_prev:
        # Batch ids ride the bearing gather as bitcast f32 — but raw small
        # int32 bit patterns are f32 DENORMALS, which the TPU flushes to
        # zero inside the fused concat+gather (measured: every prev batch id
        # < 2^23 came back 0, collapsing the pairing to the window start).
        # Bias by 0x40000000 (exponent 0x80): all ids < 2^23 bitcast to
        # normal floats in [2, 4), which survive any FTZ pass bit-exactly.
        prev_src = jnp.concatenate(
            [
                dev.bearings,
                jax.lax.bitcast_convert_type(
                    dev.batch_ids + _BID_BIAS, jnp.float32
                )[None, :],
            ],
            axis=0,
        )  # (4, N)

    def pieces(c):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, c * sc, sc, axis=-1)

        # recompute the chunk linearization: curr warp + prev re-warp
        pm_c, ic_c, dpm_c = warp.warp_from_tables(
            R_b, J_b, dev.batch_s, sl(bid_pd), sl(bear_pd).astype(dt),
            cfg.pano, order, need_deriv,
        )
        if have_prev_src:  # pre-resolved prevs: contiguous flat-row slices
            # a TUPLE of rows, not a stacked (3, sc) array: the stack
            # materializes a per-chunk copy XLA does not fuse away
            b_p = tuple(
                jax.lax.dynamic_slice_in_dim(
                    pb_flat, k * n_pd + c * sc, sc
                ).astype(dt)
                for k in range(3)
            )
            bid_p = sl(pbid_pd)
        elif merge_prev:
            prev_c = sl(prev_pd)
            prev_g = jnp.take(prev_src, prev_c, axis=1)  # (4, sc)
            bid_p = (
                jax.lax.bitcast_convert_type(prev_g[3], jnp.int32) - _BID_BIAS
            )
            b_p = prev_g[:3]
        else:  # f64 (CPU / oracle parity): no 32-bit bitcast packing
            prev_c = sl(prev_pd)
            bid_p = jnp.take(dev.batch_ids, prev_c)
            b_p = jnp.take(dev.bearings, prev_c, axis=1)
        pm_p, ip_c, dpm_p = warp.warp_from_tables(
            R_b, J_b, dev.batch_s, bid_p, b_p, cfg.pano, order, need_deriv,
        )
        # residual core shared with linearize_from_warp (bit-identical)
        dx_c, dy_c, inl_c, pmp_c, g_at, e_c = _pair_residual(
            pm_c[0], pm_c[1], pm_p[0], pm_p[1], sl(hp_pd), sl(pol_pd),
            gmaps, cfg,
        )
        if not need_deriv:
            return e_c, inl_c, pmp_c, ic_c, ip_c, dx_c, dy_c
        # temp = Gpm + dp^T G2pm (model.cpp:238); Jp = -Gpm . dpm_prev
        # (:459), or the symmetric midpoint halves (ModelConfig.sample_mode)
        tx, ty, hx, hy = _pose_jac_coeffs(g_at, dx_c, dy_c, cfg)
        Jc_c = tx[None, :] * dpm_c[0] + ty[None, :] * dpm_c[1]
        Jp_c = hx[None, :] * dpm_p[0] + hy[None, :] * dpm_p[1]
        return e_c, inl_c, pmp_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c

    return n, n_chunks, pieces


def _make_stream_chunk_fn_light(
    lin: Linearization, knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    prev_bearings, prev_bids,
):
    """Resident-LIGHT streamed forming core (the fast tier of two-tier
    streaming): the (N,)-sized linearization fields (residual, inlier,
    pairing displacement, pixel/segment ids) stay RESIDENT from the
    objective pass; only the (D, N) Jacobians — the O(D*N) memory hog — are
    recomputed per chunk from the per-batch pose tables (reference Jacobian
    math model.cpp:238-241, 449, 459). One warp per event side per chunk
    and NO pairing/residual recompute, which is what makes this tier faster
    than the zero-residency one. ``prev_bearings``/``prev_bids`` are
    required (the once-per-window :func:`prev_records`, or the sharded
    halo resolution). Returns ``(n, n_chunks, pieces)`` with the same
    9-tuple ``pieces(c)`` contract as :func:`_make_stream_chunk_fn`."""
    dt = Gx.dtype
    order = cfg.spline_order
    sc = cfg.stream_chunk
    n = lin.e.shape[0]
    n_chunks = -(-n // sc)
    pad = n_chunks * sc - n

    if prev_bearings is None:  # derive once (callers usually hoist this)
        prev_bearings, prev_bids = prev_records(dev)
    R_b, J_b = warp.spline_tables(knots, dev.batch_s, dev.batch_u, order,
                                  True)
    gmaps = _stacked_gmaps(Gx, Gy, True)  # (5, HW): values + 2nd-order grads

    def pad1(a, v=0):
        if pad == 0:
            return a
        return jnp.pad(a, ((0, pad),), constant_values=v)

    def padb(b):  # unit-z bearing padding (zero bearings warp to NaN)
        if pad == 0:
            return b
        return jnp.pad(b, ((0, 0), (0, pad))).at[2, n:].set(1.0)

    e_pd, inl_pd = pad1(lin.e), pad1(lin.inlier, False)
    pmp_pd = pad1(lin.pm_pix)
    dx_pd, dy_pd = pad1(lin.dx), pad1(lin.dy)
    ic_pd, ip_pd = pad1(lin.i_c), pad1(lin.i_p)
    bid_pd = pad1(dev.batch_ids)
    bear_pd = padb(dev.bearings)
    # prev bearings FLAT (3 * n_pd,) — see prev_records / the full chunk fn
    # (a (3, N) intermediate across the fused while_loop draws a transposed
    # remat copy padded 42.7x); sharded halo still hands (3, nl)
    pb_flat = (
        prev_bearings.reshape(-1)
        if prev_bearings.ndim == 2
        else prev_bearings
    )
    if pad:
        pb_flat = (
            jnp.pad(pb_flat.reshape(3, n), ((0, 0), (0, pad)))
            .at[2, n:].set(1.0)
            .reshape(-1)
        )
    pbid_pd = pad1(prev_bids)
    n_pd = n + pad

    def pieces(c):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, c * sc, sc, axis=-1)

        # tuple of flat-row slices (a stacked (3, sc) copy would materialize)
        pb_c = tuple(
            jax.lax.dynamic_slice_in_dim(
                pb_flat, k * n_pd + c * sc, sc
            ).astype(dt)
            for k in range(3)
        )
        # Jacobian-only recompute: curr warp + prev re-warp
        _, _, dpm_c = warp.warp_from_tables(
            R_b, J_b, dev.batch_s, sl(bid_pd), sl(bear_pd).astype(dt),
            cfg.pano, order, True,
        )
        _, _, dpm_p = warp.warp_from_tables(
            R_b, J_b, dev.batch_s, sl(pbid_pd), pb_c,
            cfg.pano, order, True,
        )
        e_c, inl_c, pmp_c = sl(e_pd), sl(inl_pd), sl(pmp_pd)
        dx_c, dy_c = sl(dx_pd), sl(dy_pd)
        g_at = jnp.take(gmaps, pmp_c, axis=1)  # one fused (5, sc) gather
        # temp = Gpm + dp^T G2pm (model.cpp:238); Jp = -Gpm . dpm_prev
        # (:459), or the symmetric midpoint halves (ModelConfig.sample_mode)
        tx, ty, hx, hy = _pose_jac_coeffs(g_at, dx_c, dy_c, cfg)
        Jc_c = tx[None, :] * dpm_c[0] + ty[None, :] * dpm_c[1]
        Jp_c = hx[None, :] * dpm_p[0] + hy[None, :] * dpm_p[1]
        return e_c, inl_c, pmp_c, sl(ic_pd), sl(ip_pd), Jc_c, Jp_c, dx_c, dy_c

    return n, n_chunks, pieces


@partial(jax.jit, static_argnames=("cfg",))
def cost_and_activity_streamed(
    knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    prev_bearings=None, prev_bids=None,
):
    """Chunk-streamed objective evaluation (reference
    ``LEGM::evaluateDataError`` + the cost sum, model.cpp:72-258, 279-314):
    returns ``(cost_data, num_ev_map)`` without materializing ANY O(N)
    linearization array — the streamed counterpart of
    ``linearize(..., need_deriv=False)`` + ``data_cost``. Together with
    :func:`form_normal_eq_streamed` this makes the whole LM iteration O(N)
    only in the window data itself (10^7-10^8-event windows, SURVEY.md §6).
    """
    dt = Gx.dtype
    _, n_chunks, pieces = _make_stream_chunk_fn(
        knots, Gx, Gy, dev, cfg, False, prev_bearings, prev_bids
    )

    def body(c, carry):
        cost, nem = carry
        e_c, inl_c, pmp_c = pieces(c)[:3]
        nem = nem.at[pmp_c].add(inl_c.astype(jnp.int32), mode="drop")
        return cost + data_cost(e_c, cfg), nem

    init = (jnp.zeros((), dt), jnp.zeros((cfg.num_pix,), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


@partial(jax.jit, static_argnames=("cfg",))
def map_only_step(
    knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    prev_bearings=None, prev_bids=None,
):
    """One map-only solve step with the trajectory FIXED: the production
    high-resolution path. The reference's 4K outputs are maps rendered from
    1K-refined trajectories (poster: 240x180 events -> 4096x2048 maps; no
    4K trajectory RMSE is published) — with the pose frozen the residual
    ``e = pol C_th - G(pm).dp`` (model.cpp:194-221) is AFFINE in G, so the
    map block decouples into per-pixel 2x2 systems ``(A22 + alpha I) x2 =
    b2 - alpha G`` (the same blocks formNormalEq builds, model.cpp:421-447,
    + applyL2Reg, :689-719) and one closed-form solve is the exact
    quadratic-cost minimizer. No A11/A12 exist, so memory is O(HW + chunk)
    at ANY pano resolution — the full 8.4M-pixel 4K grid solves without
    active-pixel compaction (the joint path's dense A12 over a 2^21-row
    compacted domain alone is 6.4 GB).

    Requires ``cfg.stream_chunk`` (events are chunk-streamed; two passes:
    activity+cost, then the masked A22/b2 accumulation). With
    ``cfg.use_irls`` the weights are evaluated at the INPUT map (one IRLS
    step per call; iterate via :func:`solve_map_only`). Returns
    ``(Gx', Gy', cost_data, num_ev_map)`` with the reference's updateMap
    semantics (inactive pixels reset to zero, model.cpp:863-903).
    """
    dt = Gx.dtype
    hw = cfg.num_pix
    _, n_chunks, pieces = _make_stream_chunk_fn(
        knots, Gx, Gy, dev, cfg, False, prev_bearings, prev_bids
    )

    # pass 1: event-count activity map + data cost (pose fixed -> the
    # inlier mask and pairing displacements are state-independent here)
    def body_nem(c, carry):
        cost, nem = carry
        e_c, inl_c, pmp_c = pieces(c)[:3]
        nem = nem.at[pmp_c].add(inl_c.astype(jnp.int32), mode="drop")
        return cost + data_cost(e_c, cfg), nem

    cost0, nem = jax.lax.fori_loop(
        0, n_chunks, body_nem, (jnp.zeros((), dt), jnp.zeros((hw,), jnp.int32))
    )
    active = nem >= cfg.thres_valid_pixel

    # pass 2: per-pixel 2x2 blocks + rhs, active-masked (model.cpp:421-447)
    def body_acc(c, carry):
        a22xx, a22xy, a22yy, b2x, b2y = carry
        e_c, inl_c, pmp_c, _ic, _ip, dx_c, dy_c = pieces(c)
        w = inl_c & active[pmp_c]
        wA = jnp.where(w, irls_weights(e_c, cfg), 0.0).astype(dt)
        we = wA * e_c
        a22xx = a22xx.at[pmp_c].add(wA * dx_c * dx_c, mode="drop")
        a22xy = a22xy.at[pmp_c].add(wA * dx_c * dy_c, mode="drop")
        a22yy = a22yy.at[pmp_c].add(wA * dy_c * dy_c, mode="drop")
        b2x = b2x.at[pmp_c].add(we * dx_c, mode="drop")
        b2y = b2y.at[pmp_c].add(we * dy_c, mode="drop")
        return a22xx, a22xy, a22yy, b2x, b2y

    z = jnp.zeros((hw,), dt)
    a22xx, a22xy, a22yy, b2x, b2y = jax.lax.fori_loop(
        0, n_chunks, body_acc, (z, z, z, z, z)
    )

    # L2 regularizer on active pixels (applyL2Reg) + closed-form 2x2 solve
    af = active.astype(dt)
    alpha = jnp.asarray(cfg.alpha, dt)
    gx_f, gy_f = Gx.reshape(-1).astype(dt), Gy.reshape(-1).astype(dt)
    a = a22xx + alpha * af
    b = a22xy
    d = a22yy + alpha * af
    rx = b2x - alpha * gx_f * af
    ry = b2y - alpha * gy_f * af
    det = a * d - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    ok = (active & (jnp.abs(det) >= 1e-30)).astype(dt) / det_safe
    x2x = (d * rx - b * ry) * ok
    x2y = (a * ry - b * rx) * ok
    gx_new = jnp.where(active, gx_f + x2x, 0.0).reshape(Gx.shape)
    gy_new = jnp.where(active, gy_f + x2y, 0.0).reshape(Gy.shape)
    return gx_new, gy_new, cost0, nem


def solve_map_only(
    knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig, num_iters: int = 1,
    prev_bearings=None, prev_bids=None,
):
    """Solve the map from a FIXED trajectory (reference production 4K path;
    see :func:`map_only_step`). One iteration is exact for the quadratic
    cost; pass ``num_iters > 1`` to refresh IRLS weights between solves.
    Returns ``(Gx, Gy, costs)`` where ``costs`` has ``num_iters + 1``
    data-cost evaluations (the last one measured at the final map)."""
    if cfg.stream_chunk is None:
        cfg = dataclasses.replace(cfg, stream_chunk=1 << 20)
    if cfg.compact_cap is not None:
        # rows ARE pixels here; compaction has nothing to compact
        cfg = dataclasses.replace(cfg, compact_cap=None)
    if prev_bearings is None:
        # state-independent: gather once, reuse across every pass
        prev_bearings, prev_bids = prev_records(dev)
    costs = []
    for _ in range(num_iters):
        Gx, Gy, cost, _nem = map_only_step(
            knots, Gx, Gy, dev, cfg, prev_bearings, prev_bids
        )
        costs.append(float(cost))
    _gx, _gy, cost, _nem = map_only_step(
        knots, Gx, Gy, dev, cfg, prev_bearings, prev_bids
    )
    costs.append(float(cost))
    return Gx, Gy, costs


@partial(jax.jit, static_argnames=("cfg",))
def linearize_streamed_light(
    knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    prev_bearings=None, prev_bids=None,
):
    """Chunk-streamed LIGHT linearization + cost: the objective pass of the
    light streaming tier. Produces the same (N,)-resident light
    :class:`Linearization` as ``linearize(..., need_deriv=False)`` —
    bit-identical via the shared ``_pair_residual`` core — but computed in
    ``cfg.stream_chunk`` slices, which runs ~2x faster at 10^7 events than
    the one-pass version (the one-pass round-trips every (N,)-sized
    intermediate through HBM; the chunked loop keeps them cache-resident and
    only writes the seven retained fields). Returns ``(lin, cost_data)``.
    """
    dt = Gx.dtype
    sc = cfg.stream_chunk
    n = dev.pol_signed.shape[0]
    _, n_chunks, pieces = _make_stream_chunk_fn(
        knots, Gx, Gy, dev, cfg, False, prev_bearings, prev_bids
    )
    n_pad = n_chunks * sc

    def body(c, carry):
        cost, nem, e, inl, pmp, ic, ip, dx, dy = carry
        e_c, inl_c, pmp_c, ic_c, ip_c, dx_c, dy_c = pieces(c)

        def upd(a, v):
            return jax.lax.dynamic_update_slice_in_dim(a, v, c * sc, 0)

        nem = nem.at[pmp_c].add(inl_c.astype(jnp.int32), mode="drop")
        return (
            cost + data_cost(e_c, cfg), nem, upd(e, e_c), upd(inl, inl_c),
            upd(pmp, pmp_c), upd(ic, ic_c), upd(ip, ip_c), upd(dx, dx_c),
            upd(dy, dy_c),
        )

    init = (
        jnp.zeros((), dt),
        jnp.zeros((cfg.num_pix,), jnp.int32),
        jnp.zeros((n_pad,), dt),
        jnp.zeros((n_pad,), bool),
        jnp.zeros((n_pad,), jnp.int32),
        jnp.zeros((n_pad,), jnp.int32),
        jnp.zeros((n_pad,), jnp.int32),
        jnp.zeros((n_pad,), dt),
        jnp.zeros((n_pad,), dt),
    )
    cost, nem, e, inl, pmp, ic, ip, dx, dy = jax.lax.fori_loop(
        0, n_chunks, body, init
    )
    zeros_d = jnp.zeros((cfg.dim_block, 0), dt)
    lin = Linearization(
        e=e[:n], inlier=inl[:n], pm_pix=pmp[:n], num_ev_map=nem,
        dx=dx[:n], dy=dy[:n], Jc=zeros_d, Jp=zeros_d, i_c=ic[:n], i_p=ip[:n],
    )
    return lin, cost


@partial(jax.jit, static_argnames=("cfg", "num_knots"))
def form_normal_eq_streamed(
    aux, knots, Gx, Gy, dev: DeviceWindow, cfg: ModelConfig,
    num_knots: int, reg_scale=None, prev_bearings=None, prev_bids=None,
) -> NormalEq:
    """Streamed normal-equation forming for reference-scale windows
    (10^7-10^8 events, SURVEY.md §6): identical math to
    :func:`form_normal_eq`, but the WHOLE per-measurement linearization
    (warp, pairing displacement, residual, Jacobians) is RECOMPUTED in
    chunks of ``cfg.stream_chunk`` events inside the accumulation loop
    instead of being held resident. ``aux`` is the forming input from the
    objective pass of the state being formed — the (HW,) global
    inlier-count map (from :func:`cost_and_activity_streamed`) in the FULL
    tier, or the light :class:`Linearization` (``linearize(...,
    need_deriv=False)``) in the LIGHT tier (``cfg.stream_light``), whose
    resident (N,) fields skip the per-chunk residual recompute (see
    :func:`_make_stream_chunk_fn_light`). In the full tier the only
    event-sized residents are the window plus ONE set of accumulators (the
    Pallas producer chains chunks through aliased in-place accumulation).

    Per chunk: gather the chunk's (and its prev events') bearings/batch ids,
    re-run the warp + residual chain from the per-batch pose tables
    (computed once; residual core shared bit-identically with
    ``linearize_from_warp``), rebuild Jc/Jp (reference model.cpp:238-241,
    449, 459), and accumulate into the same Pallas / XLA producers. The
    extra work over the classic path is one extra warp per measurement (the
    prev re-warp) — cheap next to the accumulation GEMMs — in exchange for
    O(1) instead of O(D*N) resident bytes.
    """
    dt = Gx.dtype
    order = cfg.spline_order
    dim_pose = 3 * num_knots
    dp_pad = _round_up(dim_pose, 128)

    if cfg.stream_light:
        num_ev_map = aux.num_ev_map
        _, n_chunks, pieces = _make_stream_chunk_fn_light(
            aux, knots, Gx, Gy, dev, cfg, prev_bearings, prev_bids
        )
    else:
        num_ev_map = aux
        _, n_chunks, pieces = _make_stream_chunk_fn(
            knots, Gx, Gy, dev, cfg, True, prev_bearings, prev_bids
        )
    active, r_pad, pix2row, row_active = _row_space(num_ev_map, cfg)

    def chunk_pieces(c):
        e_c, inl_c, pmp_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c = pieces(c)
        row_c = pmp_c if cfg.compact_cap is None else pix2row[pmp_c]
        wA_c, we_c, drop_c = _meas_weights(
            e_c, inl_c, pmp_c, active, row_c, r_pad, cfg, dt
        )
        return wA_c, we_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, row_c, e_c, drop_c

    if cfg.use_pallas and dt == jnp.float32:

        def body(c, carry):
            a12, px5, a11b, dropped = carry
            (wA_c, we_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, row_c, e_c,
             drop_c) = chunk_pieces(c)
            # chain through the kernel's aliased in-place accumulation: ONE
            # accumulator set total, no per-chunk full-size output + add
            a12, px5, a11b = _pallas_accumulate(
                row_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, e_c, wA_c, we_c,
                r_pad, dim_pose, order, carry=(a12, px5, a11b),
            )
            return (a12, px5, a11b, dropped + drop_c)

        init = (
            jnp.zeros((r_pad, 2 * dp_pad), jnp.float32),
            jnp.zeros((r_pad, 8), jnp.float32),
            jnp.zeros((dp_pad + 8, dp_pad), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        a12, px5, a11b, dropped = jax.lax.fori_loop(0, n_chunks, body, init)
        return _finish_from_pallas(
            a12, px5, a11b, row_active, pix2row, active, Gx, Gy, cfg, r_pad,
            dt, dropped, reg_scale, dim_pose,
        )

    def body(c, carry):
        acc, dropped = carry
        (wA_c, we_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, row_c, _e_c,
         drop_c) = chunk_pieces(c)
        acc = _xla_accumulate(
            acc, wA_c, we_c, ic_c, ip_c, Jc_c, Jp_c, dx_c, dy_c, row_c, cfg,
            dim_pose, r_pad, dt,
        )
        return (acc, dropped + drop_c)

    init = (_xla_carry0(dim_pose, r_pad, dt), jnp.zeros((), jnp.int32))
    (A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12), dropped = jax.lax.fori_loop(
        0, n_chunks, body, init
    )
    A12 = A12.reshape(r_pad, 2 * dp_pad)
    return _finish_normal_eq(
        A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12, row_active, pix2row,
        active, Gx, Gy, cfg, r_pad, dt, dropped, reg_scale,
    )


def _finish_normal_eq(
    A11, b1, a22xx, a22xy, a22yy, b2x, b2y, A12, row_active, pix2row,
    active_pix, Gx, Gy, cfg, r_pad, dt, dropped, reg_scale=None,
):
    """Apply the L2 map regularizer on active rows (reference
    ``applyL2Reg``, model.cpp:689-719) and assemble the NormalEq."""
    alpha = jnp.asarray(cfg.alpha, dt)
    if reg_scale is not None:
        alpha = alpha * reg_scale.astype(dt)
    act_f = row_active.astype(dt)
    # G values gathered into row space (active pixels only; dropped rows 0)
    gsel = jnp.where(active_pix, Gx.reshape(-1).astype(dt), 0.0)
    gx_row = jnp.zeros((r_pad,), dt).at[pix2row].add(gsel, mode="drop")
    gsel = jnp.where(active_pix, Gy.reshape(-1).astype(dt), 0.0)
    gy_row = jnp.zeros((r_pad,), dt).at[pix2row].add(gsel, mode="drop")
    a22xx = a22xx + alpha * act_f
    a22yy = a22yy + alpha * act_f
    b2x = b2x - alpha * gx_row * act_f
    b2y = b2y - alpha * gy_row * act_f

    return NormalEq(
        A11=A11,
        b1=b1,
        a22_xx=a22xx,
        a22_xy=a22xy,
        a22_yy=a22yy,
        b2_x=b2x,
        b2_y=b2y,
        A12=A12,
        active=row_active,
        pix2row=pix2row,
        active_pix=active_pix,
        active_count=jnp.sum(active_pix.astype(jnp.int32)),
        dropped=dropped,
    )


# ---------------------------------------------------------------------------
# Solving (reference solveNormalEq, model.cpp:721-792).
# ---------------------------------------------------------------------------


def _damped_a22_inv(neq: NormalEq, lam):
    """Per-pixel inverse of the LM-damped 2x2 blocks; zero where inactive
    (inactive pixels are excluded from the system, matching the reference's
    compaction). A22m = A22 + lam * diag(A22) (model.cpp:747-750)."""
    dt = neq.a22_xx.dtype
    a = neq.a22_xx * (1.0 + lam)
    b = neq.a22_xy
    c = neq.a22_yy * (1.0 + lam)
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    mask = (neq.active & (jnp.abs(det) >= 1e-30)).astype(dt)
    inv = mask / det_safe
    return c * inv, -b * inv, a * inv  # m00, m01, m11 (each (HW,))


@partial(jax.jit, static_argnames=("fix_first",))
def solve_normal_eq(neq: NormalEq, lam, fix_first: bool = False):
    """Schur-complement solve (reference model.cpp:721-792):

      A11m = A11 + lam diag(A11);  A22m^-1 per 2x2 block (batched);
      S = A11m - A12 A22m^-1 A12^T  (two MXU GEMMs over the column planes);
      x1 = chol_solve(S, b1 - A12 A22m^-1 b2);
      x2 = A22m^-1 (b2 - A12^T x1).

    ``fix_first`` gauge-fixes the first control pose by masking its rows and
    columns (the TPU-shaped equivalent of the reference's row deletion,
    solver.cpp:156-165)."""
    dt = neq.b1.dtype
    dim = neq.b1.shape[0]
    dp_pad = neq.A12.shape[1] // 2
    A11, b1 = neq.A11, neq.b1
    Ae = neq.A12[:, :dp_pad]  # (HW_pad, dp_pad) Gx plane (pixel rows)
    Ao = neq.A12[:, dp_pad:]
    # column mask: padded pose columns (>= dim) and optionally the first pose
    col_lo = 3 if fix_first else 0
    colmask = (
        (jnp.arange(dp_pad) >= col_lo) & (jnp.arange(dp_pad) < dim)
    ).astype(dt)
    if fix_first:
        m = (jnp.arange(dim) >= 3).astype(dt)
        A11 = A11 * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b1 = b1 * m
    Ae = Ae * colmask[None, :]
    Ao = Ao * colmask[None, :]

    A11m = A11 + lam * jnp.diag(jnp.diag(A11))
    m00, m01, m11 = _damped_a22_inv(neq, lam)

    # Z = A22m^-1 applied to the A12 planes (row-wise 2x2).
    Ze = Ae * m00[:, None] + Ao * m01[:, None]
    Zo = Ae * m01[:, None] + Ao * m11[:, None]
    S_red = jax.lax.dot_general(
        Ae, Ze, (((0,), (0,)), ((), ())), preferred_element_type=dt
    ) + jax.lax.dot_general(Ao, Zo, (((0,), (0,)), ((), ())), preferred_element_type=dt)
    S = A11m - S_red[:dim, :dim]

    ib2x = m00 * neq.b2_x + m01 * neq.b2_y
    ib2y = m01 * neq.b2_x + m11 * neq.b2_y
    rhs = b1 - (ib2x @ Ae + ib2y @ Ao)[:dim]

    # Keep S factorizable when some knots are unobserved (zero rows — e.g.
    # sparse windows): their b1 is zero, so with a tiny diagonal floor the
    # corresponding increments solve to zero instead of NaN.
    eps = 1e-10 * jnp.maximum(jnp.max(jnp.diag(S)), 1.0) + 1e-30
    S = S + eps * jnp.eye(dim, dtype=dt)

    chol, lower = jax.scipy.linalg.cho_factor(S)
    x1 = jax.scipy.linalg.cho_solve((chol, lower), rhs)

    x1_pad = jnp.zeros((dp_pad,), dt).at[:dim].set(x1)
    vx = neq.b2_x - Ae @ x1_pad
    vy = neq.b2_y - Ao @ x1_pad
    x2x = m00 * vx + m01 * vy
    x2y = m01 * vx + m11 * vy
    return x1, jnp.stack([x2x, x2y], axis=0)  # (3K,), (2, HW_pad)


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
    dp_pad = neq.A12.shape[1] // 2
    A11, b1 = neq.A11, neq.b1
    Ae = neq.A12[:, :dp_pad]  # (HW_pad, dp_pad)
    Ao = neq.A12[:, dp_pad:]
    col_lo = 3 if fix_first else 0
    colmask = (
        (jnp.arange(dp_pad) >= col_lo) & (jnp.arange(dp_pad) < dim)
    ).astype(dt)
    if fix_first:
        m = (jnp.arange(dim) >= 3).astype(dt)
        A11 = A11 * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b1 = b1 * m
    Ae = Ae * colmask[None, :]
    Ao = Ao * colmask[None, :]

    A11m = A11 + lam * jnp.diag(jnp.diag(A11))
    axx = neq.a22_xx * (1.0 + lam)
    axy = neq.a22_xy
    ayy = neq.a22_yy * (1.0 + lam)
    act = neq.active.astype(dt)

    def matvec(x1, x2x, x2y):
        x1_pad = jnp.zeros((dp_pad,), dt).at[:dim].set(x1)
        y1 = A11m @ x1 + (x2x @ Ae + x2y @ Ao)[:dim]
        a22x = axx * x2x + axy * x2y
        a22y = axy * x2x + ayy * x2y
        # inactive pixels: identity row (their rhs is zero -> stay zero)
        y2x = Ae @ x1_pad + jnp.where(neq.active, a22x, x2x)
        y2y = Ao @ x1_pad + jnp.where(neq.active, a22y, x2y)
        return y1, y2x, y2y

    b2x = neq.b2_x * act
    b2y = neq.b2_y * act
    bnorm2 = jnp.sum(b1 * b1) + jnp.sum(b2x * b2x) + jnp.sum(b2y * b2y)

    # Block-Jacobi preconditioner: exact A11m (one small Cholesky, reused
    # every iteration) and exact per-pixel 2x2 A22m blocks. The reference's
    # plain Eigen CG (model.cpp:827-833) routinely exhausts its 100
    # iterations on this badly-scaled system; the block preconditioner is
    # the TPU-shaped fix (one 3Kx3K triangular solve + elementwise 2x2) and
    # changes only the iteration path, not the solution.
    eps11 = 1e-10 * jnp.maximum(jnp.max(jnp.diag(A11m)), 1.0) + 1e-30
    chol11 = jax.scipy.linalg.cho_factor(
        A11m + eps11 * jnp.eye(dim, dtype=dt)
    )
    det22 = axx * ayy - axy * axy
    det22_safe = jnp.where(jnp.abs(det22) < 1e-30, 1.0, det22)
    inv_ok = neq.active & (jnp.abs(det22) >= 1e-30)
    i00 = jnp.where(inv_ok, ayy / det22_safe, 1.0)
    i01 = jnp.where(inv_ok, -axy / det22_safe, 0.0)
    i11 = jnp.where(inv_ok, axx / det22_safe, 1.0)

    def precond(r1, r2x, r2y):
        z1 = jax.scipy.linalg.cho_solve(chol11, r1)
        return z1, i00 * r2x + i01 * r2y, i01 * r2x + i11 * r2y

    def body(state):
        x1, x2x, x2y, r1, r2x, r2y, p1, p2x, p2y, rz, rs, it = state
        ap1, ap2x, ap2y = matvec(p1, p2x, p2y)
        denom = jnp.sum(p1 * ap1) + jnp.sum(p2x * ap2x) + jnp.sum(p2y * ap2y)
        alpha_ = rz / (denom + 1e-300)
        x1, x2x, x2y = x1 + alpha_ * p1, x2x + alpha_ * p2x, x2y + alpha_ * p2y
        r1, r2x, r2y = r1 - alpha_ * ap1, r2x - alpha_ * ap2x, r2y - alpha_ * ap2y
        z1, z2x, z2y = precond(r1, r2x, r2y)
        rz_new = jnp.sum(r1 * z1) + jnp.sum(r2x * z2x) + jnp.sum(r2y * z2y)
        rs_new = jnp.sum(r1 * r1) + jnp.sum(r2x * r2x) + jnp.sum(r2y * r2y)
        beta = rz_new / (rz + 1e-300)
        return (
            x1, x2x, x2y, r1, r2x, r2y,
            z1 + beta * p1, z2x + beta * p2x, z2y + beta * p2y,
            rz_new, rs_new, it + 1,
        )

    def cond(state):
        *_, rs, it = state
        return (it < max_iter) & (rs > tol * tol * bnorm2)

    z1 = jnp.zeros_like(b1)
    zx = jnp.zeros_like(b2x)
    pz1, pz2x, pz2y = precond(b1, b2x, b2y)
    rz0 = jnp.sum(b1 * pz1) + jnp.sum(b2x * pz2x) + jnp.sum(b2y * pz2y)
    state = (
        z1, zx, zx, b1, b2x, b2y, pz1, pz2x, pz2y, rz0, bnorm2, jnp.asarray(0)
    )
    x1, x2x, x2y, *_, rs, it = jax.lax.while_loop(cond, body, state)
    return (
        x1,
        jnp.stack([x2x * act, x2y * act], axis=0),
        it,
        jnp.sqrt(rs / jnp.maximum(bnorm2, 1e-300)),
    )


@jax.jit
def update_map(Gx, Gy, x2, damping, neq: NormalEq):
    """Apply the map increment: active pixels ``G += damping * x2``; inactive
    pixels reset to zero (reference ``updateMap``, model.cpp:863-903).
    ``x2`` lives in row space (2, R_pad); ``neq.pix2row`` maps pixels to
    rows (dropped/overflowed pixels get no increment but are still zeroed
    when inactive)."""
    shape = Gx.shape
    r_pad = x2.shape[1]
    rows = jnp.minimum(neq.pix2row, r_pad - 1)
    valid = (neq.pix2row < r_pad) & neq.active_pix
    act = neq.active_pix.reshape(shape)
    dxp = jnp.where(valid, x2[0, rows], 0.0).reshape(shape)
    dyp = jnp.where(valid, x2[1, rows], 0.0).reshape(shape)
    gx = jnp.where(act, Gx + damping * dxp, 0.0)
    gy = jnp.where(act, Gy + damping * dyp, 0.0)
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
