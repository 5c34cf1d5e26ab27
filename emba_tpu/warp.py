"""Batched event->panorama warping with chained analytic Jacobians.

TPU-native replacement for the reference's per-event warp loop (HOT LOOP #1,
reference ``src/emba/model.cpp:102-172`` + ``src/utils/event_pano_warper.cpp:43-74``):

* one spline evaluation per event *batch* (the reference shares a pose across
  batches of ``event_batch_size`` events, ``model.cpp:78,116-136``) — NB =
  N/100 evaluations instead of N,
* per-event work in fully flat (N,) component arrays: XLA TPU tiles the
  trailing two dims of every materialized tensor to (8, 128), so (N, 3, 3)
  rotation-matrix layouts would pad 57x (19 GB at 4M events). Rotation and
  Jacobian components are gathered from the small per-batch tensors as
  individual (N,) vectors and all products are expanded scalarly (VPU).

Left-perturbation convention throughout: ``d rb / d eps = -hat(rb)``
(reference: ``event_pano_warper.cpp:62``), chained with the spline knot
Jacobian ``d pm / d cp = (d pm / d rb)(d rb / d rot)(d rot / d cp)``
(reference ``model.cpp:155-157``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import spline
from .camera import EquirectangularCamera


def spline_tables(knots, batch_s, batch_u, order: int, need_jacobian: bool = True):
    """Per-batch pose tables: one spline evaluation per event batch
    (NB = N/100 evaluations; the expensive exp/log chain happens here once —
    the streamed forming pass reuses these tables across event chunks).

    Returns (R_b (NB, 3, 3), J_b (NB, order, 3, 3) or None).
    """
    if need_jacobian:
        return spline.evaluate(knots, batch_s, batch_u, order, True)
    return spline.evaluate(knots, batch_s, batch_u, order, False), None


def warp_events(
    knots,
    batch_s,
    batch_u,
    batch_ids,
    bearings,
    pano: EquirectangularCamera,
    order: int,
    need_jacobian: bool = True,
):
    """Warp all events of a window onto the panorama.

    Args:
      knots: (K, 3, 3) spline control poses.
      batch_s: (NB,) int32 spline segment per event batch.
      batch_u: (NB,) normalized offset per batch (batch mid-time).
      batch_ids: (N,) int32 event -> batch index.
      bearings: (3, N) per-event unit bearing vectors (transposed layout).
      pano: equirectangular camera.
      order: spline order (static).
      need_jacobian: compute d pm / d knot-perturbations.

    Returns:
      pm: tuple (pmx (N,), pmy (N,)) warped positions.
      cp_idx: (N,) int32 first involved control-pose index.
      dpm_dcp: (2, 3*order, N) Jacobian w.r.t. the stacked left-perturbations
        of knots [cp_idx, cp_idx + order) — or None.
    """
    R_b, J_b = spline_tables(knots, batch_s, batch_u, order, need_jacobian)
    return warp_from_tables(
        R_b, J_b, batch_s, batch_ids, bearings, pano, order, need_jacobian
    )


def warp_from_tables(
    R_b,
    J_b,
    batch_s,
    batch_ids,
    bearings,
    pano: EquirectangularCamera,
    order: int,
    need_jacobian: bool = True,
):
    """Per-event warp given precomputed per-batch pose tables (the second
    stage of :func:`warp_events`; callable on any event subset — the
    streamed forming pass calls it per chunk)."""

    # Gather rotation components as (9, N) in ONE gather (no (N,3,3)
    # tensors; single fused take instead of 9 separate gathers).
    R9 = jnp.take(
        jnp.moveaxis(R_b.reshape(-1, 9), -1, 0), batch_ids, axis=1
    )  # (9, N)
    # ``bearings`` may be a (3, N) array or a 3-tuple of (N,) rows — the
    # streamed chunk fns hand separate flat-row slices to avoid
    # materializing a stacked per-chunk copy
    bx, by, bz = bearings[0], bearings[1], bearings[2]
    R = [[R9[3 * i + j] for j in range(3)] for i in range(3)]
    x = R[0][0] * bx + R[0][1] * by + R[0][2] * bz
    y = R[1][0] * bx + R[1][1] * by + R[1][2] * bz
    z = R[2][0] * bx + R[2][1] * by + R[2][2] * bz

    dtype = bx.dtype
    rho2 = x * x + y * y + z * z
    rho = jnp.sqrt(rho2)
    fx = jnp.asarray(pano.fx, dtype)
    fy = jnp.asarray(pano.fy, dtype)
    pmx = pano.width / 2.0 + jnp.arctan2(x, z) * fx
    y_div_rho = jnp.clip(y / rho, -1.0, 1.0)
    pmy = pano.height / 2.0 + jnp.arcsin(y_div_rho) * fy

    cp_idx = batch_s[batch_ids]
    if not need_jacobian:
        return (pmx, pmy), cp_idx, None

    # Equirect projection Jacobian rows (camera.EquirectangularCamera.project
    # math, on flat vectors; z-axis / pole safe).
    xz2 = x * x + z * z
    xz2_safe = jnp.where(xz2 < 1e-24, jnp.ones_like(xz2), xz2)
    j00 = fx * z / xz2_safe
    j02 = -fx * x / xz2_safe
    one_m_w2 = jnp.maximum(1.0 - y_div_rho * y_div_rho, 1e-12)
    inv_sq = 1.0 / jnp.sqrt(one_m_w2)
    tmp3 = y_div_rho / rho2
    j10 = fy * inv_sq * (-tmp3 * x)
    j11 = fy * inv_sq * (1.0 / rho - tmp3 * y)
    j12 = fy * inv_sq * (-tmp3 * z)

    # dpm_drot = Jproj @ (-hat(rb)); -hat rows: [0, z, -y], [-z, 0, x], [y, -x, 0]
    p00 = j02 * y
    p01 = j00 * z - j02 * x
    p02 = -j00 * y
    p10 = -j11 * z + j12 * y
    p11 = j10 * z - j12 * x
    p12 = -j10 * y + j11 * x
    prow = ((p00, p01, p02), (p10, p11, p12))

    # Chain with the spline knot Jacobians: J_b (NB, order, 3, 3) with
    # J_b[b, o, k, j] = d(rot)_k / d(knot o pert)_j. One fused gather to
    # (order*9, N), then expand dpm_dcp[r, 3o+j] = sum_k prow[r][k]*J[o][k][j].
    Jg = jnp.take(
        jnp.moveaxis(J_b.reshape(-1, order * 9), -1, 0), batch_ids, axis=1
    )  # (order*9, N)
    rows = []
    for r in range(2):
        for o in range(order):
            for j in range(3):
                acc = None
                for k in range(3):
                    term = Jg[9 * o + 3 * k + j] * prow[r][k]
                    acc = term if acc is None else acc + term
                rows.append(acc)
    dpm_dcp = jnp.stack(rows).reshape(2, 3 * order, x.shape[0])
    return (pmx, pmy), cp_idx, dpm_dcp
