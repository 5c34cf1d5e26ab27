"""Batched event->panorama warping with chained analytic Jacobians.

TPU-native replacement for the reference's per-event warp loop (HOT LOOP #1,
reference ``src/emba/model.cpp:102-172`` + ``src/utils/event_pano_warper.cpp:43-74``):

* one spline evaluation per event *batch* (the reference shares a pose across
  batches of ``event_batch_size`` events, ``model.cpp:78,116-136``),
* a dense gather of precomputed bearing vectors,
* a single fused rotate + equirectangular-project + Jacobian-chain over all
  events (vmapped jnp; everything lands on the VPU/MXU).

Left-perturbation convention throughout: ``d rb / d eps = -hat(rb)``
(reference: ``event_pano_warper.cpp:62``), chained with the spline knot
Jacobian ``d pm / d cp = (d pm / d rb)(d rb / d rot)(d rot / d cp)``
(reference ``model.cpp:155-157``).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie, spline
from .camera import EquirectangularCamera


def warp_events(
    knots,
    s,
    u,
    bearings,
    pano: EquirectangularCamera,
    order: int,
    need_jacobian: bool = True,
):
    """Warp all events of a window onto the panorama.

    Args:
      knots: (K, 3, 3) spline control poses.
      s: (N,) int32 spline segment index per EVENT (events in the same
        reference batch carry identical (s, u) — pose sharing is encoded in
        the values, keeping the computation embarrassingly parallel and
        shardable along the event axis).
      u: (N,) normalized offset per event (its batch mid-time).
      bearings: (N, 3) per-event bearing vectors (LUT-gathered; unit norm).
      pano: equirectangular camera.
      order: spline order (static).
      need_jacobian: compute d pm / d knot-perturbations.

    Returns:
      pm: (N, 2) warped positions.
      cp_idx: (N,) int32 first involved control-pose index (== s).
      dpm_dcp: (N, 2, 3*order) Jacobian w.r.t. the stacked left-perturbations
        of knots [cp_idx, cp_idx + order) — or None.
    """
    if need_jacobian:
        R_ev, J_ev = spline.evaluate(knots, s, u, order, True)
    else:
        R_ev = spline.evaluate(knots, s, u, order, False)

    rb = jnp.einsum("nij,nj->ni", R_ev, bearings)

    if not need_jacobian:
        pm = pano.project(rb, need_jacobian=False)
        return pm, s, None

    pm, dpm_drb = pano.project(rb, need_jacobian=True)  # (N,2), (N,2,3)
    drb_drot = -lie.hat(rb)  # (N, 3, 3): left perturbation
    dpm_drot = jnp.einsum("nij,njk->nik", dpm_drb, drb_drot)  # (N, 2, 3)
    # chain with the spline knot Jacobians: (N, 2, order*3)
    dpm_dcp = jnp.einsum("nij,nojk->niok", dpm_drot, J_ev).reshape(
        pm.shape[0], 2, 3 * order
    )
    return pm, s, dpm_dcp
