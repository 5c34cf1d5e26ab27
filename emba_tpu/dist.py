"""Multi-chip scaling: mesh construction, sharded BA step, multi-host init.

The reference is single-process single-threaded (SURVEY.md §2.3); this layer
is designed fresh for TPU:

* mesh axes ``("ev", "tile")`` — events (the "sequence"/data axis) sharded
  over ``ev``; the panorama pixel domain (A12/A22/b2/x2, the tensor-parallel
  axis) sharded over ``tile``; the pose system (A11, S, x1: ~300 x 300)
  replicated,
* the distributed Gauss-Newton reduction is expressed through GSPMD: inputs
  carry ``NamedSharding``s and intermediate constraints
  (``with_sharding_constraint``) steer XLA to insert the psum /
  reduce-scatter / all-gather collectives over ICI,
* multi-host entry via ``jax.distributed.initialize``.

Mapping to classic strategies (BASELINE.json north star): DP/SP = ``ev``
axis (time-segmented event stream; the spline-segment locality keeps A11
near-block-diagonal and psum-cheap); TP = ``tile`` axis over the map;
PP = pipelining successive sliding windows (host-level, see pipeline.py).
"""

from __future__ import annotations


from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import model as M


def make_mesh(num_ev: int | None = None, num_tile: int = 1, devices=None) -> Mesh:
    """Build a ("ev", "tile") device mesh. Defaults to all devices on the
    event axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_ev is None:
        num_ev = len(devices) // num_tile
    devices = devices[: num_ev * num_tile].reshape(num_ev, num_tile)
    return Mesh(devices, ("ev", "tile"))


def init_multihost(coordinator: str | None = None, **kw) -> None:
    """Initialize cross-host communication (reference has none; this is the
    jax.distributed replacement for an MPI/NCCL bootstrap)."""
    jax.distributed.initialize(coordinator_address=coordinator, **kw)


def pad_window(win_dev: M.DeviceWindow, multiple: int) -> M.DeviceWindow:
    """Pad event arrays to a multiple of the event-shard count. Padded events
    are masked out via ``has_prev=False`` (they produce no measurements)."""
    n = win_dev.pol_signed.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return win_dev

    def pad_arr(a, value=0):
        widths = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, widths, constant_values=value)

    return M.DeviceWindow(
        bearings=pad_arr(win_dev.bearings).at[2, n:].set(1.0),
        pol_signed=pad_arr(win_dev.pol_signed),
        prev_idx=pad_arr(win_dev.prev_idx),
        has_prev=pad_arr(win_dev.has_prev, value=False),
        batch_ids=pad_arr(win_dev.batch_ids),  # padded events -> batch 0
        batch_s=win_dev.batch_s,
        batch_u=win_dev.batch_u,
    )


def shard_window(win_dev: M.DeviceWindow, mesh: Mesh) -> M.DeviceWindow:
    """Place the window on the mesh: per-event arrays sharded over ``ev``
    (the event axis is the LAST axis of every field); the small per-batch
    pose tables replicated."""
    win_dev = pad_window(win_dev, mesh.shape["ev"])
    ev = NamedSharding(mesh, P("ev"))
    rep = NamedSharding(mesh, P())
    return M.DeviceWindow(
        bearings=jax.device_put(win_dev.bearings, NamedSharding(mesh, P(None, "ev"))),
        pol_signed=jax.device_put(win_dev.pol_signed, ev),
        prev_idx=jax.device_put(win_dev.prev_idx, ev),
        has_prev=jax.device_put(win_dev.has_prev, ev),
        batch_ids=jax.device_put(win_dev.batch_ids, ev),
        batch_s=jax.device_put(win_dev.batch_s, rep),
        batch_u=jax.device_put(win_dev.batch_u, rep),
    )


def replicate(mesh: Mesh, *arrays):
    """Place arrays replicated on the mesh."""
    sh = NamedSharding(mesh, P())
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def _constrain(mesh: Mesh, lin: M.Linearization) -> M.Linearization:
    """Keep per-measurement arrays sharded over the event axis (which is the
    LAST axis of every per-event field)."""
    ev = NamedSharding(mesh, P("ev"))

    def c(a, spec=None):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, spec) if spec is not None else ev
        )

    return M.Linearization(
        e=c(lin.e),
        inlier=c(lin.inlier),
        pm_pix=c(lin.pm_pix),
        num_ev_map=c(lin.num_ev_map, P()),
        dx=c(lin.dx),
        dy=c(lin.dy),
        Jc=c(lin.Jc, P(None, "ev")),
        Jp=c(lin.Jp, P(None, "ev")),
        i_c=c(lin.i_c),
        i_p=c(lin.i_p),
    )


def _constrain_neq(mesh: Mesh, neq: M.NormalEq) -> M.NormalEq:
    """Shard the map-domain normal-equation blocks over ``tile``; pose blocks
    replicated (they are tiny). A12 is left to XLA's choice (its flat layout
    interleaves pose and pixel dims)."""

    def c(a, spec):
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return M.NormalEq(
        A11=c(neq.A11, P()),
        b1=c(neq.b1, P()),
        a22_xx=c(neq.a22_xx, P("tile")),
        a22_xy=c(neq.a22_xy, P("tile")),
        a22_yy=c(neq.a22_yy, P("tile")),
        b2_x=c(neq.b2_x, P("tile")),
        b2_y=c(neq.b2_y, P("tile")),
        A12=c(neq.A12, P("tile", None)),  # pixel rows sharded over tiles
        active=c(neq.active, P("tile")),
        pix2row=neq.pix2row,
        active_pix=neq.active_pix,
        active_count=neq.active_count,
        dropped=neq.dropped,
    )


def make_sharded_step(mesh: Mesh, cfg: M.ModelConfig, num_knots: int, fix_first: bool):
    """Build the jitted full BA step (linearize -> normal eq -> Schur solve ->
    state update -> trial cost) with GSPMD shardings over the mesh.

    Returns step(knots, Gx, Gy, dev_win, lam) ->
      (knots_new, Gx_new, Gy_new, cost_new, lin_new-cost-pieces).

    The Pallas A12 kernel is single-device; the sharded step always uses the
    XLA path (GSPMD partitions it automatically).
    """
    import dataclasses as _dc

    cfg = _dc.replace(cfg, use_pallas=False, compact_cap=None)

    @partial(jax.jit, static_argnames=())
    def step(knots, Gx, Gy, dev_win: M.DeviceWindow, lam):
        lin = _constrain(mesh, M.linearize(knots, Gx, Gy, dev_win, cfg, True))
        neq = _constrain_neq(mesh, M.form_normal_eq(lin, Gx, Gy, cfg, num_knots))
        x1, x2 = M.solve_normal_eq(neq, lam, fix_first)
        knots_new = M.update_knots(knots, x1, fix_first)
        gx_new, gy_new = M.update_map(Gx, Gy, x2, 1.0, neq)
        lin_new = M.linearize(knots_new, gx_new, gy_new, dev_win, cfg, True)
        cost_new = M.data_cost(lin_new.e, cfg) + M.reg_cost(
            gx_new, gy_new, cfg.alpha
        )
        cost_old = M.data_cost(lin.e, cfg) + M.reg_cost(Gx, Gy, cfg.alpha)
        return knots_new, gx_new, gy_new, cost_old, cost_new

    return step


# ---------------------------------------------------------------------------
# Explicit shard_map distributed Gauss-Newton reduction.
# ---------------------------------------------------------------------------


def make_shardmap_normal_eq(mesh: Mesh, cfg: M.ModelConfig, num_knots: int):
    """Explicit-collective variant of the normal-equation build: events are
    sharded over the ``ev`` axis; each shard linearizes its events locally
    and the reduction is spelled out as collectives (SURVEY.md §2.3):

      * the global inlier-count map (active-pixel votes) is ``psum`` over
        ``ev`` (the one cross-shard coupling BEFORE weighting: a pixel's
        activity depends on events from every shard),
      * the small pose block (A11, b1 — a few hundred KB) is ``psum`` over
        ``ev``: the distributed Gauss-Newton tree reduction,
      * the map-domain blocks (A12 / A22 / b2) are ``psum`` over ``ev`` then
        kept sharded over ``tile`` (pixel rows) — the reduce-scatter shape:
        per-tile solves never leave their device.

    The per-shard prev-event gather is local: the caller must shard events
    so each pair (prev, curr) lives in one shard — `shard_window` keeps the
    time-contiguous layout, and cross-shard pairs are masked out by clipping
    ``prev_idx`` into the shard (a <0.1% measurement loss at realistic shard
    counts; the GSPMD path in `make_sharded_step` keeps them exactly).

    Returns fn(knots, Gx, Gy, dev_win) -> NormalEq (A12 left ev-replicated,
    tile-sharded by constraint).
    """
    try:
        from jax import shard_map as _sm  # jax >= 0.8 (check_vma kwarg)

        def shard_map(f, mesh, in_specs, out_specs):
            return _sm(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
    except ImportError:
        from functools import partial as _pt

        from jax.experimental.shard_map import shard_map as _sm

        shard_map = _pt(_sm, check_rep=False)
    import dataclasses as _dc0

    # Compaction stays off (pix2row must be pixel-identity so the post-psum
    # tile slicing lines up), but the Pallas A12 kernel is shard-local and
    # composes with shard_map: each shard sorts/accumulates its own events,
    # the psum reduction after is unchanged.
    cfg = _dc0.replace(cfg, compact_cap=None)
    n_ev = mesh.shape["ev"]

    def per_shard(knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev,
                  batch_ids, batch_s, batch_u):
        n_local = pol_signed.shape[0]
        shard = jax.lax.axis_index("ev")
        # remap global prev indices into this shard; pairs that cross the
        # shard boundary are dropped (masked).
        base = shard * n_local
        local_prev = prev_idx - base
        in_shard = (local_prev >= 0) & (local_prev < n_local)
        dev_local = M.DeviceWindow(
            bearings=bearings,
            pol_signed=pol_signed,
            prev_idx=jnp.clip(local_prev, 0, n_local - 1),
            has_prev=has_prev & in_shard,
            batch_ids=batch_ids,
            batch_s=batch_s,
            batch_u=batch_u,
        )
        lin = M.linearize(knots, Gx, Gy, dev_local, cfg, True)
        # global activity: psum of per-shard inlier counts (collective #1)
        import dataclasses as _dc

        lin = _dc.replace(lin, num_ev_map=jax.lax.psum(lin.num_ev_map, "ev"))
        neq = M.form_normal_eq(lin, Gx, Gy, cfg, num_knots)

        # distributed GN reduction (collectives #2, #3): pose block psum'd
        # (replicated result); map-domain blocks summed over events and kept
        # sharded by pano tile — each device emits its tile's row slice (on
        # real hardware this psum+slice is a reduce-scatter over ICI).
        tile = jax.lax.axis_index("tile")
        n_tile = jax.lax.axis_size("tile")
        rows = neq.a22_xx.shape[0] // n_tile

        def tile_slice(x):
            s = jax.lax.psum(x, "ev")
            return jax.lax.dynamic_slice_in_dim(s, tile * rows, rows, axis=0)

        return M.NormalEq(
            A11=jax.lax.psum(neq.A11, "ev"),
            b1=jax.lax.psum(neq.b1, "ev"),
            a22_xx=tile_slice(neq.a22_xx),
            a22_xy=tile_slice(neq.a22_xy),
            a22_yy=tile_slice(neq.a22_yy),
            b2_x=tile_slice(neq.b2_x),
            b2_y=tile_slice(neq.b2_y),
            A12=tile_slice(neq.A12),
            active=jax.lax.dynamic_slice_in_dim(
                neq.active, tile * rows, rows, axis=0
            ),
            pix2row=neq.pix2row,
            active_pix=neq.active_pix,
            # activity is global (num_ev_map was psum'd); dropped is per-shard
            active_count=neq.active_count,
            dropped=jax.lax.psum(neq.dropped, "ev"),
        )

    ev_spec = P("ev")
    shardfn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),  # knots, Gx, Gy replicated
            P(None, "ev"), ev_spec, ev_spec, ev_spec, ev_spec, P(), P(),
        ),
        out_specs=M.NormalEq(
            A11=P(), b1=P(),
            a22_xx=P("tile"), a22_xy=P("tile"), a22_yy=P("tile"),
            b2_x=P("tile"), b2_y=P("tile"),
            A12=P("tile", None), active=P("tile"),
            pix2row=P(), active_pix=P(), active_count=P(), dropped=P(),
        ),
    )

    @jax.jit
    def fn(knots, Gx, Gy, dev_win: M.DeviceWindow):
        neq = shardfn(
            knots, Gx, Gy, dev_win.bearings, dev_win.pol_signed,
            dev_win.prev_idx, dev_win.has_prev, dev_win.batch_ids,
            dev_win.batch_s, dev_win.batch_u,
        )
        # The L2 regularizer was added once per event shard inside
        # form_normal_eq and then psum'd: remove the duplicate (n_ev - 1)
        # contributions (reference semantics: applied exactly once,
        # model.cpp:689-719).
        if n_ev > 1:
            dtp = neq.b1.dtype
            alpha = jnp.asarray(cfg.alpha * (n_ev - 1), dtp)
            act = neq.active.astype(dtp)
            hw = cfg.num_pix
            hw_pad = neq.a22_xx.shape[0]
            gx_pad = jnp.pad(Gx.reshape(-1), (0, hw_pad - hw)).astype(dtp)
            gy_pad = jnp.pad(Gy.reshape(-1), (0, hw_pad - hw)).astype(dtp)
            import dataclasses as _dc

            neq = _dc.replace(
                neq,
                a22_xx=neq.a22_xx - alpha * act,
                a22_yy=neq.a22_yy - alpha * act,
                b2_x=neq.b2_x + alpha * act * gx_pad,
                b2_y=neq.b2_y + alpha * act * gy_pad,
            )
        return neq

    return fn
