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
        sensor_pix=(
            None if win_dev.sensor_pix is None else pad_arr(win_dev.sensor_pix)
        ),
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
        sensor_pix=(
            None
            if win_dev.sensor_pix is None
            else jax.device_put(win_dev.sensor_pix, ev)
        ),
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
    """VALIDATION-ONLY GSPMD path — not the production multi-chip entry.

    Build the jitted full BA step (linearize -> normal eq -> Schur solve ->
    state update -> trial cost) with GSPMD shardings over the mesh: inputs
    carry ``NamedSharding``s and ``with_sharding_constraint`` steers XLA's
    partitioner. Its value is cross-checking the explicit shard_map layer —
    two independent distribution mechanisms must agree bit-for-bit
    (``tests/test_dist.py``) — and exercising the compiler-driven route in
    ``dryrun_multichip``.

    It is NOT wired into the pipeline and is NOT performance-representative:
    the Pallas A12 kernel is a single-device program GSPMD cannot
    auto-partition, so THIS builder always uses the (~4x slower) XLA scatter
    producer. Production multi-chip runs go through
    ``make_solve_window_sharded`` / ``solve_window_sharded_host``, which run
    the kernel shard-locally under ``shard_map``. Active-pixel compaction
    (``cfg.compact_cap``) is honored: the compact row space is a global
    cumsum over the psum'd activity map, which GSPMD partitions like any
    other op.

    Returns step(knots, Gx, Gy, dev_win, lam) ->
      (knots_new, Gx_new, Gy_new, cost_old, cost_new).
    """
    import dataclasses as _dc

    cfg = _dc.replace(cfg, use_pallas=False)

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
# Explicit shard_map layer: exact cross-shard pairing (halo exchange),
# distributed Gauss-Newton reduction, and the full sharded LM window.
# ---------------------------------------------------------------------------


def _shard_map(f, mesh, in_specs, out_specs):
    """Version-compat shard_map (jax >= 0.8 `check_vma`, older `check_rep`)."""
    try:
        from jax import shard_map as _sm  # jax >= 0.8

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def shard_window_all(win_dev: M.DeviceWindow, mesh: Mesh) -> M.DeviceWindow:
    """Place the window with events sharded over ALL mesh devices (the
    combined ("ev", "tile") axis): the sharded LM window treats the whole
    mesh as one data-parallel axis for linearize/forming and as the map-row
    split for the Schur reduction."""
    n_dev = mesh.shape["ev"] * mesh.shape["tile"]
    win_dev = pad_window(win_dev, n_dev)
    ev = NamedSharding(mesh, P(("ev", "tile")))
    rep = NamedSharding(mesh, P())
    return M.DeviceWindow(
        bearings=jax.device_put(
            win_dev.bearings, NamedSharding(mesh, P(None, ("ev", "tile")))
        ),
        pol_signed=jax.device_put(win_dev.pol_signed, ev),
        prev_idx=jax.device_put(win_dev.prev_idx, ev),
        has_prev=jax.device_put(win_dev.has_prev, ev),
        batch_ids=jax.device_put(win_dev.batch_ids, ev),
        batch_s=jax.device_put(win_dev.batch_s, rep),
        batch_u=jax.device_put(win_dev.batch_u, rep),
        sensor_pix=jax.device_put(win_dev.sensor_pix, ev),
    )


def _linearize_sharded(
    knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev, batch_ids,
    batch_s, batch_u, spix, cfg: M.ModelConfig, num_sensor_pix: int,
    axes, n_shards: int, my, need_deriv: bool, return_prev_src: bool = False,
):
    """Shard-local linearization with EXACT cross-shard pairing.

    Returns ``(lin, prev_src)``. With ``return_prev_src`` the halo also
    ships each boundary record's BEARING and BATCH ID (state-independent),
    and ``prev_src = (prev_bearings (3, nl), prev_bids (nl,))`` resolves
    every local measurement's prev-event inputs — what the streamed forming
    pass needs to recompute prev Jacobians shard-locally
    (``model.form_normal_eq_streamed``); otherwise ``prev_src`` is None.

    The reference pairs consecutive events per sensor pixel with no regard
    to any partitioning (model.cpp:179-246). Under time-contiguous event
    sharding, only the FIRST local event at a sensor pixel can have its prev
    in an earlier shard; that prev is the LAST event at the pixel in the
    greatest earlier shard that saw the pixel. The halo exchange therefore
    ships one record per sensor pixel — the shard's last event's warped
    position, knot Jacobian, and segment index — and folds earlier shards'
    records into a per-pixel "latest prev" via a log-depth ppermute prefix
    scan (SURVEY.md §2.3's collective-permute plan, generalized to
    arbitrary-distance prevs). Per-device payload: (3 + 2D) floats x
    num_sensor_pix per ppermute round, ceil(log2(n_shards)) rounds —
    independent of BOTH the event count and the shard count (an EVK4
    1280x720 sensor at order 2 is ~26 MB/round; 64 shards = 6 rounds).
    """
    pm, cp_idx, dpm = M.warp.warp_events(
        knots, batch_s, batch_u, batch_ids, bearings, cfg.pano,
        cfg.spline_order, need_jacobian=need_deriv,
    )
    pmx, pmy = pm
    d = cfg.dim_block
    nl = pmx.shape[0]
    base = my * nl
    local_prev = prev_idx - base
    in_shard = (local_prev >= 0) & (local_prev < nl)
    lp = jnp.clip(local_prev, 0, nl - 1)

    # -- halo export: this shard's LAST event per sensor pixel --------------
    last = jnp.full((num_sensor_pix,), -1, jnp.int32).at[spix].max(
        jnp.arange(nl, dtype=jnp.int32)
    )
    valid = last >= 0
    li = jnp.maximum(last, 0)
    feats = [pmx[li][None, :], pmy[li][None, :]]
    if need_deriv:
        feats.append(jnp.take(dpm.reshape(2 * d, nl), li, axis=1))
    boff = len(feats) if not need_deriv else 2 + 2 * d  # bearing row offset
    if return_prev_src:
        feats.append(jnp.take(bearings, li, axis=1).astype(pmx.dtype))
    export = jnp.where(valid[None, :], jnp.concatenate(feats, axis=0), 0.0)
    exp_i = jnp.where(valid, cp_idx[li], 0)
    if return_prev_src:  # batch id rides the same int all_gather
        exp_i = jnp.stack([exp_i, jnp.where(valid, batch_ids[li], 0)])

    # -- exclusive prefix fold: latest valid EARLIER shard wins per pixel ---
    # Log-depth ppermute doubling scan (Hillis-Steele) instead of an
    # all_gather + O(n_shards) where-chain: the all_gather materialized a
    # (n_shards, F, P) table per device (~3.8 GB at an EVK4 sensor x 64
    # shards) and folded it sequentially; here the per-device payload stays
    # O(F x num_sensor_pix) — independent of the shard count — and the fold
    # is ceil(log2(n_shards)) ppermute rounds riding ICI neighbors. The
    # combine is a SELECTION ("later range wins where it has a record", an
    # associative op), so the result is bit-identical to the sequential
    # fold. Shards that receive nothing get ppermute's zero fill, i.e.
    # valid=False — exactly the "no earlier record" state.
    def shift(x, d):
        return jax.lax.ppermute(
            x, axes, [(s, s + d) for s in range(n_shards - d)]
        )

    vi = exp_i if return_prev_src else exp_i[None]  # int rows, uniform 2-D
    # exclusive: start from the immediate predecessor's export
    acc_f, acc_i, acc_v = shift(export, 1), shift(vi, 1), shift(valid, 1)
    cov = 1  # acc covers the `cov` shards immediately before this one
    while cov < n_shards - 1:
        r_f, r_i, r_v = shift(acc_f, cov), shift(acc_i, cov), shift(acc_v, cov)
        acc_f = jnp.where(acc_v[None, :], acc_f, r_f)
        acc_i = jnp.where(acc_v[None, :], acc_i, r_i)
        acc_v = acc_v | r_v
        cov *= 2
    # never-seen pixels keep a unit bearing (z=1): an all-zero bearing makes
    # the prev re-warp produce NaN, which survives the zero weight
    init = jnp.zeros_like(export)
    if return_prev_src:
        init = init.at[boff + 2].set(1.0)
    sel = jnp.where(acc_v[None, :], acc_f, init)
    sel_i2 = jnp.where(acc_v[None, :], acc_i, 0)
    sel_i = sel_i2 if return_prev_src else sel_i2[0]

    # -- per-event prev data: local gather or halo lookup -------------------
    halo = jnp.take(sel, spix, axis=1)  # (F, nl)
    halo_i = (sel_i[0] if return_prev_src else sel_i)[spix]
    pm_prev_loc = jnp.take(jnp.stack([pmx, pmy]), lp, axis=1)
    pm_prev = jnp.where(in_shard[None, :], pm_prev_loc, halo[:2])
    if need_deriv:
        dpm_prev_loc = jnp.take(dpm.reshape(2 * d, nl), lp, axis=1)
        dpm_prev = jnp.where(
            in_shard[None, :], dpm_prev_loc, halo[2:boff]
        ).reshape(2, d, nl)
    else:
        dpm_prev = None
    i_p = jnp.where(in_shard, cp_idx[lp], halo_i)
    prev_src = None
    if return_prev_src:
        prev_bear = jnp.where(
            in_shard[None, :], jnp.take(bearings, lp, axis=1), halo[boff:]
        )
        prev_bid = jnp.where(in_shard, batch_ids[lp], sel_i[1][spix])
        prev_src = (prev_bear, prev_bid)

    lin = M.linearize_from_warp(
        pmx, pmy, cp_idx, dpm, pm_prev, dpm_prev, i_p, has_prev, pol_signed,
        Gx, Gy, cfg, need_deriv,
    )
    # global pixel activity (the one coupling BEFORE weighting: a pixel's
    # active status depends on events from every shard)
    import dataclasses as _dc

    lin = _dc.replace(lin, num_ev_map=jax.lax.psum(lin.num_ev_map, axes))
    return lin, prev_src


def make_shardmap_normal_eq(
    mesh: Mesh, cfg: M.ModelConfig, num_knots: int, num_sensor_pix: int
):
    """Explicit-collective normal-equation build: events sharded over ``ev``,
    EXACT cross-shard pairing via the halo exchange (no dropped pairs — the
    distributed system equals the single-device one), distributed
    Gauss-Newton reduction as collectives (SURVEY.md §2.3):

      * halo all_gather of per-(shard, sensor-pixel) boundary records,
      * psum over ``ev`` of the global inlier-count map,
      * psum over ``ev`` of the pose block (A11, b1),
      * map-domain blocks (A12 / A22 / b2) psum'd over ``ev`` then row-sliced
        per ``tile`` (the reduce-scatter shape: per-tile solves stay local).

    The L2 regularizer is applied on shard (0, *) only so the reduced system
    carries it exactly once (reference model.cpp:689-719).

    Returns fn(knots, Gx, Gy, dev_win) -> NormalEq (map rows tile-sharded).
    """
    import dataclasses as _dc0

    # Compaction stays off in THIS builder (its per-tile row slicing assumes
    # the full pixel row space); the sharded LM window composes compaction
    # with sharding (make_solve_window_sharded).
    cfg = _dc0.replace(cfg, compact_cap=None)
    n_ev = mesh.shape["ev"]

    def per_shard(knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev,
                  batch_ids, batch_s, batch_u, spix):
        my = jax.lax.axis_index("ev")
        lin, _ = _linearize_sharded(
            knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev,
            batch_ids, batch_s, batch_u, spix, cfg, num_sensor_pix,
            ("ev",), n_ev, my, True,
        )
        reg_scale = (my == 0).astype(Gx.dtype)
        neq = M.form_normal_eq(lin, Gx, Gy, cfg, num_knots, reg_scale)

        # distributed GN reduction: pose block psum'd (replicated result);
        # map-domain blocks summed over events and row-sliced per pano tile
        # (on hardware this psum+slice lowers toward a reduce-scatter).
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
            # activity is global (num_ev_map was psum'd); dropped is 0 here
            # (no compaction in this builder)
            active_count=neq.active_count,
            dropped=neq.dropped,
        )

    ev_spec = P("ev")
    shardfn = _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),  # knots, Gx, Gy replicated
            P(None, "ev"), ev_spec, ev_spec, ev_spec, ev_spec, P(), P(),
            ev_spec,
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
        return shardfn(
            knots, Gx, Gy, dev_win.bearings, dev_win.pol_signed,
            dev_win.prev_idx, dev_win.has_prev, dev_win.batch_ids,
            dev_win.batch_s, dev_win.batch_u, dev_win.sensor_pix,
        )

    return fn


# ---------------------------------------------------------------------------
# The full sharded LM window (reference solveTimeWindow, solver.cpp:11-368,
# as ONE SPMD program over the mesh).
# ---------------------------------------------------------------------------


def _solve_rowchunks(
    A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c, lam,
    fix_first: bool, axes, dim: int,
):
    """Distributed Schur solve: mirrors ``model.solve_normal_eq`` exactly,
    with the map rows split into per-device chunks — each device computes
    its chunk's contribution to S and the rhs (psum-reduced, the distributed
    Gauss-Newton tree reduction), the small Cholesky runs replicated, and x2
    is solved chunk-locally then all_gathered."""
    dt = b1.dtype
    dp_pad = A12_c.shape[1] // 2
    Ae = A12_c[:, :dp_pad]
    Ao = A12_c[:, dp_pad:]
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
    # damped per-row 2x2 inverse (model._damped_a22_inv on the chunk)
    a = axx_c * (1.0 + lam)
    b = axy_c
    c = ayy_c * (1.0 + lam)
    det = a * c - b * b
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    mask = (active_c & (jnp.abs(det) >= 1e-30)).astype(dt)
    inv = mask / det_safe
    m00, m01, m11 = c * inv, -b * inv, a * inv

    Ze = Ae * m00[:, None] + Ao * m01[:, None]
    Zo = Ae * m01[:, None] + Ao * m11[:, None]
    S_part = jax.lax.dot_general(
        Ae, Ze, (((0,), (0,)), ((), ())), preferred_element_type=dt
    ) + jax.lax.dot_general(
        Ao, Zo, (((0,), (0,)), ((), ())), preferred_element_type=dt
    )
    ib2x = m00 * b2x_c + m01 * b2y_c
    ib2y = m01 * b2x_c + m11 * b2y_c
    rhs_part = ib2x @ Ae + ib2y @ Ao
    # the two psums ride together (S is (3K)^2 ~ a few hundred KB)
    S_red, rhs_red = jax.lax.psum((S_part, rhs_part), axes)
    S = A11m - S_red[:dim, :dim]
    rhs = b1 - rhs_red[:dim]

    eps = 1e-10 * jnp.maximum(jnp.max(jnp.diag(S)), 1.0) + 1e-30
    S = S + eps * jnp.eye(dim, dtype=dt)
    chol, lower = jax.scipy.linalg.cho_factor(S)
    x1 = jax.scipy.linalg.cho_solve((chol, lower), rhs)

    x1_pad = jnp.zeros((dp_pad,), dt).at[:dim].set(x1)
    vx = b2x_c - Ae @ x1_pad
    vy = b2y_c - Ao @ x1_pad
    x2x = m00 * vx + m01 * vy
    x2y = m01 * vx + m11 * vy
    x2_c = jnp.stack([x2x, x2y], axis=0)  # (2, rows_chunk)
    x2 = jax.lax.all_gather(x2_c, axes, axis=1, tiled=True)  # (2, r_pad)
    return x1, x2


def _solve_cg_rowchunks(
    A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c, lam,
    fix_first: bool, axes, dim: int, max_iter: int = 100, tol=1e-6,
):
    """Distributed block-preconditioned CG on the full system: mirrors
    ``model.solve_normal_eq_cg`` (reference solveNormalEqCG,
    model.cpp:794-840) with the map rows CHUNKED over devices — the pose
    vector (x1, p1, r1) stays replicated, the map vectors live as per-device
    chunks, and every coupling (A12 cross terms, CG dot products) is one
    psum. The iteration path is identical to the single-device solver (all
    reduced scalars are replicated), so results match to roundoff."""
    dt = b1.dtype
    dp_pad = A12_c.shape[1] // 2
    Ae = A12_c[:, :dp_pad]
    Ao = A12_c[:, dp_pad:]
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
    axx = axx_c * (1.0 + lam)
    axy = axy_c
    ayy = ayy_c * (1.0 + lam)
    act = active_c.astype(dt)

    def matvec(x1, x2x, x2y):
        x1_pad = jnp.zeros((dp_pad,), dt).at[:dim].set(x1)
        cross = jax.lax.psum(x2x @ Ae + x2y @ Ao, axes)
        y1 = A11m @ x1 + cross[:dim]
        a22x = axx * x2x + axy * x2y
        a22y = axy * x2x + ayy * x2y
        y2x = Ae @ x1_pad + jnp.where(active_c, a22x, x2x)
        y2y = Ao @ x1_pad + jnp.where(active_c, a22y, x2y)
        return y1, y2x, y2y

    def dots(u1, v1, u2x, v2x, u2y, v2y):
        """<u, v> over the full system: replicated pose part + psum'd
        chunked map part (one scalar psum)."""
        return jnp.sum(u1 * v1) + jax.lax.psum(
            jnp.sum(u2x * v2x) + jnp.sum(u2y * v2y), axes
        )

    b2x = b2x_c * act
    b2y = b2y_c * act
    bnorm2 = dots(b1, b1, b2x, b2x, b2y, b2y)

    eps11 = 1e-10 * jnp.maximum(jnp.max(jnp.diag(A11m)), 1.0) + 1e-30
    chol11 = jax.scipy.linalg.cho_factor(
        A11m + eps11 * jnp.eye(dim, dtype=dt)
    )
    det22 = axx * ayy - axy * axy
    det22_safe = jnp.where(jnp.abs(det22) < 1e-30, 1.0, det22)
    inv_ok = active_c & (jnp.abs(det22) >= 1e-30)
    i00 = jnp.where(inv_ok, ayy / det22_safe, 1.0)
    i01 = jnp.where(inv_ok, -axy / det22_safe, 0.0)
    i11 = jnp.where(inv_ok, axx / det22_safe, 1.0)

    def precond(r1, r2x, r2y):
        z1 = jax.scipy.linalg.cho_solve(chol11, r1)
        return z1, i00 * r2x + i01 * r2y, i01 * r2x + i11 * r2y

    def body(state):
        x1, x2x, x2y, r1, r2x, r2y, p1, p2x, p2y, rz, rs, it = state
        ap1, ap2x, ap2y = matvec(p1, p2x, p2y)
        denom = dots(p1, ap1, p2x, ap2x, p2y, ap2y)
        alpha_ = rz / (denom + 1e-300)
        x1, x2x, x2y = x1 + alpha_ * p1, x2x + alpha_ * p2x, x2y + alpha_ * p2y
        r1, r2x, r2y = r1 - alpha_ * ap1, r2x - alpha_ * ap2x, r2y - alpha_ * ap2y
        z1, z2x, z2y = precond(r1, r2x, r2y)
        rz_new = dots(r1, z1, r2x, z2x, r2y, z2y)
        rs_new = dots(r1, r1, r2x, r2x, r2y, r2y)
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
    rz0 = dots(b1, pz1, b2x, pz2x, b2y, pz2y)
    state = (
        z1, zx, zx, b1, b2x, b2y, pz1, pz2x, pz2y, rz0, bnorm2, jnp.asarray(0)
    )
    x1, x2x, x2y, *_, rs, it = jax.lax.while_loop(cond, body, state)
    x2_c = jnp.stack([x2x * act, x2y * act], axis=0)
    x2 = jax.lax.all_gather(x2_c, axes, axis=1, tiled=True)
    return x1, x2


# ---------------------------------------------------------------------------
# Host-driven sharded LM phases: the same three separately-jitted phases as
# ``solver.solve_window`` (objective / form / solve+update — each value-fetch
# timed, with host callbacks between steps) but each phase an SPMD shard_map
# program over the mesh. This is what gives MULTI-CHIP runs the reference's
# full recording surface (per-phase chrono solver.cpp:105-151, 181-222,
# 242-294; saveEvoData solver.cpp:370-425; Np logging solver.cpp:283-293) —
# the fused sharded window is one opaque device program and can only report
# its trace.
# ---------------------------------------------------------------------------


def make_sharded_phases(
    mesh: Mesh,
    cfg: M.ModelConfig,
    num_knots: int,
    num_sensor_pix: int,
    fix_first: bool = False,
    use_cg: bool = False,
):
    """Build the per-phase SPMD programs for the host-driven sharded LM loop.

    Returns ``(prev_src_fn, objective_fn, form_fn, solve_fn)``:

    * ``prev_src_fn(knots, Gx, Gy, dev)`` -> ``(prev_bear (3, N), prev_bid
      (N,))`` event-sharded — the once-per-window cross-shard prev resolution
      (state-independent); None when not streaming.
    * ``objective_fn(knots, Gx, Gy, dev)`` -> ``(lin, cost_data, cost_reg)``
      with ``lin`` a :class:`model.Linearization` whose per-event fields stay
      event-sharded on the mesh (classic: full Jacobians; streamed: the
      light, Jacobian-free linearization) and the costs replicated scalars
      (data cost psum'd over shards).
    * ``form_fn(lin, knots, Gx, Gy, dev, prev_bear, prev_bid)`` -> the
      13-tuple reduced system of ``make_solve_window_sharded``'s
      ``form_reduce`` as GLOBAL arrays: pose block replicated, map rows
      chunked over all devices, truncation scalars (Np, psum'd dropped)
      replicated.
    * ``solve_fn(red, knots, Gx, Gy, lam, damping)`` ->
      ``(knots_new, gx_new, gy_new, sync)`` replicated; fetching ``sync``
      waits for the whole phase (value-fetch timing).

    All four are jitted once per builder call — use
    :func:`sharded_phases_cached` from loops.
    """
    n_ev, n_tile = mesh.shape["ev"], mesh.shape["tile"]
    n_shards = n_ev * n_tile
    axes = ("ev", "tile")
    dim = 3 * num_knots
    streamed = cfg.stream_chunk is not None

    ev1 = P(("ev", "tile"))
    ev2 = P(None, ("ev", "tile"))
    win_specs = (ev2, ev1, ev1, ev1, ev1, P(), P(), ev1)
    lin_specs = M.Linearization(
        e=ev1, inlier=ev1, pm_pix=ev1, num_ev_map=P(), dx=ev1, dy=ev1,
        Jc=ev2, Jp=ev2, i_c=ev1, i_p=ev1,
    )

    def my_idx():
        return jax.lax.axis_index("ev") * n_tile + jax.lax.axis_index("tile")

    def win_args(dev_win: M.DeviceWindow):
        return (
            dev_win.bearings, dev_win.pol_signed, dev_win.prev_idx,
            dev_win.has_prev, dev_win.batch_ids, dev_win.batch_s,
            dev_win.batch_u, dev_win.sensor_pix,
        )

    def lin_shard(knots, Gx, Gy, w, return_prev_src):
        return _linearize_sharded(
            knots, Gx, Gy, *w[:5], w[5], w[6], w[7], cfg, num_sensor_pix,
            axes, n_shards, my_idx(), not streamed, return_prev_src,
        )

    # -- phase 0 (streamed only): once-per-window prev resolution -----------
    prev_src_fn = None
    if streamed:
        def prev_shard(knots, Gx, Gy, *w):
            _, ps = lin_shard(knots, Gx, Gy, w, True)
            return ps

        prev_sm = _shard_map(
            prev_shard, mesh=mesh,
            in_specs=(P(), P(), P()) + win_specs,
            out_specs=(ev2, ev1),
        )

        @jax.jit
        def prev_src_fn(knots, Gx, Gy, dev_win):
            return prev_sm(knots, Gx, Gy, *win_args(dev_win))

    # -- phase 1: objective (linearize + costs) ------------------------------
    def obj_shard(knots, Gx, Gy, *w):
        lin, _ = lin_shard(knots, Gx, Gy, w, False)
        cost_data = jax.lax.psum(M.data_cost(lin.e, cfg), axes)
        return lin, cost_data, M.reg_cost(Gx, Gy, cfg.alpha)

    obj_sm = _shard_map(
        obj_shard, mesh=mesh,
        in_specs=(P(), P(), P()) + win_specs,
        out_specs=(lin_specs, P(), P()),
    )

    @jax.jit
    def objective_fn(knots, Gx, Gy, dev_win):
        return obj_sm(knots, Gx, Gy, *win_args(dev_win))

    # -- phase 2: forming + distributed GN reduction -------------------------
    # (the prev-src halo arrays ride along only in streamed mode — their
    # pytree slots must be real arrays under shard_map in_specs)
    def form_shard(knots, Gx, Gy, prev, lin, *w):
        my = my_idx()
        reg_scale = (my == 0).astype(Gx.dtype)
        if streamed:
            local_dev = M.DeviceWindow(
                bearings=w[0], pol_signed=w[1], prev_idx=w[2], has_prev=w[3],
                batch_ids=w[4], batch_s=w[5], batch_u=w[6], sensor_pix=w[7],
            )
            aux = lin if cfg.stream_light else lin.num_ev_map
            neq = M.form_normal_eq_streamed(
                aux, knots, Gx, Gy, local_dev, cfg, num_knots, reg_scale,
                prev_bearings=prev[0], prev_bids=prev[1],
            )
        else:
            neq = M.form_normal_eq(lin, Gx, Gy, cfg, num_knots, reg_scale)
        r_pad = neq.a22_xx.shape[0]
        if r_pad % n_shards:
            raise ValueError(
                f"map row space {r_pad} not divisible by {n_shards} "
                "devices (pad TILE_PX / compact_cap)"
            )
        rows_c = r_pad // n_shards

        def chunk(x):
            # reduce-scatter, NOT psum+slice: each device only needs its row
            # chunk of the summed map-domain blocks, so scattering during
            # the reduction halves the wire bytes of the largest per-
            # iteration collective (A12: 1.6 GB/iter at a full 1024x512 row
            # space, measured in the compiled HLO — docs/scaling_model_r4)
            # and never materializes the full summed array per device.
            return jax.lax.psum_scatter(x, axes, scatter_dimension=0,
                                        tiled=True)

        return (
            jax.lax.psum(neq.A11, axes),
            jax.lax.psum(neq.b1, axes),
            chunk(neq.a22_xx), chunk(neq.a22_xy), chunk(neq.a22_yy),
            chunk(neq.b2_x), chunk(neq.b2_y), chunk(neq.A12),
            jax.lax.dynamic_slice_in_dim(neq.active, my * rows_c, rows_c, 0),
            neq.pix2row, neq.active_pix, neq.active_count,
            jax.lax.psum(neq.dropped, axes),
        )

    prev_specs = (ev2, ev1) if streamed else ()
    form_sm = _shard_map(
        form_shard, mesh=mesh,
        in_specs=(P(), P(), P(), prev_specs, lin_specs) + win_specs,
        out_specs=(
            P(), P(), ev1, ev1, ev1, ev1, ev1, P(("ev", "tile"), None),
            ev1, P(), P(), P(), P(),
        ),
    )

    @jax.jit
    def form_fn(lin, knots, Gx, Gy, dev_win, prev_bear, prev_bid):
        prev = (prev_bear, prev_bid) if streamed else ()
        return form_sm(knots, Gx, Gy, prev, lin, *win_args(dev_win))

    # -- phase 3: damped solve + trial state ---------------------------------
    def solve_shard(A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c,
                    active_c, pix2row, active_pix, knots, Gx, Gy, lam,
                    damping):
        solver_fn = _solve_cg_rowchunks if use_cg else _solve_rowchunks
        x1, x2 = solver_fn(
            A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c,
            lam, fix_first, axes, dim,
        )
        knots_new = M.update_knots(knots, x1, fix_first)
        shape = Gx.shape
        r_pad = x2.shape[1]
        rows = jnp.minimum(pix2row, r_pad - 1)
        valid = (pix2row < r_pad) & active_pix
        act = active_pix.reshape(shape)
        dxp = jnp.where(valid, x2[0, rows], 0.0).reshape(shape)
        dyp = jnp.where(valid, x2[1, rows], 0.0).reshape(shape)
        gx_new = jnp.where(act, Gx + damping * dxp, 0.0)
        gy_new = jnp.where(act, Gy + damping * dyp, 0.0)
        sync = x1[0] + gx_new[0, 0] + gy_new[0, 0] + knots_new[0, 0, 0]
        return knots_new, gx_new, gy_new, sync

    solve_sm = _shard_map(
        solve_shard, mesh=mesh,
        in_specs=(
            P(), P(), ev1, ev1, ev1, ev1, ev1, P(("ev", "tile"), None),
            ev1, P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P(), P()),
    )

    @jax.jit
    def solve_fn(red, knots, Gx, Gy, lam, damping):
        (A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c,
         pix2row, active_pix, _np, _dr) = red
        return solve_sm(
            A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c,
            pix2row, active_pix, knots, Gx, Gy, lam, damping,
        )

    return prev_src_fn, objective_fn, form_fn, solve_fn


_SHARDED_PHASES_CACHE: dict = {}


def sharded_phases_cached(mesh, cfg, num_knots, num_sensor_pix, fix_first,
                          use_cg=False):
    """Memoized :func:`make_sharded_phases` (fresh closures are fresh jit
    cache entries; remote-TPU compiles cost 30-400 s each)."""
    key = (
        tuple(d.id for d in mesh.devices.flat),
        tuple(mesh.shape.items()),
        cfg, num_knots, num_sensor_pix, fix_first, use_cg,
    )
    fns = _SHARDED_PHASES_CACHE.get(key)
    if fns is None:
        fns = _SHARDED_PHASES_CACHE[key] = make_sharded_phases(
            mesh, cfg, num_knots, num_sensor_pix, fix_first, use_cg
        )
    return fns


def solve_window_sharded_host(
    knots,
    Gx,
    Gy,
    dev_win: M.DeviceWindow,
    mesh: Mesh,
    cfg: M.ModelConfig,
    num_sensor_pix: int,
    lm_cfg=None,
    damping_factor: float = 1.0,
    fix_first: bool = False,
    use_cg: bool = False,
    callback=None,
    checkpoint_cb=None,
    checkpoint_every: int = 0,
    resume_state: dict | None = None,
):
    """Host-driven LM over the sharded window: identical control flow and
    identical results to ``solver.solve_window`` (reference solveTimeWindow,
    solver.cpp:11-368) with every device phase an SPMD program over the mesh
    — so a MULTI-CHIP run gets per-phase value-fetch timing, per-iteration
    callbacks (evo dumps, saveEvoData parity solver.cpp:370-425) and
    per-form Np / dropped counters, none of which the fused sharded window
    can surface mid-flight. ``dev_win`` must be placed with
    :func:`shard_window_all`. Returns ``(knots, Gx, Gy, LMStats)``.

    ``checkpoint_cb`` / ``checkpoint_every`` / ``resume_state``: mid-window
    LM checkpointing with the same contract as ``solver.solve_window`` —
    resumed runs are bit-identical (state restored exactly; linearization
    and normal equations re-derived deterministically).
    """
    import time as _time

    from . import lm as lm_mod
    from . import solver as _solver

    lm_cfg = lm_cfg or _solver.LMConfig()
    num_knots = knots.shape[0]
    stats = _solver.LMStats(num_events=int(dev_win.pol_signed.shape[0]))
    dt = Gx.dtype
    damping = jnp.asarray(damping_factor, dt)

    prev_src_fn, objective_fn, form_fn, solve_fn = sharded_phases_cached(
        mesh, cfg, num_knots, num_sensor_pix, fix_first, use_cg
    )
    if prev_src_fn is not None:
        pb, pbid = prev_src_fn(knots, Gx, Gy, dev_win)
    else:
        pb = pbid = None

    sched = lm_mod.HostSchedule(
        tol_fun=lm_cfg.tol_fun,
        max_num_iter=lm_cfg.max_num_iter,
        num_times_tol_fun_sat=lm_cfg.num_times_tol_fun_sat,
        lam=lm_cfg.lambda_init,
        lambda_min=lm_cfg.lambda_min,
        lambda_max=lm_cfg.lambda_max,
    )
    if resume_state is not None:
        knots, Gx, Gy = replicate(
            mesh,
            jnp.asarray(resume_state["knots"], dt),
            jnp.asarray(resume_state["gx"], dt),
            jnp.asarray(resume_state["gy"], dt),
        )
        sched.lam = float(resume_state["lam"])
        sched.count_tol_sat = int(resume_state["count_tol_sat"])
        sched.it = int(resume_state["it"])
        sched.cost_decreased = bool(resume_state["cost_decreased"])
        if prev_src_fn is not None:
            pb, pbid = prev_src_fn(knots, Gx, Gy, dev_win)

    t_loop0 = _time.perf_counter()
    t0 = t_loop0
    lin, cost_data_j, cost_reg_j = objective_fn(knots, Gx, Gy, dev_win)
    cost_data, cost_reg = float(cost_data_j), float(cost_reg_j)
    stats.time_objective_s += _time.perf_counter() - t0
    stats.count_objective += 1
    if resume_state is None:
        sched.start(cost_data + cost_reg)
    else:
        sched.cost_min = float(resume_state["cost_min"])

    red = None
    while sched.running():
        # on resume, form once even after an interrupted reject (red is None)
        if sched.cost_decreased or red is None:
            t0 = _time.perf_counter()
            red = form_fn(lin, knots, Gx, Gy, dev_win, pb, pbid)
            dropped = int(red[12])  # value-fetch sync for the phase
            stats.time_form_s += _time.perf_counter() - t0
            stats.count_form += 1
            stats.note_active_pixels(int(red[11]))
            stats.dropped_meas_per_form.append(dropped)

        if callback is not None:
            callback(sched.it, Gx, Gy,
                     dict(lam=sched.lam, cost_min=sched.cost_min))

        t0 = _time.perf_counter()
        knots_new, gx_new, gy_new, sync = solve_fn(
            red, knots, Gx, Gy, jnp.asarray(sched.lam, dt), damping
        )
        float(sync)
        t1 = _time.perf_counter()
        stats.time_solve_s += t1 - t0
        stats.count_solve += 1

        lin_new, cost_data_new_j, cost_reg_new_j = objective_fn(
            knots_new, gx_new, gy_new, dev_win
        )
        cost_data_new = float(cost_data_new_j)
        cost_reg_new = float(cost_reg_new_j)
        stats.time_objective_s += _time.perf_counter() - t1
        stats.count_objective += 1
        cost_new = cost_data_new + cost_reg_new

        stats.iterations.append(
            dict(
                iter=sched.it + 1,
                log10_lambda=np.log10(sched.lam),
                cost_min=sched.cost_min,
                cost_new=cost_new,
                cost_data=cost_data,
                cost_reg=cost_reg,
            )
        )

        if sched.step(cost_new):
            knots, Gx, Gy = knots_new, gx_new, gy_new
            lin = lin_new
            cost_data, cost_reg = cost_data_new, cost_reg_new
            if sched.converged:
                stats.converged = True
                break

        if (
            checkpoint_cb is not None
            and checkpoint_every > 0
            and sched.it % checkpoint_every == 0
        ):
            checkpoint_cb(_solver.lm_state_dict(sched, knots, Gx, Gy))

    stats.time_total_s = _time.perf_counter() - t_loop0
    return knots, Gx, Gy, stats


# make_solve_window_sharded returns a fresh closure (= a fresh jit cache
# entry) per call; with 30-400 s remote-TPU compiles, calling it inside a
# window loop makes multi-window runs compile-bound. This memo keys the
# closure on everything that shapes the compiled program, so a run compiles
# once per distinct (mesh, cfg, knot count, ...) signature.
_SHARDED_WINDOW_CACHE: dict = {}


def solve_window_sharded_cached(
    mesh: Mesh,
    cfg: M.ModelConfig,
    num_knots: int,
    num_sensor_pix: int,
    fix_first: bool = False,
    max_num_iter: int = 50,
    num_times_tol_fun_sat: int = 2,
    return_trace: bool = False,
    use_cg: bool = False,
):
    """Memoized :func:`make_solve_window_sharded` (same signature)."""
    key = (
        tuple(d.id for d in mesh.devices.flat),
        tuple(mesh.shape.items()),
        cfg,
        num_knots,
        num_sensor_pix,
        fix_first,
        max_num_iter,
        num_times_tol_fun_sat,
        return_trace,
        use_cg,
    )
    fn = _SHARDED_WINDOW_CACHE.get(key)
    if fn is None:
        fn = _SHARDED_WINDOW_CACHE[key] = make_solve_window_sharded(
            mesh, cfg, num_knots, num_sensor_pix, fix_first, max_num_iter,
            num_times_tol_fun_sat, return_trace, use_cg,
        )
    return fn


def make_solve_window_sharded(
    mesh: Mesh,
    cfg: M.ModelConfig,
    num_knots: int,
    num_sensor_pix: int,
    fix_first: bool = False,
    max_num_iter: int = 50,
    num_times_tol_fun_sat: int = 2,
    return_trace: bool = False,
    use_cg: bool = False,
):
    """The COMPLETE LM time-window solve (reference ``EMBA::solveTimeWindow``,
    solver.cpp:11-368) as one SPMD program over the mesh — accept/reject,
    the x10 / /10 lambda schedule with bounds [1e-300, 1e3], tol-sat
    convergence counting, and trial-state reuse, identical control flow to
    ``solver.solve_window_fused``.

    Parallel structure (SURVEY.md §2.3):
      * events are sharded over ALL devices (the combined ("ev","tile")
        axis) — every device linearizes and accumulates its own events, with
        EXACT cross-shard pairing via the halo all_gather,
      * trial cost: one scalar psum per iteration,
      * pose block (A11, b1): psum, replicated (~300x300),
      * map-domain blocks: summed over shards, then row-CHUNKED over all
        devices for the Schur reduction (each device GEMMs its chunk of
        A12^T A22m^-1 A12; partial S psum'd); x2 solved chunk-locally and
        all_gathered for the replicated map update,
      * the Pallas accumulation kernel runs shard-locally (static local
        shapes); active-pixel compaction composes (the compact row space is
        derived from the psum'd global activity map, identical on every
        shard).

    Returns jitted fn(knots, Gx, Gy, dev_win, damping, tol_fun) ->
    (knots, Gx, Gy, cost_min, iterations, converged), all replicated
    [+ the per-iteration trace (lm.TRACE_COLS — lambda, costs, accept, Np,
    psum'd dropped-measurement count) when ``return_trace``: multi-chip runs
    report the reference's per-iteration observability, solver.cpp:176-178,
    283-293].
    """
    from . import lm
    n_ev, n_tile = mesh.shape["ev"], mesh.shape["tile"]
    n_shards = n_ev * n_tile
    axes = ("ev", "tile")
    dim = 3 * num_knots
    # streamed mode: the light linearization carries no (D, N) Jacobians —
    # the forming pass recomputes them per chunk (10^7-10^8-event windows
    # compose with event sharding)
    streamed = cfg.stream_chunk is not None

    def per_shard(knots, Gx, Gy, damping, tol_fun, bearings, pol_signed,
                  prev_idx, has_prev, batch_ids, batch_s, batch_u, spix):
        dt = Gx.dtype
        my = jax.lax.axis_index("ev") * n_tile + jax.lax.axis_index("tile")
        reg_scale = (my == 0).astype(dt)
        local_dev = M.DeviceWindow(
            bearings=bearings, pol_signed=pol_signed, prev_idx=prev_idx,
            has_prev=has_prev, batch_ids=batch_ids, batch_s=batch_s,
            batch_u=batch_u, sensor_pix=spix,
        )

        def lin_full(knots_, gx_, gy_, return_prev_src=False):
            return _linearize_sharded(
                knots_, gx_, gy_, bearings, pol_signed, prev_idx, has_prev,
                batch_ids, batch_s, batch_u, spix, cfg, num_sensor_pix,
                axes, n_shards, my, not streamed, return_prev_src,
            )

        def lin_local(knots_, gx_, gy_):
            return lin_full(knots_, gx_, gy_)[0]

        def cost_of(lin, gx_, gy_):
            return jax.lax.psum(M.data_cost(lin.e, cfg), axes) + M.reg_cost(
                gx_, gy_, cfg.alpha
            )

        # cross-shard prev bearings/batch-ids are STATE-INDEPENDENT (the
        # pairing and the halo fold winner depend only on event order):
        # resolve them through the halo ONCE, reuse every LM iteration.
        # The bearings flatten to 1-D before crossing the while_loop — a
        # (3, nl) f32 intermediate alive across it draws a transposed remat
        # copy whose (8,128) tiling pads the 3-dim 42.7x (model.prev_records)
        if streamed:
            _, prev_src = lin_full(knots, Gx, Gy, True)
            prev_src = (prev_src[0].reshape(-1), prev_src[1])
        else:
            prev_src = None

        def form_reduce(lin, knots_, gx_, gy_):
            """Form shard-locally, reduce: pose block replicated, map rows
            chunked over all devices. The last two entries are the
            observability scalars: Np (global — derived from the psum'd
            activity map, identical on every shard) and the psum'd
            compaction-dropped measurement count (no silent truncation,
            reference Np logging solver.cpp:283-293)."""
            if streamed:
                # light tier: the shard-local light linearization's (N,)
                # fields feed forming directly (Jacobian-only recompute);
                # full tier: just the psum'd global activity map
                aux = lin if cfg.stream_light else lin.num_ev_map
                neq = M.form_normal_eq_streamed(
                    aux, knots_, gx_, gy_, local_dev, cfg,
                    num_knots, reg_scale, prev_bearings=prev_src[0],
                    prev_bids=prev_src[1],
                )
            else:
                neq = M.form_normal_eq(lin, gx_, gy_, cfg, num_knots,
                                       reg_scale)
            r_pad = neq.a22_xx.shape[0]
            if r_pad % n_shards:
                raise ValueError(
                    f"map row space {r_pad} not divisible by {n_shards} "
                    "devices (pad TILE_PX / compact_cap)"
                )
            rows_c = r_pad // n_shards

            def chunk(x):
                # reduce-scatter (see sharded_phases_cached.form_shard.chunk):
                # halves the A12 reduction bytes vs psum+slice and drops the
                # full-size replicated intermediate.
                return jax.lax.psum_scatter(x, axes, scatter_dimension=0,
                                            tiled=True)

            return (
                jax.lax.psum(neq.A11, axes),
                jax.lax.psum(neq.b1, axes),
                chunk(neq.a22_xx),
                chunk(neq.a22_xy),
                chunk(neq.a22_yy),
                chunk(neq.b2_x),
                chunk(neq.b2_y),
                chunk(neq.A12),
                jax.lax.dynamic_slice_in_dim(
                    neq.active, my * rows_c, rows_c, axis=0
                ),
                neq.pix2row,
                neq.active_pix,
                neq.active_count,
                jax.lax.psum(neq.dropped, axes),
            )

        def update_map_full(gx_, gy_, x2, pix2row, active_pix):
            """model.update_map on the all_gathered x2 (replicated)."""
            shape = gx_.shape
            r_pad = x2.shape[1]
            rows = jnp.minimum(pix2row, r_pad - 1)
            valid = (pix2row < r_pad) & active_pix
            act = active_pix.reshape(shape)
            dxp = jnp.where(valid, x2[0, rows], 0.0).reshape(shape)
            dyp = jnp.where(valid, x2[1, rows], 0.0).reshape(shape)
            gx2 = jnp.where(act, gx_ + damping * dxp, 0.0)
            gy2 = jnp.where(act, gy_ + damping * dyp, 0.0)
            return gx2, gy2

        def objective(knots_, gx_, gy_):
            lin = lin_local(knots_, gx_, gy_)
            return cost_of(lin, gx_, gy_), lin

        def solve_update(red, knots_, gx_, gy_, lam):
            (A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c,
             pix2row, active_pix, _np, _dr) = red
            solver_fn = _solve_cg_rowchunks if use_cg else _solve_rowchunks
            x1, x2 = solver_fn(
                A11, b1, axx_c, axy_c, ayy_c, b2x_c, b2y_c, A12_c, active_c,
                lam, fix_first, axes, dim,
            )
            knots_new = M.update_knots(knots_, x1, fix_first)
            gx_new, gy_new = update_map_full(gx_, gy_, x2, pix2row,
                                             active_pix)
            return knots_new, gx_new, gy_new

        # Only the REDUCED system is carried across iterations (re-carrying
        # the linearization would where-merge (D, N_shard) data nothing
        # reads); `accept` is replicated (derived from psum'd costs), so the
        # collectives inside the lax.cond re-form execute uniformly.
        knots, Gx, Gy, cost_min, it, converged, trace = lm.lm_while(
            knots, Gx, Gy,
            objective=objective,
            form=form_reduce,
            solve_update=solve_update,
            sys_stats=lambda red: (red[11], red[12]),
            tol_fun=tol_fun,
            max_num_iter=max_num_iter,
            num_times_tol_fun_sat=num_times_tol_fun_sat,
            carry_aux=False,
        )
        return knots, Gx, Gy, cost_min, it, converged, trace

    ev_spec = P(("ev", "tile"))
    shardfn = _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),
            P(None, ("ev", "tile")), ev_spec, ev_spec, ev_spec, ev_spec,
            P(), P(), ev_spec,
        ),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
    )

    @jax.jit
    def fn(knots, Gx, Gy, dev_win: M.DeviceWindow, damping, tol_fun):
        out = shardfn(
            knots, Gx, Gy, damping, tol_fun, dev_win.bearings,
            dev_win.pol_signed, dev_win.prev_idx, dev_win.has_prev,
            dev_win.batch_ids, dev_win.batch_s, dev_win.batch_u,
            dev_win.sensor_pix,
        )
        return out if return_trace else out[:6]

    return fn


# ---------------------------------------------------------------------------
# Distributed map-only solve (the production super-resolution path).
# ---------------------------------------------------------------------------


def make_map_only_sharded(mesh: Mesh, cfg: M.ModelConfig,
                          num_sensor_pix: int):
    """Distributed map-only solve — the production super-resolution path
    (:func:`model.map_only_step` / :func:`model.solve_map_only`; reference
    map math ``model.cpp:863-903`` — its 4K outputs are maps rendered from
    1K-refined trajectories) as one SPMD program over the mesh:

      * events sharded over the combined ("ev", "tile") axis with EXACT
        cross-shard pairing (the same log-depth halo fold as the sharded LM
        window),
      * global activity map psum'd over all shards,
      * the five per-pixel accumulators (a22xx/a22xy/a22yy/b2x/b2y)
        scatter-added shard-locally then REDUCE-SCATTERED into per-device
        row chunks (1/n-size results, half the wire bytes of psum+slice),
      * the closed-form per-pixel 2x2 solve runs chunk-locally (the map
        block is per-pixel independent — embarrassingly shardable); the
        solved map is all_gathered (replicated, updateMap semantics:
        inactive pixels reset to zero).

    With the pose fixed the residual is affine in G, so one pass is the
    exact regularized quadratic minimizer; with ``cfg.use_irls`` the
    weights are evaluated at the INPUT map (one IRLS step per call, as
    ``map_only_step`` — iterate via :func:`solve_map_only_sharded`).
    Returns jitted ``fn(knots, Gx, Gy, dev_win) -> (Gx', Gy', cost_data,
    num_ev_map)`` matching ``map_only_step``'s contract; ``dev_win`` must
    be placed by :func:`shard_window_all`.
    """
    n_ev, n_tile = mesh.shape["ev"], mesh.shape["tile"]
    n_shards = n_ev * n_tile
    axes = ("ev", "tile")
    hw = cfg.num_pix
    rows = -(-hw // n_shards)
    hw_pad = rows * n_shards

    def per_shard(knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev,
                  batch_ids, batch_s, batch_u, spix):
        dt = Gx.dtype
        my = jax.lax.axis_index("ev") * n_tile + jax.lax.axis_index("tile")
        lin, _ = _linearize_sharded(
            knots, Gx, Gy, bearings, pol_signed, prev_idx, has_prev,
            batch_ids, batch_s, batch_u, spix, cfg, num_sensor_pix,
            axes, n_shards, my, False,
        )
        # num_ev_map was psum'd inside _linearize_sharded: global activity
        active = lin.num_ev_map >= cfg.thres_valid_pixel
        cost = jax.lax.psum(M.data_cost(lin.e, cfg), axes)

        # per-pixel 2x2 blocks + rhs, active-masked (model.cpp:421-447);
        # one (5, HW_pad) stack -> ONE reduce-scatter for all five planes
        w = lin.inlier & active[lin.pm_pix]
        wA = jnp.where(w, M.irls_weights(lin.e, cfg), 0.0).astype(dt)
        we = wA * lin.e
        z = jnp.zeros((hw_pad,), dt)
        acc = jnp.stack([
            z.at[lin.pm_pix].add(wA * lin.dx * lin.dx, mode="drop"),
            z.at[lin.pm_pix].add(wA * lin.dx * lin.dy, mode="drop"),
            z.at[lin.pm_pix].add(wA * lin.dy * lin.dy, mode="drop"),
            z.at[lin.pm_pix].add(we * lin.dx, mode="drop"),
            z.at[lin.pm_pix].add(we * lin.dy, mode="drop"),
        ])
        a22xx, a22xy, a22yy, b2x, b2y = jax.lax.psum_scatter(
            acc, axes, scatter_dimension=1, tiled=True
        )  # each (rows,)

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, my * rows, rows)

        pad = hw_pad - hw
        act_c = sl(jnp.pad(active, (0, pad)))
        gx_f = sl(jnp.pad(Gx.reshape(-1).astype(dt), (0, pad)))
        gy_f = sl(jnp.pad(Gy.reshape(-1).astype(dt), (0, pad)))

        # L2 regularizer on active pixels + closed-form 2x2 (identical
        # arithmetic to model.map_only_step's finish)
        af = act_c.astype(dt)
        alpha = jnp.asarray(cfg.alpha, dt)
        a = a22xx + alpha * af
        b = a22xy
        d = a22yy + alpha * af
        rx = b2x - alpha * gx_f * af
        ry = b2y - alpha * gy_f * af
        det = a * d - b * b
        det_safe = jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
        ok = (act_c & (jnp.abs(det) >= 1e-30)).astype(dt) / det_safe
        gx_c = jnp.where(act_c, gx_f + (d * rx - b * ry) * ok, 0.0)
        gy_c = jnp.where(act_c, gy_f + (a * ry - b * rx) * ok, 0.0)
        gx_new = jax.lax.all_gather(gx_c, axes, axis=0, tiled=True)
        gy_new = jax.lax.all_gather(gy_c, axes, axis=0, tiled=True)
        return (
            gx_new[:hw].reshape(Gx.shape),
            gy_new[:hw].reshape(Gy.shape),
            cost,
            lin.num_ev_map,
        )

    ev_spec = P(("ev", "tile"))
    shardfn = _shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P(None, ("ev", "tile")), ev_spec, ev_spec, ev_spec, ev_spec,
            P(), P(), ev_spec,
        ),
        out_specs=(P(), P(), P(), P()),
    )

    @jax.jit
    def fn(knots, Gx, Gy, dev_win: M.DeviceWindow):
        return shardfn(
            knots, Gx, Gy, dev_win.bearings, dev_win.pol_signed,
            dev_win.prev_idx, dev_win.has_prev, dev_win.batch_ids,
            dev_win.batch_s, dev_win.batch_u, dev_win.sensor_pix,
        )

    return fn


def solve_map_only_sharded(
    knots, Gx, Gy, dev_win: M.DeviceWindow, cfg: M.ModelConfig, mesh: Mesh,
    num_sensor_pix: int, num_iters: int = 1,
):
    """Multi-chip :func:`model.solve_map_only`: one exact closed-form pass
    for the quadratic cost; ``num_iters > 1`` refreshes IRLS weights between
    passes. ``dev_win`` must already be placed by :func:`shard_window_all`.
    Returns ``(Gx, Gy, costs)`` with ``num_iters + 1`` cost evaluations
    (the last at the final map), matching the single-device contract."""
    import dataclasses as _dc

    if cfg.compact_cap is not None:
        cfg = _dc.replace(cfg, compact_cap=None)  # rows ARE pixels here
    fn = make_map_only_sharded(mesh, cfg, num_sensor_pix)
    costs = []
    for _ in range(num_iters):
        Gx, Gy, cost, _nem = fn(knots, Gx, Gy, dev_win)
        costs.append(float(cost))
    _gx, _gy, cost, _nem = fn(knots, Gx, Gy, dev_win)
    costs.append(float(cost))
    return Gx, Gy, costs
