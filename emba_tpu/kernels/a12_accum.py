"""Pallas TPU kernel: pixel-sorted accumulation of the pose-map coupling
block A12 (and the per-pixel A22 / b2 sums) for the LEGM normal equations.

Motivation: the XLA scatter-add of 24 scalars per measurement into the
(2HW x 3K) coupling block runs at ~2e7 scattered elements/s on TPU — the
dominant cost of normal-equation forming. This kernel turns the scatter into
dense MXU GEMMs:

1. measurements are sorted by warped pano pixel (XLA sort) and re-laid out
   into per-pixel-tile buckets padded to the chunk size MC, so every
   MC-chunk belongs to exactly one TILE_PX-pixel output tile,
2. the grid iterates over chunks; the OUTPUT tile for each chunk is selected
   dynamically through a prefetched ``tile_of_chunk`` array (the
   PrefetchScalarGridSpec revisiting pattern — consecutive chunks of the
   same tile keep the output block resident in VMEM),
3. per chunk, the (curr + prev) half-Jacobians weighted by (w dx, w dy) are
   expanded into dense (MC, Dp) strips via one one-hot compare + static
   lane-rolls (VPU), the in-tile pixel one-hot P (MC, TILE_PX) is built, and
   ``out += P^T U`` runs on the MXU. The same P also accumulates the five
   per-pixel sums (a22_xx, a22_xy, a22_yy, b2_x, b2_y).

Layout: A12 is produced as (HW_pad, 2*Dp) with columns [0:Dp) = the Gx
plane, [Dp:2Dp) = the Gy plane (Dp = 3K rounded up to 128) — directly the
GEMM operands of the Schur reduction.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile/chunk sizes (env-overridable for tuning; defaults fit the ~16MB VMEM
# budget with double-buffered blocks).
TILE_PX = int(os.environ.get("EMBA_TILE_PX", "512"))  # pano pixels per tile
MC = int(os.environ.get("EMBA_MC", "256"))  # measurements per grid step
# Optional bf16 GEMM operands (P is exact 0/1; the U strips lose ~3 decimal
# digits — normal-equation noise ~0.3%, which LM tolerates). Off by default;
# accumulation is always f32.
BF16 = os.environ.get("EMBA_KERNEL_BF16") == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    # scalar prefetch
    tile_of_chunk_ref,
    # blocked inputs (VMEM)
    pixf_ref,  # (1, MC) f32 pixel index (-1 for padding slots)
    payload_ref,  # (NP_ROWS, MC) f32
    # outputs (blocked VMEM, dynamically tile-indexed)
    a12_ref,  # (TILE_PX, 2*dp_pad)
    px5_ref,  # (TILE_PX, 8)
    a11_ref,  # (dp_pad + 8, dp_pad): rows [0:dp_pad) = A11, row dp_pad = b1
    *,
    dp_pad: int,
    order: int,
):
    i = pl.program_id(0)
    tile = tile_of_chunk_ref[i]

    # Zero the output block on first visit of this tile; the A11 block maps
    # to a constant index so it is zeroed once and revisited by every chunk.
    is_first = jnp.logical_or(i == 0, tile_of_chunk_ref[jnp.maximum(i - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        a12_ref[...] = jnp.zeros_like(a12_ref)
        px5_ref[...] = jnp.zeros_like(px5_ref)

    @pl.when(i == 0)
    def _():
        a11_ref[...] = jnp.zeros_like(a11_ref)

    d = 3 * order
    col_ids_f = jax.lax.broadcasted_iota(jnp.int32, (1, dp_pad), 1).astype(
        jnp.float32
    )
    tp_ids_f = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PX), 1).astype(
        jnp.float32
    )

    pixf = pixf_ref[0, :]  # (MC,)
    colc = payload_ref[0, :] * 3.0  # 3*i_c
    colp = payload_ref[1, :] * 3.0
    wdx = payload_ref[2 + 2 * d, :]
    wdy = payload_ref[3 + 2 * d, :]
    sw = payload_ref[9 + 2 * d, :]  # sqrt(w)
    swe = payload_ref[10 + 2 * d, :]  # sqrt(w) * e

    # U strips (MC, dp_pad): one one-hot compare per half at the block start
    # column, then static lane-rolls place the D consecutive components.
    # us = sqrt(w) * measurement rows (for A11 = us^T us, b1 = (sw e)^T us).
    base_c = (col_ids_f == colc[:, None]).astype(jnp.float32)
    base_p = (col_ids_f == colp[:, None]).astype(jnp.float32)
    ux = jnp.zeros((MC, dp_pad), jnp.float32)
    uy = jnp.zeros((MC, dp_pad), jnp.float32)
    us = jnp.zeros((MC, dp_pad), jnp.float32)
    for j in range(d):
        oc = base_c if j == 0 else pltpu.roll(base_c, j, 1)
        op = base_p if j == 0 else pltpu.roll(base_p, j, 1)
        jc_j = payload_ref[2 + j, :]
        jp_j = payload_ref[2 + d + j, :]
        ux = ux + oc * (jc_j * wdx)[:, None] + op * (jp_j * wdx)[:, None]
        uy = uy + oc * (jc_j * wdy)[:, None] + op * (jp_j * wdy)[:, None]
        us = us + oc * (jc_j * sw)[:, None] + op * (jp_j * sw)[:, None]

    # In-tile pixel one-hot (padding slots carry pixf = -1 -> all-zero row).
    plocal = pixf - jnp.float32(TILE_PX) * tile.astype(jnp.float32)
    P = (tp_ids_f == plocal[:, None]).astype(jnp.float32)

    # TPU MXU default precision decomposes f32 operands to ONE bf16 pass
    # (~1e-3 relative — measured 42x noisier than the XLA scatter vs an f64
    # accumulation of the same linearization). HIGHEST = 3-pass bf16 ~= true
    # f32; the explicit BF16 mode keeps the cheap single pass.
    prec = jax.lax.Precision.DEFAULT if BF16 else jax.lax.Precision.HIGHEST
    gemm_dt = jnp.bfloat16 if BF16 else jnp.float32
    Pg = P.astype(gemm_dt)
    a12_ref[:, :dp_pad] += jax.lax.dot_general(
        Pg, ux.astype(gemm_dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    a12_ref[:, dp_pad:] += jax.lax.dot_general(
        Pg, uy.astype(gemm_dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    v5 = payload_ref[4 + 2 * d : 4 + 2 * d + 8, :]  # (8, MC) incl. pad rows
    px5_ref[...] += jax.lax.dot_general(
        P,
        v5.T,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    # pose normal equations: A11 += us^T us; b1 += (sw e) us
    usg = us.astype(gemm_dt)
    a11_ref[:dp_pad, :] += jax.lax.dot_general(
        usg, usg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    a11_ref[dp_pad : dp_pad + 1, :] += jax.lax.dot_general(
        swe[None, :], us, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


@functools.partial(jax.jit, static_argnames=("num_pix", "dim_pose", "order"))
def a12_accumulate(
    pm_pix,
    i_c,
    i_p,
    Jc,
    Jp,
    wdx,
    wdy,
    vals5,
    sw,
    swe,
    num_pix: int,
    dim_pose: int,
    order: int,
):
    """Sorted-scatter accumulation of A12 + per-pixel sums + the pose normal
    equations (see module doc).

    Args:
      pm_pix: (N,) int32 pano pixel per measurement (any order).
      i_c, i_p: (N,) int32 segment indices.
      Jc, Jp: (D, N) half-Jacobians.
      wdx, wdy: (N,) weighted map Jacobians (w*dx, w*dy).
      vals5: (5, N) per-pixel accumulants [w dx dx, w dx dy, w dy dy,
        we dx, we dy].
      sw: (N,) sqrt of the measurement weight.
      swe: (N,) sqrt(w) * residual.
      num_pix: HW (static); dim_pose: 3K (static); order: spline order.

    Returns:
      a12: (HW_pad, 2*dp_pad), dp_pad = round_up(dim_pose, 128); columns
        [0:dp_pad) = Gx plane, [dp_pad:) = Gy plane (zero-padded cols/rows).
      px5: (HW_pad, 8): cols 0..4 = a22_xx, a22_xy, a22_yy, b2_x, b2_y.
      a11b: (dp_pad + 8, dp_pad): rows [0:dp_pad) = A11, row dp_pad = b1.
    """
    n = pm_pix.shape[0]
    d = 3 * order
    dp_pad = _round_up(dim_pose, 128)
    hw_pad = _round_up(num_pix, TILE_PX)
    n_tiles = hw_pad // TILE_PX
    np_rows = 4 + 2 * d + 8
    tile_of_chunk, pixf_b, payload_b = _bucket_prepass(
        pm_pix, i_c, i_p, Jc, Jp, wdx, wdy, vals5, sw, swe, num_pix
    )
    n_chunks = pixf_b.shape[0] // MC

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, MC), lambda i, *_: (0, i)),
            pl.BlockSpec((np_rows, MC), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_PX, 2 * dp_pad), lambda i, t: (t[i], 0)),
            pl.BlockSpec((TILE_PX, 8), lambda i, t: (t[i], 0)),
            pl.BlockSpec((dp_pad + 8, dp_pad), lambda i, t: (0, 0)),
        ],
    )
    kernel = functools.partial(_kernel, dp_pad=dp_pad, order=order)
    a12, px5, a11b = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hw_pad, 2 * dp_pad), jnp.float32),
            jax.ShapeDtypeStruct((hw_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((dp_pad + 8, dp_pad), jnp.float32),
        ],
        # run interpreted off-TPU so the same code path is testable on CPU
        interpret=jax.default_backend() != "tpu",
    )(tile_of_chunk, pixf_b[None, :], payload_b)
    return a12, px5, a11b


def _round_up_arr(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_pix",))
def _bucket_prepass(
    pm_pix, i_c, i_p, Jc, Jp, wdx, wdy, vals5, sw, swe, num_pix: int
):
    """Sort measurements by pano pixel and re-lay them out into per-tile
    buckets padded to the chunk size MC (module doc, step 1). Returns
    (tile_of_chunk, pixf_b, payload_b) ready for the kernel grid."""
    n = pm_pix.shape[0]
    hw_pad = _round_up(num_pix, TILE_PX)
    # Row indices ride through the bucket prepass and kernel as float32,
    # exact only below 2^24 (a >16.7M-row domain would silently mis-bucket).
    # Larger panoramas must use active-pixel compaction (compact_cap).
    if hw_pad >= 1 << 24:
        raise ValueError(
            f"a12_accumulate: row domain {hw_pad} >= 2^24 exceeds exact "
            "float32 indexing; enable ModelConfig.compact_cap"
        )
    n_tiles = hw_pad // TILE_PX
    np_rows = 4 + 2 * (Jc.shape[0]) + 8

    # ---- sort by pixel ----------------------------------------------------
    # sort_key_val returns the sorted keys alongside the permutation in one
    # fused sort — ~33% faster than argsort + key gather on TPU at 2M keys
    pix_s, sort_idx = jax.lax.sort_key_val(
        pm_pix, jnp.arange(pm_pix.shape[0], dtype=jnp.int32)
    )
    payload = jnp.concatenate(
        [
            i_c[None, :].astype(jnp.float32),
            i_p[None, :].astype(jnp.float32),
            Jc.astype(jnp.float32),
            Jp.astype(jnp.float32),
            wdx[None, :].astype(jnp.float32),
            wdy[None, :].astype(jnp.float32),
            vals5.astype(jnp.float32),
            sw[None, :].astype(jnp.float32),
            swe[None, :].astype(jnp.float32),
            jnp.zeros((1, n), jnp.float32),
        ],
        axis=0,
    )  # (np_rows, N)

    # ---- re-layout into per-tile buckets padded to MC ---------------------
    tile_edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_PX
    tile_start = jnp.searchsorted(pix_s, tile_edges, side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]  # (n_tiles,)
    # at least one chunk per tile so EVERY output block gets initialized
    padded_counts = jnp.maximum(_round_up_arr(counts, MC), MC)
    padded_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )
    n_padded = n + n_tiles * MC  # static upper bound on the padded length

    tile_of_m = jnp.clip(pix_s // TILE_PX, 0, n_tiles - 1)
    rank = jnp.arange(n, dtype=jnp.int32) - tile_start[tile_of_m]
    dest = padded_off[tile_of_m] + rank  # (N,) destination slot (unique)

    # Inverse permutation (one int scatter), then ONE fused gather: compose
    # padded-slot -> sorted-pos -> original-index so the big payload is
    # gathered once instead of twice.
    src = jnp.full((n_padded,), n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    sort_ext = jnp.concatenate([sort_idx.astype(jnp.int32), jnp.full((1,), n, jnp.int32)])
    src_orig = jnp.take(sort_ext, src)  # padded slot -> original index (n = fill)
    pix_ext = jnp.concatenate([pix_s.astype(jnp.float32), jnp.full((1,), -1.0)])
    payload_ext = jnp.concatenate(
        [payload, jnp.zeros((np_rows, 1), jnp.float32)], axis=1
    )
    pixf_b = jnp.take(pix_ext, src)
    payload_b = jnp.take(payload_ext, src_orig, axis=1)

    # ---- per-chunk output tile --------------------------------------------
    n_chunks = n_padded // MC
    chunk_slot = jnp.arange(n_chunks, dtype=jnp.int32) * MC
    # tile of chunk c = index of the tile whose padded range contains slot
    tile_of_chunk = (
        jnp.searchsorted(padded_off, chunk_slot, side="right").astype(jnp.int32) - 1
    )
    tile_of_chunk = jnp.clip(tile_of_chunk, 0, n_tiles - 1)
    return tile_of_chunk, pixf_b, payload_b
