"""Pallas TPU kernel: pixel-sorted accumulation of the pose-map coupling
block A12 (and the per-pixel A22 / b2 sums + the pose block A11 / b1) for
the LEGM normal equations.

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
3. per chunk, ONE one-hot strip ``us`` of the sqrt(w)-scaled half-Jacobians
   is expanded via a one-hot compare + static lane-rolls (VPU); the A12
   operands are per-ROW rescalings ``ux = us * swdx``, ``uy = us * swdy``
   (w dx J == (sqrt(w) J)(sqrt(w) dx)); the in-tile pixel one-hot P
   (MC, TILE_PX) is built from the packed payload, and ``out += P^T U``
   runs on the MXU. The same P accumulates the five per-pixel sums
   (a22_xx, a22_xy, a22_yy, b2_x, b2_y), all derived in-kernel from
   (swdx, swdy, swe).

Prepass layout (the HBM-bandwidth hot spot): the per-measurement payload is
exactly ``1 + 2D + 3`` float32 rows — one bitcast-packed int32 row carrying
(i_c, i_p, in-tile pixel), the 2D sqrt(w)-scaled Jacobian rows, and
(swdx, swdy, swe). For order 2 that is 16 rows = two (8,128) HBM tiles per
gathered element (the previous 24-row layout paid three). The bucketed
destination map is computed arithmetically from per-chunk table lookups
(every padded chunk belongs to exactly one tile), replacing the inverse-
permutation scatter of the earlier design. Pixel indices stay int32
throughout, so there is NO float32 2^24 limit on the row domain.

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

# Packed index row: FLAG (bit 30) | i_c (10 bits) | i_p (11 bits) |
# in-tile pixel (9 bits). The payload rides (np_rows, N) f32 buffers through
# XLA sorts/gathers before the kernel sees it, and raw small bit patterns
# are f32 DENORMALS that TPU data paths may flush to zero (measured on the
# analogous prev-batch-id packing in model.py). Bit 30 pins the f32
# exponent field to [0x80, 0xFE] for every i_c < 1016 — always a normal,
# non-NaN float, so the round-trip is FTZ-proof.
_IC_SHIFT, _IP_SHIFT = 20, 9
_IC_MASK, _IDX_MASK, _PX_MASK = 0x3FF, 0x7FF, 0x1FF
_NORM_FLAG = 0x40000000
MAX_SEG_IC = 1016  # i_c must stay < 1016 (10 bits, exponent != 0xFF)
MAX_KNOTS = 2048  # i_p must fit 11 bits
assert TILE_PX <= 512, "packed in-tile pixel index is 9 bits (TILE_PX <= 512)"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(
    # scalar prefetch
    tile_of_chunk_ref,
    # blocked input (VMEM)
    payload_ref,  # (NP_ROWS, MC) f32; row 0 is the bitcast-packed indices
    # with carry=True: aliased accumulator inputs, then outputs; otherwise
    # just the outputs (blocked VMEM, dynamically tile-indexed)
    *refs,  # [a12_in, px5_in, a11_in,] a12, px5, a11
    dp_pad: int,
    order: int,
    carry: bool,
):
    if carry:
        a12_in_ref, px5_in_ref, a11_in_ref, a12_ref, px5_ref, a11_ref = refs
    else:
        a12_ref, px5_ref, a11_ref = refs
    i = pl.program_id(0)
    tile = tile_of_chunk_ref[i]

    # Initialize the output block on first visit of this tile (from the
    # aliased carry when chaining across streamed chunks — the megablox gmm
    # existing_out pattern — else zeros); the A11 block maps to a constant
    # index so it is initialized once and revisited by every chunk.
    is_first = jnp.logical_or(i == 0, tile_of_chunk_ref[jnp.maximum(i - 1, 0)] != tile)

    @pl.when(is_first)
    def _():
        if carry:
            a12_ref[...] = a12_in_ref[...]
            px5_ref[...] = px5_in_ref[...]
        else:
            a12_ref[...] = jnp.zeros_like(a12_ref)
            px5_ref[...] = jnp.zeros_like(px5_ref)

    @pl.when(i == 0)
    def _():
        if carry:
            a11_ref[...] = a11_in_ref[...]
        else:
            a11_ref[...] = jnp.zeros_like(a11_ref)

    d = 3 * order
    col_ids_f = jax.lax.broadcasted_iota(jnp.int32, (1, dp_pad), 1).astype(
        jnp.float32
    )
    tp_ids_f = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PX), 1).astype(
        jnp.float32
    )

    # Unpack the index row (padding slots carry all-zero payload: their
    # weights are zero, so every contribution vanishes regardless of the
    # decoded indices).
    packed = jax.lax.bitcast_convert_type(payload_ref[0, :], jnp.int32)
    colc = (3 * ((packed >> _IC_SHIFT) & _IC_MASK)).astype(jnp.float32)
    colp = (3 * ((packed >> _IP_SHIFT) & _IDX_MASK)).astype(jnp.float32)
    plocal = (packed & _PX_MASK).astype(jnp.float32)
    swdx = payload_ref[1 + 2 * d, :]
    swdy = payload_ref[2 + 2 * d, :]
    swe = payload_ref[3 + 2 * d, :]

    # ONE strip us = sqrt(w) * measurement row (MC, dp_pad): one one-hot
    # compare per half at the block start column, then static lane-rolls
    # place the D consecutive components. The A12 operands are per-row
    # rescalings of the same strip.
    base_c = (col_ids_f == colc[:, None]).astype(jnp.float32)
    base_p = (col_ids_f == colp[:, None]).astype(jnp.float32)
    us = jnp.zeros((MC, dp_pad), jnp.float32)
    for j in range(d):
        oc = base_c if j == 0 else pltpu.roll(base_c, j, 1)
        op = base_p if j == 0 else pltpu.roll(base_p, j, 1)
        us = us + oc * payload_ref[1 + j, :][:, None] + op * payload_ref[
            1 + d + j, :
        ][:, None]
    ux = us * swdx[:, None]
    uy = us * swdy[:, None]

    # In-tile pixel one-hot.
    P = (tp_ids_f == plocal[:, None]).astype(jnp.float32)

    # TPU MXU default precision decomposes f32 operands to ONE bf16 pass
    # (~1e-3 relative — measured 42x noisier than the XLA scatter vs an f64
    # accumulation of the same linearization). Mosaic does not support
    # per-operand precision, so multi-pass bf16 is built MANUALLY: the
    # one-hot P is EXACT in bf16, so P @ U = P @ hi(U) + P @ lo(U) recovers
    # ~16 mantissa bits of the value operand in TWO single-pass GEMMs (vs
    # HIGHEST x HIGHEST on both operands); the A11 Gram product splits both
    # sides into a 3-pass hi/lo expansion (the lo*lo term is below f32
    # round-off). The explicit BF16 mode keeps the cheap single pass.

    def _split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def _dot_t(a, b):  # a^T @ b with f32 accumulation (contract dim 0)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    Pg = P.astype(jnp.bfloat16)
    # Per-pixel sums, derived in-kernel: [w dx dx, w dx dy, w dy dy,
    # w e dx, w e dy] = [swdx^2, swdx swdy, swdy^2, swe swdx, swe swdy].
    zero = jnp.zeros_like(swdx)
    v5t = jnp.stack(
        [swdx * swdx, swdx * swdy, swdy * swdy, swe * swdx, swe * swdy,
         zero, zero, zero]
    ).T  # (MC, 8)
    if BF16:
        a12_ref[:, :dp_pad] += _dot_t(Pg, ux.astype(jnp.bfloat16))
        a12_ref[:, dp_pad:] += _dot_t(Pg, uy.astype(jnp.bfloat16))
        px5_ref[...] += _dot_t(Pg, v5t.astype(jnp.bfloat16))
        usg = us.astype(jnp.bfloat16)
        a11_ref[:dp_pad, :] += _dot_t(usg, usg)
        a11_ref[dp_pad : dp_pad + 1, :] += jax.lax.dot_general(
            swe[None, :].astype(jnp.bfloat16), usg,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:
        ux_hi, ux_lo = _split(ux)
        uy_hi, uy_lo = _split(uy)
        v5_hi, v5_lo = _split(v5t)
        a12_ref[:, :dp_pad] += _dot_t(Pg, ux_hi) + _dot_t(Pg, ux_lo)
        a12_ref[:, dp_pad:] += _dot_t(Pg, uy_hi) + _dot_t(Pg, uy_lo)
        px5_ref[...] += _dot_t(Pg, v5_hi) + _dot_t(Pg, v5_lo)
        # pose normal equations: A11 += us^T us; b1 += (sw e) us
        us_hi, us_lo = _split(us)
        a11_ref[:dp_pad, :] += (
            _dot_t(us_hi, us_hi) + _dot_t(us_hi, us_lo) + _dot_t(us_lo, us_hi)
        )
        swe_hi, swe_lo = _split(swe[None, :])
        a11_ref[dp_pad : dp_pad + 1, :] += jax.lax.dot_general(
            swe_hi, us_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            swe_hi, us_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            swe_lo, us_hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("num_pix", "dim_pose", "order"))
def a12_accumulate(
    pm_pix,
    i_c,
    i_p,
    Jc,
    Jp,
    dx,
    dy,
    e,
    wA,
    num_pix: int,
    dim_pose: int,
    order: int,
    carry=None,
):
    """Sorted-scatter accumulation of A12 + per-pixel sums + the pose normal
    equations (see module doc).

    Args:
      pm_pix: (N,) int32 pano pixel (or compact row) per measurement (any
        order; values == num_pix-rounded-up act as a drop row and must carry
        zero weight).
      i_c, i_p: (N,) int32 segment indices (< MAX_KNOTS).
      Jc, Jp: (D, N) half-Jacobians (unscaled).
      dx, dy: (N,) map-gradient Jacobians.
      e: (N,) residuals.
      wA: (N,) measurement weights (>= 0; 0 disables a measurement).
      num_pix: HW (static); dim_pose: 3K (static); order: spline order.
      carry: optional (a12, px5, a11b) from a previous call to accumulate
        INTO (donated via input_output_aliases — the kernel adds this
        chunk's contributions in place, so chaining streamed chunks costs
        no extra accumulator buffers or add passes).

    Returns:
      a12: (HW_pad, 2*dp_pad), dp_pad = round_up(dim_pose, 128); columns
        [0:dp_pad) = Gx plane, [dp_pad:) = Gy plane (zero-padded cols/rows).
      px5: (HW_pad, 8): cols 0..4 = a22_xx, a22_xy, a22_yy, b2_x, b2_y.
      a11b: (dp_pad + 8, dp_pad): rows [0:dp_pad) = A11, row dp_pad = b1.
    """
    if dim_pose > 3 * MAX_KNOTS:
        raise ValueError(
            f"a12_accumulate: dim_pose {dim_pose} > {3 * MAX_KNOTS} — the "
            "packed index row carries 11-bit knot indices (use the chunked "
            "long fit for longer trajectories)"
        )
    if dim_pose // 3 - order + 1 > MAX_SEG_IC:
        raise ValueError(
            f"a12_accumulate: {dim_pose // 3} knots exceed the FTZ-proof "
            f"10-bit curr-segment range ({MAX_SEG_IC} segments) — set "
            "use_pallas=False (XLA producer) or split the window"
        )
    d = 3 * order
    dp_pad = _round_up(dim_pose, 128)
    hw_pad = _round_up(num_pix, TILE_PX)
    np_rows = 1 + 2 * d + 3
    tile_of_chunk, payload_b = _bucket_prepass(
        pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, wA, num_pix
    )
    n_chunks = payload_b.shape[1] // MC

    out_specs = [
        pl.BlockSpec((TILE_PX, 2 * dp_pad), lambda i, t: (t[i], 0)),
        pl.BlockSpec((TILE_PX, 8), lambda i, t: (t[i], 0)),
        pl.BlockSpec((dp_pad + 8, dp_pad), lambda i, t: (0, 0)),
    ]
    in_specs = [pl.BlockSpec((np_rows, MC), lambda i, *_: (0, i))]
    operands = [tile_of_chunk, payload_b]
    aliases = {}
    if carry is not None:
        # carry accumulators ride as aliased inputs with the SAME index maps
        # as the outputs; indices count ALL positional operands including the
        # scalar-prefetch one (tile_of_chunk=0, payload=1, carry=2,3,4).
        in_specs = in_specs + out_specs
        operands = operands + list(carry)
        aliases = {2: 0, 3: 1, 4: 2}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = functools.partial(
        _kernel, dp_pad=dp_pad, order=order, carry=carry is not None
    )
    a12, px5, a11b = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hw_pad, 2 * dp_pad), jnp.float32),
            jax.ShapeDtypeStruct((hw_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((dp_pad + 8, dp_pad), jnp.float32),
        ],
        input_output_aliases=aliases,
        # run interpreted off-TPU so the same code path is testable on CPU
        interpret=jax.default_backend() != "tpu",
    )(*operands)
    return a12, px5, a11b


def kernel_flops(n: int, num_pix: int, dim_pose: int, order: int,
                 bf16: bool | None = None) -> float:
    """Statically-known FLOPs EXECUTED by one ``a12_accumulate`` pallas_call
    (the custom call is opaque to XLA's cost model, so bench rooflines add
    this): per grid chunk of MC padded measurement slots —

    * A12: 2 column planes x (hi+lo bf16 passes) of (MC,TILE_PX)^T(MC,dp_pad),
    * px5: (hi+lo) of (MC,TILE_PX)^T(MC,8),
    * A11 Gram: 3-pass hi/lo of (MC,dp_pad)^T(MC,dp_pad); b1: 3 GEMV passes,
    * the VPU one-hot strip expansion (d roll+FMA passes over (MC,dp_pad)).

    The worst-case static chunk count (round_up(n, MC)/MC + one padding
    chunk per pixel tile) is exactly the compiled grid. Note these are
    flops EXECUTED by the chosen one-hot formulation (hardware utilization),
    not the minimal algorithmic flops of the scatter it replaces."""
    if bf16 is None:
        bf16 = BF16
    dp_pad = _round_up(dim_pose, 128)
    n_tiles = _round_up(num_pix, TILE_PX) // TILE_PX
    n_chunks = (_round_up(max(n, 1), MC) + n_tiles * MC) // MC
    d = 3 * order
    passes_val = 1 if bf16 else 2  # hi/lo splitting of the value operand
    passes_gram = 1 if bf16 else 3
    per_chunk = (
        2 * passes_val * (2.0 * MC * TILE_PX * dp_pad)  # A12 planes
        + passes_val * (2.0 * MC * TILE_PX * 8)  # px5
        + passes_gram * (2.0 * MC * dp_pad * dp_pad)  # A11
        + passes_gram * (2.0 * MC * dp_pad)  # b1
        + (4.0 * d + 2.0) * MC * dp_pad  # us/ux/uy strip build (VPU)
    )
    return n_chunks * per_chunk


def _round_up_arr(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_pix",))
def _bucket_prepass(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, wA, num_pix: int):
    """Sort measurements by pano pixel and re-lay them out into per-tile
    buckets padded to the chunk size MC (module doc). Returns
    (tile_of_chunk, payload_b) ready for the kernel grid.

    The padded-slot -> original-measurement map is ARITHMETIC: every padded
    chunk belongs to exactly one tile, so a slot's sorted position is
    ``tile_start[tile] + (slot - padded_off[tile])`` — per-chunk lookups
    into (n_tiles,)-sized tables + an iota, no scatter. One composed gather
    then pulls the (np_rows, N) payload straight from its unsorted layout.
    """
    n = pm_pix.shape[0]
    d = Jc.shape[0]
    hw_pad = _round_up(num_pix, TILE_PX)
    n_tiles = hw_pad // TILE_PX
    np_rows = 1 + 2 * d + 3

    # ---- payload build (unsorted, elementwise) ----------------------------
    sw = jnp.sqrt(wA.astype(jnp.float32))
    plocal = (pm_pix & (TILE_PX - 1)) if (TILE_PX & (TILE_PX - 1)) == 0 else (
        pm_pix % TILE_PX
    )
    packed = (
        _NORM_FLAG
        | (i_c << _IC_SHIFT)
        | (i_p << _IP_SHIFT)
        | plocal.astype(jnp.int32)
    )
    payload = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(packed, jnp.float32)[None, :],
            Jc.astype(jnp.float32) * sw[None, :],
            Jp.astype(jnp.float32) * sw[None, :],
            (sw * dx.astype(jnp.float32))[None, :],
            (sw * dy.astype(jnp.float32))[None, :],
            (sw * e.astype(jnp.float32))[None, :],
        ],
        axis=0,
    )  # (np_rows, N)

    # ---- sort by pixel ----------------------------------------------------
    # sort_key_val returns the sorted keys alongside the permutation in one
    # fused sort — ~33% faster than argsort + key gather on TPU at 2M keys
    pix_s, sort_idx = jax.lax.sort_key_val(
        pm_pix, jnp.arange(pm_pix.shape[0], dtype=jnp.int32)
    )

    # ---- per-tile bucket geometry (all (n_tiles,)-sized, cheap) -----------
    tile_edges = jnp.arange(n_tiles + 1, dtype=jnp.int32) * TILE_PX
    tile_start = jnp.searchsorted(pix_s, tile_edges, side="left").astype(jnp.int32)
    counts = tile_start[1:] - tile_start[:-1]  # (n_tiles,)
    # at least one chunk per tile so EVERY output block gets initialized
    padded_counts = jnp.maximum(_round_up_arr(counts, MC), MC)
    padded_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )
    # static upper bound on the padded length, itself a multiple of MC
    n_padded = _round_up(n, MC) + n_tiles * MC
    n_chunks = n_padded // MC
    chunk_slot = jnp.arange(n_chunks, dtype=jnp.int32) * MC
    tile_of_chunk = (
        jnp.searchsorted(padded_off, chunk_slot, side="right").astype(jnp.int32) - 1
    )
    tile_of_chunk = jnp.clip(tile_of_chunk, 0, n_tiles - 1)

    # ---- arithmetic padded-slot -> sorted-position map --------------------
    base_sorted = tile_start[tile_of_chunk]  # (n_chunks,)
    base_padded = padded_off[tile_of_chunk]
    limit = tile_start[tile_of_chunk + 1]
    slots = jnp.arange(n_padded, dtype=jnp.int32).reshape(n_chunks, MC)
    src2 = base_sorted[:, None] + (slots - base_padded[:, None])
    src = jnp.where(src2 < limit[:, None], src2, n).reshape(-1)

    # Compose padded-slot -> sorted-pos -> original-index so the big payload
    # is gathered ONCE from its unsorted layout (slot n = zero fill).
    sort_ext = jnp.concatenate(
        [sort_idx.astype(jnp.int32), jnp.full((1,), n, jnp.int32)]
    )
    src_orig = jnp.take(sort_ext, src)
    payload_ext = jnp.concatenate(
        [payload, jnp.zeros((np_rows, 1), jnp.float32)], axis=1
    )
    payload_b = jnp.take(payload_ext, src_orig, axis=1)
    return tile_of_chunk, payload_b
