"""FTZ-proof bitcast packing invariants.

TPU data paths flush f32 denormals to zero, so any int32 value bitcast into
an f32 payload row MUST land in the normal range (exponent field in
[0x01, 0xFE]) or it can be silently zeroed by a fused copy/gather — this
collapsed the streamed pairing on hardware (every prev batch id < 2^23 came
back 0). These tests pin the invariant for both packing sites; the
hardware-level check is the TPU kernel-parity run
(scripts/verify_kernel_tpu.py -> docs/kernel_parity_tpu.json).
"""

import numpy as np

from emba_tpu import model
from emba_tpu.kernels import a12_accum as K


def _exponent_field(i32):
    return (np.asarray(i32).astype(np.int64) >> 23) & 0xFF


def test_batch_id_bias_is_normal_range():
    # every batch id a window can produce (int32, non-negative)
    ids = np.array([0, 1, 7, 255, 2**20, 2**23 - 1, 2**23, 10**8],
                   dtype=np.int64)
    packed = ids + model._BID_BIAS
    exp = _exponent_field(packed)
    assert (exp >= 1).all() and (exp <= 0xFE).all(), exp
    # exact round trip
    assert (packed - model._BID_BIAS == ids).all()


def test_kernel_packed_index_is_normal_range():
    # boundary combinations of (i_c, i_p, plocal) across the allowed ranges
    ic = np.array([0, 1, 7, 8, 95, K.MAX_SEG_IC - 1])
    ip = np.array([0, 1, 2047])
    pl = np.array([0, 1, 511])
    grid = np.stack(np.meshgrid(ic, ip, pl), axis=-1).reshape(-1, 3)
    packed = (
        K._NORM_FLAG
        | (grid[:, 0] << K._IC_SHIFT)
        | (grid[:, 1] << K._IP_SHIFT)
        | grid[:, 2]
    )
    exp = _exponent_field(packed)
    assert (exp >= 1).all() and (exp <= 0xFE).all(), (
        grid[(exp < 1) | (exp > 0xFE)])
    # decode inverts encode
    got_ic = (packed >> K._IC_SHIFT) & K._IC_MASK
    got_ip = (packed >> K._IP_SHIFT) & K._IDX_MASK
    got_pl = packed & K._PX_MASK
    assert (got_ic == grid[:, 0]).all()
    assert (got_ip == grid[:, 1]).all()
    assert (got_pl == grid[:, 2]).all()


def test_kernel_rejects_out_of_range_segments():
    import jax.numpy as jnp
    import pytest

    n = 8
    z = jnp.zeros((n,))
    zi = jnp.zeros((n,), jnp.int32)
    J = jnp.zeros((6, n))
    with pytest.raises(ValueError, match="FTZ-proof"):
        K.a12_accumulate(zi, zi, zi, J, J, z, z, z, z,
                         num_pix=512, dim_pose=3 * (K.MAX_SEG_IC + 2),
                         order=2)
