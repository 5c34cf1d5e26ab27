"""Adversarial tests for the Pallas A12 accumulation kernel (interpret mode
on CPU): degenerate pixel distributions that stress the bucket re-layout."""

import numpy as np
import jax.numpy as jnp
import pytest

import emba_tpu.kernels.a12_accum as K


def ref_accumulate(pm_pix, i_c, i_p, Jc, Jp, wdx, wdy, vals5, hw, dim_pose):
    d = Jc.shape[0]
    dp_pad = K._round_up(dim_pose, 128)
    hw_pad = K._round_up(hw, K.TILE_PX)
    a12 = np.zeros((hw_pad, 2 * dp_pad), np.float32)
    px5 = np.zeros((hw_pad, 8), np.float32)
    for m in range(len(pm_pix)):
        p = pm_pix[m]
        for j in range(d):
            a12[p, 3 * i_c[m] + j] += Jc[j, m] * wdx[m]
            a12[p, 3 * i_p[m] + j] += Jp[j, m] * wdx[m]
            a12[p, dp_pad + 3 * i_c[m] + j] += Jc[j, m] * wdy[m]
            a12[p, dp_pad + 3 * i_p[m] + j] += Jp[j, m] * wdy[m]
        px5[p, :5] += vals5[:, m]
    return a12, px5


def make_inputs(rng, n, hw, knots, pix_mode="uniform"):
    d = 6
    if pix_mode == "uniform":
        pix = rng.integers(0, hw, n)
    elif pix_mode == "one_pixel":
        pix = np.full(n, hw - 1)
    elif pix_mode == "one_tile":
        pix = rng.integers(0, K.TILE_PX, n)
    elif pix_mode == "two_extremes":
        pix = np.where(rng.random(n) < 0.5, 0, hw - 1)
    return (
        pix.astype(np.int32),
        rng.integers(0, knots - 1, n).astype(np.int32),
        rng.integers(0, knots - 1, n).astype(np.int32),
        rng.normal(size=(d, n)).astype(np.float32),
        rng.normal(size=(d, n)).astype(np.float32),
        rng.normal(size=n).astype(np.float32),
        rng.normal(size=n).astype(np.float32),
        rng.normal(size=(5, n)).astype(np.float32),
    )


@pytest.mark.parametrize(
    "pix_mode", ["uniform", "one_pixel", "one_tile", "two_extremes"]
)
def test_kernel_matches_reference(pix_mode):
    rng = np.random.default_rng(0)
    n, hw, knots = 2000, 2048, 10
    args = make_inputs(rng, n, hw, knots, pix_mode)
    a12, px5 = K.a12_accumulate(
        *(jnp.asarray(a) for a in args), num_pix=hw, dim_pose=3 * knots, order=2
    )
    ref_a12, ref_px5 = ref_accumulate(*args, hw, 3 * knots)
    np.testing.assert_allclose(np.asarray(a12), ref_a12, atol=2e-3)
    np.testing.assert_allclose(np.asarray(px5), ref_px5, atol=2e-3)


def test_kernel_tiny_n():
    rng = np.random.default_rng(1)
    n, hw, knots = 3, 1024, 5
    args = make_inputs(rng, n, hw, knots, "uniform")
    a12, px5 = K.a12_accumulate(
        *(jnp.asarray(a) for a in args), num_pix=hw, dim_pose=3 * knots, order=2
    )
    ref_a12, ref_px5 = ref_accumulate(*args, hw, 3 * knots)
    np.testing.assert_allclose(np.asarray(a12), ref_a12, atol=1e-4)
    np.testing.assert_allclose(np.asarray(px5), ref_px5, atol=1e-4)
