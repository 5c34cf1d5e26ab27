"""Adversarial tests for the Pallas A12 accumulation kernel (interpret mode
on CPU): degenerate pixel distributions that stress the bucket re-layout,
plus the fused pose-block (A11/b1) outputs."""

import numpy as np
import jax.numpy as jnp
import pytest

import emba_tpu.kernels.a12_accum as K


def ref_accumulate(pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, wA, hw, dim_pose):
    d = Jc.shape[0]
    dp_pad = K._round_up(dim_pose, 128)
    hw_pad = K._round_up(hw, K.TILE_PX)
    a12 = np.zeros((hw_pad, 2 * dp_pad), np.float32)
    px5 = np.zeros((hw_pad, 8), np.float32)
    a11 = np.zeros((dp_pad, dp_pad), np.float32)
    b1 = np.zeros(dp_pad, np.float32)
    wdx, wdy = wA * dx, wA * dy
    sw = np.sqrt(wA)
    swe = sw * e
    we = wA * e
    vals5 = np.stack([wA * dx * dx, wA * dx * dy, wA * dy * dy, we * dx, we * dy])
    for m in range(len(pm_pix)):
        p = pm_pix[m]
        row = np.zeros(dp_pad, np.float32)
        for j in range(d):
            a12[p, 3 * i_c[m] + j] += Jc[j, m] * wdx[m]
            a12[p, 3 * i_p[m] + j] += Jp[j, m] * wdx[m]
            a12[p, dp_pad + 3 * i_c[m] + j] += Jc[j, m] * wdy[m]
            a12[p, dp_pad + 3 * i_p[m] + j] += Jp[j, m] * wdy[m]
            row[3 * i_c[m] + j] += Jc[j, m] * sw[m]
            row[3 * i_p[m] + j] += Jp[j, m] * sw[m]
        px5[p, :5] += vals5[:, m]
        a11 += np.outer(row, row)
        b1 += swe[m] * row
    return a12, px5, a11, b1


def make_inputs(rng, n, hw, knots, pix_mode="uniform", knot_lo=0, d=6):
    order = d // 3
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
        rng.integers(knot_lo, knots - order + 1, n).astype(np.int32),  # i_c
        rng.integers(knot_lo, knots - order + 1, n).astype(np.int32),  # i_p
        rng.normal(size=(d, n)).astype(np.float32),
        rng.normal(size=(d, n)).astype(np.float32),
        rng.normal(size=n).astype(np.float32),  # dx
        rng.normal(size=n).astype(np.float32),  # dy
        rng.normal(size=n).astype(np.float32),  # e
        rng.uniform(0.1, 1.0, size=n).astype(np.float32),  # wA
    )


def check(args, hw, knots):
    dim_pose = 3 * knots
    order = args[3].shape[0] // 3
    a12, px5, a11b = K.a12_accumulate(
        *(jnp.asarray(a) for a in args), num_pix=hw, dim_pose=dim_pose,
        order=order,
    )
    ref_a12, ref_px5, ref_a11, ref_b1 = ref_accumulate(*args, hw, dim_pose)
    dp_pad = K._round_up(dim_pose, 128)
    # f32 accumulation error grows with the terms per A11 row (2D per
    # measurement side) — scale the A11 tolerance with the block size
    atol_a11 = 5e-3 * (order / 2)
    np.testing.assert_allclose(np.asarray(a12), ref_a12, atol=2e-3)
    np.testing.assert_allclose(np.asarray(px5)[:, :5], ref_px5[:, :5], atol=2e-3)
    np.testing.assert_allclose(np.asarray(a11b)[:dp_pad], ref_a11, atol=atol_a11)
    np.testing.assert_allclose(np.asarray(a11b)[dp_pad], ref_b1, atol=2e-3)


@pytest.mark.parametrize(
    "pix_mode", ["uniform", "one_pixel", "one_tile", "two_extremes"]
)
def test_kernel_matches_reference(pix_mode):
    rng = np.random.default_rng(0)
    check(make_inputs(rng, 2000, 2048, 10, pix_mode), 2048, 10)


@pytest.mark.parametrize(
    "pix_mode", ["uniform", "one_pixel", "one_tile", "two_extremes"]
)
def test_kernel_matches_reference_order4(pix_mode):
    """Order-4 (cubic spline): the kernel packs a D=12 payload per
    measurement side (a12_accum.py payload packing) — exercise every
    degenerate pixel distribution at full cubic depth (reference
    CubicTrajectory, src/utils/trajectory.cpp:481-626)."""
    rng = np.random.default_rng(7)
    check(make_inputs(rng, 2000, 2048, 10, pix_mode, d=12), 2048, 10)


def test_kernel_carry_chains_in_place_order4():
    """Chained (streamed) accumulation at D=12."""
    rng = np.random.default_rng(8)
    hw, knots = 2048, 10
    dim_pose = 3 * knots
    args_a = make_inputs(rng, 1100, hw, knots, "uniform", d=12)
    args_b = make_inputs(rng, 600, hw, knots, "two_extremes", d=12)
    out = K.a12_accumulate(
        *(jnp.asarray(a) for a in args_a), num_pix=hw, dim_pose=dim_pose,
        order=4,
    )
    out = K.a12_accumulate(
        *(jnp.asarray(a) for a in args_b), num_pix=hw, dim_pose=dim_pose,
        order=4, carry=out,
    )
    cat = [np.concatenate([a, b], axis=-1) for a, b in zip(args_a, args_b)]
    ref = K.a12_accumulate(
        *(jnp.asarray(a) for a in cat), num_pix=hw, dim_pose=dim_pose,
        order=4,
    )
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3
        )


def test_kernel_tiny_n():
    rng = np.random.default_rng(1)
    check(make_inputs(rng, 3, 1024, 5, "uniform"), 1024, 5)


def test_kernel_extreme_bit_pattern_indices():
    """Boundary knot indices of the FTZ-proof packing (i_c up to
    MAX_SEG_IC - 1 drives the f32 exponent field to 0xFE; i_c = 0 with the
    NORM_FLAG gives exponent 0x80 — never a denormal or NaN, which TPU
    data paths would flush/canonicalize) must ride the bitcast payload row
    unchanged through sort/gather."""
    rng = np.random.default_rng(3)
    knots = K.MAX_SEG_IC + 1  # i_c up to MAX_SEG_IC - 1 (exponent 0xFE)
    args = make_inputs(rng, 400, 2048, knots, "uniform",
                       knot_lo=K.MAX_SEG_IC - 8)
    dim_pose = 3 * knots
    a12, px5, _a11b = K.a12_accumulate(
        *(jnp.asarray(a) for a in args), num_pix=2048, dim_pose=dim_pose,
        order=2,
    )
    pm_pix, i_c, i_p, Jc, Jp, dx, dy, e, wA = args
    dp_pad = K._round_up(dim_pose, 128)
    # a12 reference restricted to the touched columns (the full outer-product
    # reference at 2048 knots is needlessly slow)
    ref_a12 = np.zeros((K._round_up(2048, K.TILE_PX), 2 * dp_pad), np.float32)
    wdx, wdy = wA * dx, wA * dy
    for m in range(len(pm_pix)):
        for j in range(6):
            ref_a12[pm_pix[m], 3 * i_c[m] + j] += Jc[j, m] * wdx[m]
            ref_a12[pm_pix[m], 3 * i_p[m] + j] += Jp[j, m] * wdx[m]
            ref_a12[pm_pix[m], dp_pad + 3 * i_c[m] + j] += Jc[j, m] * wdy[m]
            ref_a12[pm_pix[m], dp_pad + 3 * i_p[m] + j] += Jp[j, m] * wdy[m]
    np.testing.assert_allclose(np.asarray(a12), ref_a12, atol=2e-3)


def test_kernel_carry_chains_in_place():
    """Chained calls through the aliased ``carry`` (the streamed-forming
    accumulation path) must equal one call over the concatenated
    measurement set."""
    rng = np.random.default_rng(5)
    hw, knots = 2048, 10
    dim_pose = 3 * knots
    args_a = make_inputs(rng, 1500, hw, knots, "uniform")
    args_b = make_inputs(rng, 700, hw, knots, "two_extremes")
    out = K.a12_accumulate(
        *(jnp.asarray(a) for a in args_a), num_pix=hw, dim_pose=dim_pose,
        order=2,
    )
    out = K.a12_accumulate(
        *(jnp.asarray(a) for a in args_b), num_pix=hw, dim_pose=dim_pose,
        order=2, carry=out,
    )
    cat = [np.concatenate([a, b], axis=-1) for a, b in zip(args_a, args_b)]
    ref = K.a12_accumulate(
        *(jnp.asarray(a) for a in cat), num_pix=hw, dim_pose=dim_pose,
        order=2,
    )
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-3
        )


def test_kernel_rejects_too_many_knots():
    rng = np.random.default_rng(4)
    args = make_inputs(rng, 16, 1024, 8, "uniform")
    with pytest.raises(ValueError, match="dim_pose"):
        K.a12_accumulate(
            *(jnp.asarray(a) for a in args), num_pix=1024,
            dim_pose=3 * (K.MAX_KNOTS + 1), order=2,
        )


def test_streamed_pallas_matches_streamed_xla():
    """The streamed forming pass through the Pallas producer (interpret
    mode here) must equal the streamed XLA-scatter producer (f32)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from emba_tpu import model as M
    from emba_tpu import pairing, synth

    rng = np.random.default_rng(21)
    sensor = synth.default_sensor(32, 32, f=30.0)
    scene = synth.generate(
        rng, sensor, pano_width=128, pano_height=64, c_th=0.15, t_end=0.4,
        dt_knots=0.05, num_steps=100, motion_amp=0.2,
    )
    cfg = M.ModelConfig(
        c_th=0.15, pano_width=128, pano_height=64, thres_valid_pixel=2,
        alpha=1.0, stream_chunk=977,
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width,
        scene.traj.locate, 100,
    )
    dev = M.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float32
    )
    knots = jnp.asarray(scene.traj.knots, jnp.float32)
    Gx = jnp.asarray(scene.gx, jnp.float32)
    Gy = jnp.asarray(scene.gy, jnp.float32)
    nk = scene.traj.num_knots

    _, nem = M.cost_and_activity_streamed(knots, Gx, Gy, dev, cfg)
    neq_x = M.form_normal_eq_streamed(nem, knots, Gx, Gy, dev, cfg, nk)
    cfg_p = dc.replace(cfg, use_pallas=True)
    neq_p = M.form_normal_eq_streamed(nem, knots, Gx, Gy, dev, cfg_p, nk)
    np.testing.assert_allclose(
        np.asarray(neq_p.A11), np.asarray(neq_x.A11), rtol=2e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(neq_p.A12), np.asarray(neq_x.A12), rtol=2e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(neq_p.b2_x), np.asarray(neq_x.b2_x), rtol=2e-5, atol=2e-4
    )
