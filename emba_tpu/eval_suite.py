"""Synthetic evaluation suite: the stand-in for the ECRot accuracy contract.

The real ECRot/ECD bags cannot be downloaded in this sandbox (zero egress),
so this suite renders six synthetic rotating-camera sequences (different
textures/motions), perturbs the GT trajectory like an imperfect front-end,
runs the full BA, and reports rotation RMSE (init -> refined) plus the
event-based photometric error (init -> refined) — the two quantities of the
paper's "Quantitative Results" table (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax.numpy as jnp
import numpy as np

from . import metrics, model, pairing, solver, spline, synth

SEQUENCES = {
    # name: (seed, motion_amp, texture_smooth, texture_amp, duration)
    "synth_slow": (1, 0.15, 3, 3.0, 1.0),
    "synth_medium": (2, 0.25, 3, 3.0, 1.0),
    "synth_fast": (3, 0.40, 3, 3.0, 1.0),
    "synth_fine_texture": (4, 0.25, 2, 3.5, 1.0),
    "synth_coarse_texture": (5, 0.25, 5, 2.5, 1.0),
    "synth_long": (6, 0.25, 3, 3.0, 2.0),
}

# ECRot-shaped suite: DAVIS240-like sensor (240x180), 1024x512 panorama,
# 4.8 s BA span, dt_knots 0.05 (97 knots) — the reference experiments'
# problem shape (launch/bicycle.launch, SURVEY.md §6).
ECROT_LIKE = {
    "ecrot_bicycle_like": (11, 0.22, 3, 3.0, 4.8),
    "ecrot_city_like": (12, 0.30, 2, 3.5, 4.8),
    "ecrot_street_like": (13, 0.18, 3, 3.0, 4.8),
    "ecrot_town_like": (14, 0.26, 4, 2.8, 4.8),
    "ecrot_bay_like": (15, 0.22, 5, 2.5, 4.8),
    "ecrot_playroom_like": (16, 0.35, 3, 3.0, 2.3),
    # ECD-like rows (shapes/poster/boxes/dynamic presets use 10 s windows;
    # we render 4.8 s at matched texture character to bound runtime)
    "ecd_shapes_like": (17, 0.28, 8, 3.5, 4.8),
    "ecd_poster_like": (18, 0.24, 2, 3.8, 4.8),
    "ecd_boxes_like": (19, 0.24, 3, 3.2, 4.8),
    "ecd_dynamic_like": (20, 0.20, 4, 3.0, 4.8),
}


def run_sequence(
    name: str,
    seed: int,
    motion: float,
    smooth: int,
    amp: float,
    duration: float,
    pano_height: int = 128,
    sensor: int = 48,
    sensor_h: int | None = None,
    perturb: float = 0.02,
    max_iter: int = 30,
    num_steps: int | None = None,
    c_th: float = 0.1,
    dtype=None,
    max_events: int = 4_000_000,
    stream_over: int = 8_000_000,
    stream: bool | None = None,
    stream_light: bool = False,
    compact_cap: int | None = None,
    outlier_dp: float = 3.0,
    spline_order: int = 2,
    light_trial: bool = False,
    alpha: float = 0.5,
    sample_mode: str = "curr",
    coarse_to_fine: bool = False,
    irls: str | None = None,
    eta: float = 1.0,
    contaminate: float = 0.0,
    multi_start: bool = False,
) -> dict:
    """``stream``: force streamed forming on/off (None = auto by event count
    vs ``stream_over``); ``stream_light`` picks the resident-light tier.
    ``compact_cap`` enables active-pixel compaction (4K-pano rows).
    ``outlier_dp``: pairing-displacement outlier cut in PANO PIXELS — scale
    with pano resolution (3 px at 512-high is 12 px at 2048-high; the
    reference uses 10 px at 1024, model.cpp:200). ``spline_order=4`` refits
    the GT trajectory as a cubic spline (reference CubicTrajectory) and
    runs the BA with D=12 blocks. ``light_trial``: cost-only LM trials
    (relinearize-on-accept). ``sample_mode``: LEGM map sampling point —
    "curr" (reference) or "mid" (midpoint quadrature,
    ModelConfig.sample_mode). ``coarse_to_fine``: pre-solve the pose at a
    HALF-resolution pano (|dp| in pixels halves — exactly the LEGM
    linearization's validity axis) and refine at full resolution from the
    coarse-refined knots; wall/iteration counts cover both stages.
    ``irls``: "huber"/"cauchy" robust cost with scale ``eta`` (reference
    model.cpp:493-687). ``contaminate``: inject this fraction of noise
    events — half hot-pixel bursts (a few stuck pixels firing constantly),
    half uniform salt events — the data regime IRLS exists for.
    ``multi_start``: run all four (sample_mode x coarse_to_fine) variants
    and keep the one with the lowest refined photometric error under the
    reference evaluation model (GT-free selection; ``selected_variant`` is
    reported; wall/iterations cover all starts)."""
    if dtype is None:
        dtype = jnp.float32
    rng = np.random.default_rng(seed)
    cam = synth.default_sensor(
        sensor, sensor_h if sensor_h else sensor, f=sensor * 0.9
    )
    B = synth.smooth_random_map(pano_height, 2 * pano_height, rng, smooth, amp)
    scene = synth.generate(
        rng,
        cam,
        pano_width=2 * pano_height,
        pano_height=pano_height,
        c_th=c_th,
        t_end=duration,
        dt_knots=0.05,
        num_steps=num_steps if num_steps else int(600 * duration),
        motion_amp=motion,
        brightness=B,
    )
    import jax

    cfg = model.ModelConfig(
        c_th=c_th,
        pano_width=2 * pano_height,
        pano_height=pano_height,
        thres_valid_pixel=3,
        alpha=alpha,
        outlier_dp_norm=outlier_dp,
        spline_order=spline_order,
        light_trial=light_trial,
        sample_mode=sample_mode,
        use_irls=irls is not None,
        cost_type=irls or "quadratic",
        eta=eta,
        use_pallas=(jax.default_backend() == "tpu" and dtype == jnp.float32),
    )
    base_traj = scene.traj
    if spline_order != 2:
        # refit GT as an order-`spline_order` spline (lift-QR-retract chunked
        # long fit, reference trajectory.cpp:481-626)
        tt_f = np.linspace(0.0, duration, max(int(duration * 400), 50))
        R_f = np.asarray(scene.traj.evaluate(tt_f))
        base_traj = spline.Trajectory.from_poses(
            tt_f, R_f, 0.0, duration, 0.05, order=spline_order
        )
    # Systematic subsampling to a memory budget (the reference's
    # event_sampling_rate, emba.cpp:282-304; its docs recommend it exactly
    # when memory runs out). With streamed forming this is OPTIONAL here —
    # pass max_events=0 to run the full stream un-subsampled (windows past
    # ``stream_over`` events auto-enable chunk-recomputed Jacobians).
    ev = (scene.t, scene.x, scene.y, scene.pol)
    if max_events and len(scene.t) > max_events:
        from .pipeline import systematic_subsample

        rate = int(np.ceil(len(scene.t) / max_events))
        ev = systematic_subsample(*ev, rate)
    if contaminate:
        # Injected gross errors that SURVIVE the |dp| outlier gate (purely
        # positional noise is already rejected by it — measured): half
        # polarity FLIPS (residual jumps by 2 C_th at a valid pair — the
        # classic gross error), half same-polarity BURST duplicates (a
        # positive copy of a random event ~0.01-1 ms later — the hot-pixel
        # signature; the burst pairs at near-zero |dp| with a wrong
        # increment and corrupts its pixel's pairing chain). Trajectory/GT
        # untouched — the robust-cost capability regime
        # (model.cpp:493-687). NOTE the measured robustness floor: the
        # joint solve's per-pixel map DOF absorb event-level corruption, so
        # quadratic BA is unharmed below ~20% contamination; robust costs
        # separate only once the gross errors dominate the LEGM model-error
        # residual floor (docs/suite_table_ecrot_r5.md).
        crng = np.random.default_rng(seed + 1000)
        n_noise = int(contaminate * len(ev[0]))
        pol_c = np.array(ev[3], copy=True)
        idx_f = crng.choice(len(pol_c), size=n_noise // 2, replace=False)
        pol_c[idx_f] = 1 - pol_c[idx_f]
        n_b = n_noise - len(idx_f)
        idx_b = crng.integers(0, len(pol_c), size=n_b)
        bt = ev[0][idx_b] + crng.uniform(1e-5, 1e-3, size=n_b)
        order = np.argsort(np.concatenate([ev[0], bt]), kind="stable")
        ev = (
            np.concatenate([ev[0], bt])[order],
            np.concatenate([ev[1], ev[1][idx_b]])[order],
            np.concatenate([ev[2], ev[2][idx_b]])[order],
            np.concatenate(
                [pol_c, np.ones(n_b, pol_c.dtype)]
            )[order],
        )
    if stream if stream is not None else len(ev[0]) > stream_over:
        cfg = dataclasses.replace(
            cfg, stream_chunk=1 << 20, stream_light=stream_light
        )
    if compact_cap:
        cfg = dataclasses.replace(cfg, compact_cap=compact_cap)

    # front-end-like perturbation: smooth random walk on the knots
    steps = rng.normal(size=(base_traj.num_knots, 3)) * perturb
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(
        base_traj, knots=spline._np_exp(walk) @ base_traj.knots
    )
    win = pairing.build_window(
        ev[0], ev[1], ev[2], ev[3], cam.width, traj0.locate, 100
    )
    # Pre-pad streamed windows to a chunk multiple (as the pipeline does):
    # the streamed passes then hold ZERO padded per-event copies — without
    # this, a 4M-chunked 40M-event window carries ~GBs of padded temps and
    # OOMs the host-loop forming program.
    dev = model.DeviceWindow.from_window(
        win, cam.bearing_lut(), cam.width, dtype,
        pad_multiple=cfg.stream_chunk or 1,
    )
    # Bucket the event count so sequences share compiled programs (remote
    # compiles cost minutes; padded events are masked out).
    from .dist import pad_window

    dev = pad_window(dev, max(1 << 17, cfg.stream_chunk or 1))
    tt = np.linspace(0.02 * duration, 0.98 * duration, 300)
    R_gt = np.asarray(scene.traj.evaluate(tt))

    # photometric error at init
    lin0 = model.linearize(
        jnp.asarray(traj0.knots, dtype),
        jnp.asarray(scene.gx, dtype),
        jnp.asarray(scene.gy, dtype),
        dev,
        cfg,
        need_deriv=False,
    )
    pe0 = metrics.photometric_error(lin0.e)

    t0 = time.perf_counter()

    def pool2(g):
        h, w = g.shape
        return 2.0 * g.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    def solve_variant(sm: str, c2f: bool):
        """One BA solve with the given sampling mode / coarse-to-fine
        choice. Returns (knots, Gx, Gy, st, iters)."""
        vcfg = dataclasses.replace(cfg, sample_mode=sm)
        knots0 = jnp.asarray(traj0.knots, dtype)
        coarse_iters = 0
        if c2f:
            # Stage 1: pose at HALF pano resolution. |dp| in pixels halves
            # — the LEGM linearization's systematic-error axis — so the
            # coarse stage pulls the pose through the large-|dp| regime
            # before the full-resolution refine. The DeviceWindow is
            # pano-independent (bearings + pairing only), so both stages
            # share it. The init map is the full-res init pooled 2x
            # (gradient per big pixel = 2x the block-average of the
            # small-pixel gradients).
            cfg_c = dataclasses.replace(
                vcfg,
                pano_width=pano_height,
                pano_height=pano_height // 2,
                outlier_dp_norm=max(0.5 * outlier_dp, 1.5),
            )
            knots0, _, _, st_c = solver.solve_window(
                knots0,
                jnp.asarray(pool2(scene.gx), dtype),
                jnp.asarray(pool2(scene.gy), dtype),
                dev,
                cfg_c,
                solver.LMConfig(max_num_iter=max_iter),
                fix_first=True,
            )
            coarse_iters = len(st_c.iterations)
        k, gx, gy, st_v = solver.solve_window(
            knots0,
            jnp.asarray(scene.gx, dtype),
            jnp.asarray(scene.gy, dtype),
            dev,
            vcfg,
            solver.LMConfig(max_num_iter=max_iter),
            fix_first=True,
        )
        return k, gx, gy, st_v, coarse_iters + len(st_v.iterations)

    if multi_start:
        # MULTI-START BA with photometric selection: the LEGM cost
        # landscape has multiple basins on high-texture/large-|dp|
        # problems, and the four variants (sampling mode x coarse-to-fine)
        # act as independent starts that escape different ones. The
        # refined PHOTOMETRIC error under ONE fixed evaluation model (the
        # reference "curr" sampling) selects the winner — GT-free, so this
        # is a production-usable capability, not an oracle pick (measured:
        # the photometric selector tracks the better-RMSE variant on 9/10
        # suite rows, docs/suite_table_ecrot_r5.md).
        cfg_eval = dataclasses.replace(cfg, sample_mode="curr")
        best = None
        total_iters = 0
        for sm, c2f in (("curr", False), ("mid", False), ("curr", True),
                        ("mid", True)):
            k, gx, gy, st_v, it_v = solve_variant(sm, c2f)
            total_iters += it_v
            lin_v = model.linearize(k, gx, gy, dev, cfg_eval,
                                    need_deriv=False)
            pe_v = metrics.photometric_error(lin_v.e)
            if best is None or pe_v < best[0]:
                best = (pe_v, sm, c2f, k, gx, gy, st_v)
        pe1, sel_sm, sel_c2f, knots, Gx, Gy, st = best
        iters = total_iters
        selected = sel_sm + ("+c2f" if sel_c2f else "")
    else:
        knots, Gx, Gy, st, iters = solve_variant(sample_mode, coarse_to_fine)
        lin1 = model.linearize(knots, Gx, Gy, dev, cfg, need_deriv=False)
        pe1 = metrics.photometric_error(lin1.e)
        selected = None
    wall = time.perf_counter() - t0
    st.num_events = win.num_events  # report real (unpadded) throughput
    trajR = dataclasses.replace(traj0, knots=np.asarray(knots, np.float64))

    out = dict(
        sequence=name,
        num_events=win.num_events,
        rmse_init_deg=metrics.trajectory_rmse_deg(traj0, tt, R_gt),
        rmse_refined_deg=metrics.trajectory_rmse_deg(trajR, tt, R_gt),
        photometric_init=pe0,
        photometric_refined=pe1,
        lm_iterations=iters,
        converged=st.converged,
        wall_s=wall,
        events_per_s=st.events_per_second()["total"],
    )
    if selected is not None:
        out["selected_variant"] = selected
    return out


def run_suite(out_path: str | None = None, sequences=None, **kw) -> list[dict]:
    results = []
    for name, (seed, motion, smooth, amp, duration) in (sequences or SEQUENCES).items():
        res = run_sequence(name, seed, motion, smooth, amp, duration, **kw)
        results.append(res)
        print(
            f"{name}: rmse {res['rmse_init_deg']:.3f} -> "
            f"{res['rmse_refined_deg']:.3f} deg | photometric "
            f"{res['photometric_init']:.1f} -> {res['photometric_refined']:.1f} "
            f"| {res['lm_iterations']} iters, {res['wall_s']:.1f}s",
            flush=True,
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


def run_ecrot_like(out_path: str | None = None, max_iter: int = 30, **kw):
    """The reference-shaped suite: 240x180 sensor, 1024x512 pano, 4.8 s.
    Pass max_events=0 to run the full (un-subsampled) event streams;
    max_iter=50 is the reference's launch-file regime."""
    return run_suite(
        out_path,
        sequences=ECROT_LIKE,
        pano_height=512,
        sensor=240,
        sensor_h=180,
        c_th=0.2,
        perturb=0.005,
        max_iter=max_iter,
        num_steps=1500,
        **kw,
    )


if __name__ == "__main__":
    import sys

    out = [a for a in sys.argv[1:] if not a.startswith("-")]
    kw = {"max_events": 0} if "--full" in sys.argv else {}
    if "--ecrot" in sys.argv:
        run_ecrot_like(out[0] if out else "suite_ecrot_like.json", **kw)
    else:
        run_suite(out[0] if out else "suite_results.json", **kw)
