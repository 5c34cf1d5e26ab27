"""Round-5 probe: keying-neutral remap scoring for multi-start selection.

Scores each multi-start candidate TRAJECTORY by the data cost of a freshly
solved closed-form map under the fixed curr evaluation model
(model.solve_map_only), to test whether the boxes selector miss was a
map-keying artifact. Measured NEGATIVE (docs/remap_selection_probe_r5.json):
the remap score still ranks curr+c2f above mid+c2f, so the photometric
landscape itself prefers the wrong basin there and the direct selection
stays the implementation.

Usage (TPU): python scripts/r5_remap_selection_probe.py
"""
import os, sys, json, time, dataclasses
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jaxcache")
import numpy as np, jax.numpy as jnp
from emba_tpu import eval_suite as ES, model, pairing, solver, spline, synth, metrics
from emba_tpu.dist import pad_window

seed, motion, smooth, amp, duration = ES.ECROT_LIKE["ecd_boxes_like"]
rng = np.random.default_rng(seed)
cam = synth.default_sensor(240, 180, f=240*0.9)
B = synth.smooth_random_map(512, 1024, rng, smooth, amp)
scene = synth.generate(rng, cam, pano_width=1024, pano_height=512, c_th=0.2,
                       t_end=duration, dt_knots=0.05, num_steps=1500,
                       motion_amp=motion, brightness=B)
print("scene done", len(scene.t), flush=True)
import jax
cfg = model.ModelConfig(c_th=0.2, pano_width=1024, pano_height=512,
    thres_valid_pixel=3, alpha=0.5, outlier_dp_norm=3.0,
    use_pallas=(jax.default_backend() == "tpu"))
ev = (scene.t, scene.x, scene.y, scene.pol)
if len(ev[0]) > 4_000_000:
    from emba_tpu.pipeline import systematic_subsample
    ev = systematic_subsample(*ev, int(np.ceil(len(ev[0]) / 4_000_000)))
steps = rng.normal(size=(scene.traj.num_knots, 3)) * 0.005
walk = np.cumsum(steps, axis=0); walk -= walk[0]
traj0 = dataclasses.replace(scene.traj, knots=spline._np_exp(walk) @ scene.traj.knots)
win = pairing.build_window(ev[0], ev[1], ev[2], ev[3], cam.width, traj0.locate, 100)
dev = model.DeviceWindow.from_window(win, cam.bearing_lut(), cam.width, jnp.float32)
dev = pad_window(dev, 1 << 17)
print("window done", win.num_events, flush=True)
tt = np.linspace(0.02*duration, 0.98*duration, 300)
R_gt = np.asarray(scene.traj.evaluate(tt))

cfg_eval = dataclasses.replace(cfg, sample_mode="curr")
z = jnp.zeros((512, 1024), jnp.float32)
for sm, c2f in (("curr", False), ("mid", False), ("curr", True), ("mid", True)):
    t0 = time.perf_counter()
    vcfg = dataclasses.replace(cfg, sample_mode=sm)
    k0 = jnp.asarray(traj0.knots, jnp.float32)
    if c2f:
        cfg_c = dataclasses.replace(vcfg, pano_width=512, pano_height=256, outlier_dp_norm=1.5)
        def pool2(g):
            h, w = g.shape
            return 2.0*g.reshape(h//2,2,w//2,2).mean(axis=(1,3))
        k0, _, _, _ = solver.solve_window(k0, jnp.asarray(pool2(scene.gx), jnp.float32),
            jnp.asarray(pool2(scene.gy), jnp.float32), dev, cfg_c,
            solver.LMConfig(max_num_iter=50), fix_first=True)
    kv, gxv, gyv, stv = solver.solve_window(k0, jnp.asarray(scene.gx, jnp.float32),
        jnp.asarray(scene.gy, jnp.float32), dev, vcfg,
        solver.LMConfig(max_num_iter=50), fix_first=True)
    t1 = time.perf_counter()
    _ge, _gy2, costs_e = model.solve_map_only(kv, z, z, dev, cfg_eval, num_iters=1)
    t2 = time.perf_counter()
    trajR = dataclasses.replace(traj0, knots=np.asarray(kv, np.float64))
    print(f"{sm} c2f={c2f}: solve {t1-t0:.0f}s, remap-score {t2-t1:.0f}s, "
      f"score {costs_e[-1]:.1f}, rmse {metrics.trajectory_rmse_deg(trajR, tt, R_gt):.3f}", flush=True)
