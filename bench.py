"""Benchmark: events/s through the BA inner loop (the reference's three
instrumented phases — normal-equation forming, solving, objective
evaluation; src/emba/solver.cpp:105-151, 181-222, 242-294) on a
reference-scale problem (1024x512 pano, ~0.1M-4M events, 97 control poses —
SURVEY.md §6 sizing).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "events/s", "vs_baseline": N}

vs_baseline compares against a single-threaded CPU run of the same
algorithm (XLA CPU, 1 thread — a stand-in for the reference's single-
threaded C++/Eigen, which is not buildable here without ROS). Target from
BASELINE.md: >= 10x.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")

# Problem scale (override via env for experiments)
SENSOR = int(os.environ.get("BENCH_SENSOR", "128"))
PANO_H = int(os.environ.get("BENCH_PANO_H", "512"))
NUM_STEPS = int(os.environ.get("BENCH_STEPS", "600"))
T_END = float(os.environ.get("BENCH_T_END", "4.8"))
C_TH = float(os.environ.get("BENCH_C_TH", "0.1"))
MAX_EVENTS = int(os.environ.get("BENCH_MAX_EVENTS", "2000000"))
LM_ITERS = int(os.environ.get("BENCH_LM_ITERS", "8"))
# CPU proxy baseline: SAME event count as the TPU measurement (like-for-like
# shape; iterations are subsampled instead — events/s normalizes per
# iteration), f64 single-thread.
CPU_EVENTS = int(os.environ.get("BENCH_CPU_EVENTS", str(MAX_EVENTS)))
CPU_LM_ITERS = int(os.environ.get("BENCH_CPU_LM_ITERS", "1"))

# Persistent compile cache: the remote TPU compile path is slow (10s-100s
# per program); cache across bench runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(CACHE_DIR, "jaxcache")
)


def _log(msg):
    print(f"# bench: {msg}", file=sys.stderr, flush=True)


def build_dataset():
    """Synthesize (and cache) the benchmark event stream."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    key = f"s{SENSOR}_p{PANO_H}_n{NUM_STEPS}_t{T_END}_c{C_TH}"
    path = os.path.join(CACHE_DIR, f"bench_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return {k: z[k] for k in z.files}
    from emba_tpu import synth

    rng = np.random.default_rng(7)
    sensor = synth.default_sensor(SENSOR, SENSOR, f=SENSOR * 0.9)
    B = synth.smooth_random_map(PANO_H, 2 * PANO_H, rng, smooth=4, amp=3.0)
    scene = synth.generate(
        rng,
        sensor,
        pano_width=2 * PANO_H,
        pano_height=PANO_H,
        c_th=C_TH,
        t_end=T_END,
        dt_knots=0.05,
        num_steps=NUM_STEPS,
        motion_amp=0.22,
        brightness=B,
    )
    data = dict(
        t=scene.t,
        x=scene.x,
        y=scene.y,
        pol=scene.pol,
        gx=scene.gx,
        gy=scene.gy,
        knots=scene.traj.knots,
        bearing_lut=sensor.bearing_lut(),
        t_beg=np.float64(0.0),
        dt_knots=np.float64(0.05),
        sensor_width=np.int64(SENSOR),
    )
    np.savez_compressed(path, **data)
    return data


def run_ba(data, dtype_str: str, lm_iters: int, max_events: int):
    """Run the LM BA loop; return per-phase stats."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from emba_tpu import model, pairing, solver, spline

    n = min(len(data["t"]), max_events)
    dtype = jnp.float32 if dtype_str == "float32" else jnp.float64
    if dtype_str == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(CACHE_DIR, "jaxcache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    knots = np.asarray(data["knots"])
    traj = spline.Trajectory(
        t_beg=float(data["t_beg"]), dt=float(data["dt_knots"]), knots=knots, order=2
    )
    # perturbed init so the solver does real work
    rng = np.random.default_rng(1)
    steps = rng.normal(size=(traj.num_knots, 3)) * 0.01
    walk = np.cumsum(steps, axis=0)
    walk -= walk[0]
    traj0 = dataclasses.replace(traj, knots=spline._np_exp(walk) @ knots)

    pano_h, pano_w = data["gx"].shape
    cfg = model.ModelConfig(
        c_th=C_TH,
        pano_width=pano_w,
        pano_height=pano_h,
        thres_valid_pixel=3,
        alpha=0.5,
        outlier_dp_norm=3.0,
        # Pallas sorted-accumulation kernel for A12 (TPU, f32): ~3x faster
        # normal-eq forming than the XLA scatter.
        use_pallas=(jax.default_backend() == "tpu" and dtype_str == "float32"),
        # Active-pixel compaction: solve only observed pixels. Essential at
        # 4K panoramas (BENCH_PANO_H=2048: 8.4M pixels, ~97% never observed).
        compact_cap=(int(os.environ["BENCH_COMPACT_CAP"])
                     if "BENCH_COMPACT_CAP" in os.environ else None),
        # Streamed forming (chunk-recomputed Jacobians): required for
        # 10^7-10^8-event windows; also usable at smaller scales.
        stream_chunk=(int(os.environ["BENCH_STREAM_CHUNK"])
                      if "BENCH_STREAM_CHUNK" in os.environ else None),
        # Streaming tier (mirrors the pipeline default: zero-residency FULL
        # — the measured-faster tier at every scale; see pipeline.run).
        stream_light=os.environ.get("BENCH_STREAM_LIGHT") == "1",
        # Light-trial classic LM: cost-only trials, relinearize-on-accept.
        light_trial=os.environ.get("BENCH_LIGHT_TRIAL") == "1",
    )
    win = pairing.build_window(
        data["t"][:n], data["x"][:n], data["y"][:n], data["pol"][:n],
        int(data["sensor_width"]), traj0.locate, 100,
    )
    dev = model.DeviceWindow.from_window(
        win, data["bearing_lut"], int(data["sensor_width"]), dtype,
        pad_multiple=cfg.stream_chunk or 1,
    )
    Gx = jnp.asarray(data["gx"], dtype)
    Gy = jnp.asarray(data["gy"], dtype)
    k0 = jnp.asarray(traj0.knots, dtype)

    fused = os.environ.get("BENCH_FUSED", "1") == "1"
    if fused:
        damping = jnp.asarray(1.0, dtype)
        tolf = jnp.asarray(0.0, dtype)  # disable early convergence
        # warm the host-loop programs too (used for the phase breakdown)
        solver.solve_window(
            k0, Gx, Gy, dev, cfg, solver.LMConfig(max_num_iter=1),
            fix_first=True,
        )
        # warmup (compile): max_num_iter is static, so warm with the SAME
        # value as the timed call
        out = solver.solve_window_fused(
            k0, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
            max_num_iter=lm_iters,
        )
        jax.block_until_ready(out[0])
        float(out[3])
        t0 = time.perf_counter()
        kf, gxf, gyf, cost_min, it, conv = solver.solve_window_fused(
            k0, Gx, Gy, dev, cfg, damping, tolf, fix_first=True,
            max_num_iter=lm_iters,
        )
        n_it = int(it)
        cost_last = float(cost_min)
        wall = time.perf_counter() - t0
        total_eps = n * n_it / wall
        # phase breakdown from one host-driven solve (already warm)
        _k, _gx, _gy, stats = solver.solve_window(
            k0, Gx, Gy, dev, cfg, solver.LMConfig(max_num_iter=lm_iters),
            fix_first=True,
        )
        phases = stats.events_per_second()
        phases["total_host_loop"] = phases.pop("total")
        phases["total"] = total_eps
        phases["mode"] = "fused"
        # form/solve/objective are separate value-fetch-synced jitted calls
        # from the host-driven loop; "total" is the fused one-program wall.
        phases["sync"] = "value-fetch"
        roofline = _roofline(data, cfg, k0, Gx, Gy, dev, stats, wall, n, n_it)
        return dict(
            num_events=n,
            lm_iterations=n_it,
            wall_s=wall,
            events_per_s=phases,
            cost_first=stats.iterations[0]["cost_min"],
            cost_last=cost_last,
            roofline=roofline,
        )

    # Warm up ALL jitted phases with a 1-iteration throwaway solve
    # (excludes compile time — which goes through a slow remote service —
    # from the measurement).
    _k, _gx, _gy, _st = solver.solve_window(
        k0, Gx, Gy, dev, cfg, solver.LMConfig(max_num_iter=1), fix_first=True,
    )
    del _k, _gx, _gy, _st

    t0 = time.perf_counter()
    kf, gxf, gyf, stats = solver.solve_window(
        k0, Gx, Gy, dev, cfg, solver.LMConfig(max_num_iter=lm_iters),
        fix_first=True,
    )
    wall = time.perf_counter() - t0
    eps = stats.events_per_second()
    return dict(
        num_events=stats.num_events,
        lm_iterations=len(stats.iterations),
        wall_s=wall,
        events_per_s=eps,
        cost_first=stats.iterations[0]["cost_min"],
        cost_last=stats.iterations[-1]["cost_min"],
    )


# Dense matmul peak FLOP/s per chip generation (public spec sheets; bf16
# MXU peak — the Pallas forming kernel and XLA GEMMs run bf16 multiplies
# with f32 accumulation, so this is the relevant ceiling).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def _roofline(data, cfg, k0, Gx, Gy, dev, stats, fused_wall, n, n_it_fused):
    """MFU / roofline estimate (BASELINE.md asks for hardware utilization,
    not only a CPU-relative speedup): per-phase FLOPs from XLA's OWN cost
    model on the exact compiled phase programs (``compiled.cost_analysis()``
    — the actual HLO, so kernel/layout changes are tracked automatically),
    multiplied by the host-loop phase counts and divided by the measured
    walls, against the chip's dense-matmul peak.

    Returns None when the backend exposes no cost analysis."""
    import jax

    from emba_tpu import model as M
    from emba_tpu import solver

    def flops_of(lowered):
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    try:
        num_knots = k0.shape[0]
        streamed = cfg.stream_chunk is not None
        # The Pallas accumulation kernel is an opaque custom call whose GEMMs
        # XLA's cost model does NOT count — add its statically-known FLOPs
        # (kernels.a12_accum.kernel_flops: hi/lo GEMM passes + one-hot
        # expansion, exact grid) so forming FLOPs/MFU are complete.
        f_kernel = 0.0
        if cfg.use_pallas and str(Gx.dtype) == "float32":
            from emba_tpu.kernels.a12_accum import kernel_flops

            n_pad = int(dev.pol_signed.shape[0])
            rows = cfg.compact_cap or cfg.num_pix
            if streamed:
                sc = cfg.stream_chunk
                f_kernel = (n_pad // sc) * kernel_flops(
                    sc, rows, 3 * num_knots, cfg.spline_order
                )
            else:
                f_kernel = kernel_flops(
                    n_pad, rows, 3 * num_knots, cfg.spline_order
                )
        if streamed:
            lin = M.linearize(k0, Gx, Gy, dev, cfg, False)
            aux = lin if cfg.stream_light else lin.num_ev_map
            f_form = flops_of(M.form_normal_eq_streamed.lower(
                aux, k0, Gx, Gy, dev, cfg, num_knots
            ))
            pb, pbid = M.prev_records(dev)
            obj_fn = (solver._init_costs_light if cfg.stream_light
                      else solver._init_costs_streamed)
            f_obj = flops_of(obj_fn.lower(k0, Gx, Gy, dev, cfg, pb, pbid))
            neq = M.form_normal_eq_streamed(aux, k0, Gx, Gy, dev, cfg,
                                            num_knots)
        elif cfg.light_trial:
            lin = M.linearize(k0, Gx, Gy, dev, cfg, False)
            f_form = flops_of(M.form_normal_eq_light.lower(
                lin, k0, Gx, Gy, dev, cfg, num_knots
            ))
            f_obj = flops_of(
                solver._init_costs_trial.lower(k0, Gx, Gy, dev, cfg)
            )
            neq = M.form_normal_eq_light(lin, k0, Gx, Gy, dev, cfg, num_knots)
        else:
            lin = M.linearize(k0, Gx, Gy, dev, cfg, True)
            f_form = flops_of(M.form_normal_eq.lower(lin, Gx, Gy, cfg,
                                                     num_knots))
            f_obj = flops_of(solver._init_costs.lower(k0, Gx, Gy, dev, cfg))
            neq = M.form_normal_eq(lin, Gx, Gy, cfg, num_knots)
        f_form += f_kernel
        import jax.numpy as jnp

        lam = jnp.asarray(1e-3, Gx.dtype)
        f_solve = flops_of(solver._solve_update.lower(
            k0, Gx, Gy, neq, lam, jnp.asarray(1.0, Gx.dtype), True, False
        ))

        kind = jax.devices()[0].device_kind.lower()
        peak = next(
            (v for k, v in PEAK_FLOPS.items() if k in kind), 197e12
        )
        # exact over the host loop (known per-phase counts AND walls)
        total_flops = (
            f_form * stats.count_form
            + f_solve * stats.count_solve
            + f_obj * stats.count_objective
        )
        host_wall = (
            stats.time_form_s + stats.time_solve_s + stats.time_objective_s
        )
        mfu_host = total_flops / host_wall / peak if host_wall > 0 else None
        # the fused loop runs the same phase programs inside one while_loop;
        # scale the host loop's average per-iteration FLOPs by the fused
        # iteration count over the fused wall (estimate: the fused accept/
        # reject path differs by at most one forming pass)
        per_iter = total_flops / max(stats.count_objective, 1)
        mfu_fused = per_iter * n_it_fused / fused_wall / peak
        return dict(
            flops_form=f_form,
            flops_form_pallas_kernel=f_kernel,
            flops_solve=f_solve,
            flops_objective=f_obj,
            flops_per_event_per_iter=per_iter / n,
            device_kind=jax.devices()[0].device_kind,
            peak_flops=peak,
            mfu_host_loop=mfu_host,
            mfu_fused_est=mfu_fused,
            note="FLOPs from XLA cost_analysis of the exact compiled phase "
            "programs, PLUS the Pallas accumulation kernel's statically-"
            "known executed FLOPs (kernels.a12_accum.kernel_flops: hi/lo "
            "GEMM passes + one-hot strip expansion over the exact compiled "
            "grid — the custom call is opaque to the cost model). Peak = "
            "dense-MXU spec for the chip. MFU here measures hardware "
            "utilization of the chosen one-hot GEMM formulation, not the "
            "minimal algorithmic flops of the scatter it replaces.",
        )
    except Exception as e:  # noqa: BLE001
        _log(f"roofline unavailable: {e}")
        return None


def main():
    if "--cpu-baseline" in sys.argv:
        data = build_dataset()
        res = run_ba(data, "float64", CPU_LM_ITERS, CPU_EVENTS)
        print(json.dumps(res))
        return

    _log("building/loading dataset")
    data = build_dataset()

    # CPU baseline in a subprocess (single-threaded XLA CPU, f64 — proxy for
    # the reference's single-threaded C++/Eigen).
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_cpu_multi_thread_eigen=false"
    env["OMP_NUM_THREADS"] = "1"
    env["OPENBLAS_NUM_THREADS"] = "1"
    baseline_eps = None
    # cache keyed by the baseline problem shape (same-shape contract)
    baseline_cache = os.path.join(
        CACHE_DIR, f"cpu_baseline_s{SENSOR}_p{PANO_H}_n{CPU_EVENTS}.json"
    )
    if not os.path.exists(baseline_cache):
        # committed fallback measurement (docs/) so a cold start doesn't
        # spend ~20 min re-measuring the CPU proxy
        committed = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "docs",
            f"cpu_baseline_s{SENSOR}_p{PANO_H}_n{CPU_EVENTS}.json",
        )
        if os.path.exists(committed):
            baseline_cache = committed
    if os.path.exists(baseline_cache):
        with open(baseline_cache) as f:
            baseline_eps = json.load(f)["events_per_s"]["total"]
        _log(f"cpu baseline (cached): {baseline_eps:.3g} ev/s")
    elif os.environ.get("BENCH_SKIP_CPU") != "1":
        _log("running CPU baseline subprocess")
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = out.stdout.strip().splitlines()[-1]
            baseline = json.loads(line)
            baseline_eps = baseline["events_per_s"]["total"]
            with open(baseline_cache, "w") as f:
                json.dump(baseline, f)
            _log(f"cpu baseline: {baseline_eps:.3g} ev/s")
        except Exception as e:  # noqa: BLE001
            print(f"# cpu baseline failed: {e}", file=sys.stderr)

    _log("running TPU measurement")
    res = run_ba(data, "float32", LM_ITERS, MAX_EVENTS)
    value = res["events_per_s"]["total"]
    vs = value / baseline_eps if baseline_eps else None
    print(
        json.dumps(
            {
                "metric": "events_per_s_ba_inner_loop",
                "value": value,
                "unit": "events/s",
                "vs_baseline": vs,
                "detail": {
                    "num_events": res["num_events"],
                    "lm_iterations": res["lm_iterations"],
                    "lm_iters_per_s": res["lm_iterations"] / res["wall_s"],
                    "wall_s": res["wall_s"],
                    "phase_events_per_s": res["events_per_s"],
                    "cpu_baseline_events_per_s": baseline_eps,
                    "cost_first": res["cost_first"],
                    "cost_last": res["cost_last"],
                    "roofline": res.get("roofline"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
