"""Command-line interface (replaces the reference's ROS node + launch files,
``src/emba/node.cpp`` + ``launch/*.launch``).

Subcommands:
  run          full EMBA on a sequence (events + front-end trajectory [+ map])
  convert-bag  rosbag -> events.npz
  synth        generate a synthetic dataset (events + GT trajectory + maps)
  eval         rotation RMSE of a trajectory against ground truth
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _cmd_run(args):
    import jax

    if args.dtype == "float64":
        # without this, f64 requests silently truncate to f32
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from . import config as C
    from . import io as eio
    from . import rosbag as rb
    from .camera import PinholeCamera, load_camera_yaml
    from .pipeline import EmbaPipeline

    cfg = C.preset(args.preset) if args.preset else C.BAConfig()

    # Reference directory-layout mode (docs/execution.md in the reference;
    # emba.cpp:252-253,535-543 and pose_manager.cpp:47-51): given the three
    # root dirs + front-end name, derive all input paths.
    if args.dataset_root_dir or args.input_data_dir:
        if not args.preset:
            sys.exit("--dataset-root-dir/--input-data-dir require --preset")
        seq, ds = cfg.sequence, cfg.dataset
        ft = args.filename_raw_traj
        if args.dataset_root_dir and not args.events:
            args.events = f"{args.dataset_root_dir}/{ds}/{seq}/events.bag"
        if args.input_data_dir:
            if not args.poses:
                args.poses = (
                    f"{args.input_data_dir}/{ds}/{seq}/traj/interpolation/{ft}.txt"
                )
            map_dir = f"{args.input_data_dir}/{ds}/{seq}/map/frontend/{ft}/bin"
            if not args.map_gx and os.path.exists(f"{map_dir}/Gx.bin"):
                args.map_gx = f"{map_dir}/Gx.bin"
                args.map_gy = f"{map_dir}/Gy.bin"
    if not args.events or not args.poses:
        sys.exit("need --events and --poses (or the reference-layout dirs)")
    for k in (
        "start_time",
        "stop_time",
        "c_th",
        "alpha",
        "dt_knots",
        "max_num_iter",
        "event_sampling_rate",
        "pano_height",
        "dtype",
        "outlier_dp_norm",
        "sample_mode",
        "thres_valid_pixel",
        "compact_cap",
        "stream_chunk",
        "stream_light",
        "num_devices",
        "time_window_size",
        "sliding_window_stride",
        "super_res_height",
    ):
        v = getattr(args, k, None)
        if v is not None:
            setattr(cfg, k, v)
    if args.pano_height:
        cfg.pano_width = 2 * args.pano_height
    if args.use_cg:
        cfg.use_cg = True
    if getattr(args, "coarse_to_fine", False):
        cfg.coarse_to_fine = True
    if getattr(args, "multi_start", False):
        cfg.multi_start = True
    if args.irls:
        cfg.use_irls = True
        cfg.cost_type = args.irls
    if args.spline_order:
        cfg.spline_order = args.spline_order

    # --- events + camera ---------------------------------------------------
    cam_info = None
    if args.events.endswith(".bag"):
        (t, x, y, pol), cam_info = rb.parse_rosbag(
            args.events,
            args.events_topic,
            args.camera_info_topic,
            tmin=cfg.start_time + cfg.time_offset,
            tmax=cfg.stop_time + cfg.time_offset,
        )
    else:
        t, x, y, pol, _meta = eio.load_events_npz(args.events)

    if args.calib:
        camera = load_camera_yaml(args.calib)
    elif cam_info is not None:
        camera = PinholeCamera.from_calib(
            cam_info.width, cam_info.height, cam_info.K, cam_info.D, cam_info.R,
            cam_info.P,
        )
    else:
        sys.exit("need --calib YAML or a bag with camera_info")

    # --- front-end trajectory ----------------------------------------------
    times, rots = eio.load_tum_trajectory(args.poses, time_offset=cfg.time_offset)

    # Clamp the BA interval to the data actually available when the user did
    # not pin it explicitly (the reference requires start/stop in the launch
    # file, emba.cpp:76-80; defaults beyond the pose/event span would
    # otherwise fail spline fitting with an obscure "need >= 2 poses" error).
    span_end = float(min(times[-1], t[-1])) - cfg.time_offset
    span_start = float(max(times[0], t[0])) - cfg.time_offset
    if getattr(args, "stop_time", None) is None and cfg.stop_time > span_end:
        print(f"# clamping stop_time {cfg.stop_time} -> {span_end:.4f} "
              "(end of data)", file=sys.stderr)
        cfg.stop_time = span_end
    if getattr(args, "start_time", None) is None and cfg.start_time < span_start:
        print(f"# clamping start_time {cfg.start_time} -> {span_start:.4f} "
              "(start of data)", file=sys.stderr)
        cfg.start_time = span_start

    # --- initial map ---------------------------------------------------------
    gx = gy = None
    if args.map_gx and args.map_gy:
        gx, gy = eio.load_map_bin(args.map_gx, args.map_gy)
        cfg.init_map_available = True
    else:
        cfg.init_map_available = False

    pipe = EmbaPipeline(
        cfg,
        camera,
        (t, x, y, pol),
        times,
        rots,
        init_gx=gx,
        init_gy=gy,
        result_dir=args.out,
        record_data=args.out is not None,
        record_maps=args.record_maps,
    )
    from .obs import nan_debug, profiler_trace

    with nan_debug(args.debug_nans), profiler_trace(args.profile_dir):
        res = pipe.run(resume_from=args.resume)
    eps = res.window_stats[-1].events_per_second() if res.window_stats else {}
    print(
        json.dumps(
            {
                "windows": len(res.window_stats),
                "num_knots": res.trajectory.num_knots,
                "events_per_second": eps,
                "result_dir": res.result_dir,
            }
        )
    )


def _cmd_convert_bag(args):
    from . import io as eio
    from . import rosbag as rb

    (t, x, y, pol), cam = rb.parse_rosbag(
        args.bag, args.events_topic, args.camera_info_topic
    )
    eio.save_events_npz(args.out, t, x, y, pol)
    print(f"wrote {len(t)} events -> {args.out}")
    if cam is not None and args.calib_out:
        with open(args.calib_out, "w") as f:
            f.write(f"image_width: {cam.width}\nimage_height: {cam.height}\n")
            f.write("camera_matrix:\n  rows: 3\n  cols: 3\n")
            f.write(f"  data: [{', '.join(map(str, cam.K))}]\n")
            f.write(f"distortion_model: {cam.distortion_model}\n")
            f.write("distortion_coefficients:\n  rows: 1\n  cols: 5\n")
            f.write(f"  data: [{', '.join(map(str, cam.D))}]\n")
            f.write("rectification_matrix:\n  rows: 3\n  cols: 3\n")
            f.write(f"  data: [{', '.join(map(str, cam.R))}]\n")
            f.write("projection_matrix:\n  rows: 3\n  cols: 4\n")
            f.write(f"  data: [{', '.join(map(str, cam.P))}]\n")
        print(f"wrote calib -> {args.calib_out}")


def _cmd_synth(args):
    from . import io as eio
    from . import synth

    rng = np.random.default_rng(args.seed)
    sensor = synth.default_sensor(args.sensor, args.sensor, f=args.sensor * 0.9)
    # Sharp texture keeps inter-event displacements small — the regime the
    # LEGM linearization is accurate in (see .claude/skills/verify/SKILL.md).
    B = synth.smooth_random_map(
        args.pano_height, 2 * args.pano_height, rng, smooth=args.texture_smooth,
        amp=args.texture_amp,
    )
    scene = synth.generate(
        rng,
        sensor,
        pano_width=2 * args.pano_height,
        pano_height=args.pano_height,
        c_th=args.c_th,
        t_end=args.duration,
        dt_knots=0.05,
        num_steps=args.steps,
        motion_amp=args.motion,
        brightness=B,
    )
    os.makedirs(args.out, exist_ok=True)
    eio.save_events_npz(
        os.path.join(args.out, "events.npz"), scene.t, scene.x, scene.y, scene.pol
    )
    eio.save_map_bin(
        os.path.join(args.out, "Gx.bin"), os.path.join(args.out, "Gy.bin"),
        scene.gx, scene.gy,
    )
    tt = np.linspace(0.0, args.duration - 1e-6, 400)
    R = np.asarray(scene.traj.evaluate(tt))
    eio.save_tum_trajectory(os.path.join(args.out, "traj_gt.txt"), tt, R)
    with open(os.path.join(args.out, "calib.yaml"), "w") as f:
        f.write(
            f"image_width: {sensor.width}\nimage_height: {sensor.height}\n"
            "camera_matrix:\n  rows: 3\n  cols: 3\n"
            f"  data: [{', '.join(map(str, sensor.K.ravel()))}]\n"
            "distortion_model: plumb_bob\n"
            "distortion_coefficients:\n  rows: 1\n  cols: 5\n"
            "  data: [0, 0, 0, 0, 0]\n"
        )
    print(f"wrote {len(scene.t)} events + GT to {args.out}")


def _cmd_eval(args):
    from . import io as eio
    from . import metrics

    t_est, r_est = eio.load_tum_trajectory(args.traj)
    t_gt, r_gt = eio.load_tum_trajectory(args.gt)
    # interpolate GT at estimate times (clipped to the GT span)
    m = (t_est >= t_gt[0]) & (t_est <= t_gt[-1])
    t_q = t_est[m]
    import jax.numpy as jnp

    from . import lie

    idx = np.clip(np.searchsorted(t_gt, t_q) - 1, 0, len(t_gt) - 2)
    a = (t_q - t_gt[idx]) / np.maximum(t_gt[idx + 1] - t_gt[idx], 1e-12)
    r_interp = np.asarray(
        lie.slerp(jnp.asarray(r_gt[idx]), jnp.asarray(r_gt[idx + 1]), jnp.asarray(a))
    )
    rmse = metrics.rotation_rmse_deg(r_est[m], r_interp, align=not args.no_align)
    print(json.dumps({"rotation_rmse_deg": rmse, "num_poses": int(m.sum())}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="emba-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run EMBA on a sequence")
    r.add_argument("--preset", help="sequence preset (e.g. bicycle, playroom)")
    r.add_argument("--events", help="events .npz or .bag")
    r.add_argument("--poses", help="front-end TUM trajectory txt")
    r.add_argument(
        "--dataset-root-dir", dest="dataset_root_dir",
        help="reference-layout dataset root (events at <root>/<ds>/<seq>/events.bag)",
    )
    r.add_argument(
        "--input-data-dir", dest="input_data_dir",
        help="reference-layout input root (traj/interpolation + map/frontend)",
    )
    r.add_argument(
        "--filename-raw-traj", dest="filename_raw_traj",
        default="cmaxw_traj_interp",
        help="front-end trajectory name in the reference layout",
    )
    r.add_argument("--map-gx")
    r.add_argument("--map-gy")
    r.add_argument("--calib", help="camera calibration YAML")
    r.add_argument("--events-topic", default="/dvs/events")
    r.add_argument("--camera-info-topic", default="/dvs/camera_info")
    r.add_argument("--out", help="result directory")
    r.add_argument("--record-maps", action="store_true")
    r.add_argument("--resume", help="checkpoint.npz to resume from")
    r.add_argument("--start-time", dest="start_time", type=float)
    r.add_argument("--stop-time", dest="stop_time", type=float)
    r.add_argument("--c-th", dest="c_th", type=float)
    r.add_argument("--alpha", type=float)
    r.add_argument("--dt-knots", dest="dt_knots", type=float)
    r.add_argument("--max-num-iter", dest="max_num_iter", type=int)
    r.add_argument("--event-sampling-rate", dest="event_sampling_rate", type=int)
    r.add_argument("--pano-height", dest="pano_height", type=int)
    r.add_argument("--dtype", choices=["float32", "float64"])
    r.add_argument("--outlier-dp", dest="outlier_dp_norm", type=float)
    r.add_argument(
        "--sample-mode", dest="sample_mode", choices=["curr", "mid"],
        help="LEGM map sampling point: curr (reference) or mid "
        "(midpoint-rule quadrature, halves large-|dp| model error)",
    )
    r.add_argument(
        "--coarse-to-fine", action="store_true",
        help="half-resolution pose pre-solve per window before the "
        "full-resolution solve (pulls the pose through the large-|dp| "
        "regime first)",
    )
    r.add_argument(
        "--multi-start", action="store_true",
        help="solve each window with all four (sample-mode x "
        "coarse-to-fine) variants and keep the lowest-photometric-cost "
        "one (GT-free selection; ~4x window cost)",
    )
    r.add_argument("--thres-valid-pixel", dest="thres_valid_pixel", type=int)
    r.add_argument("--use-cg", action="store_true")
    r.add_argument(
        "--compact-cap", dest="compact_cap", type=int,
        help="active-pixel compaction cap (solve only observed map pixels; "
        "recommended for 4K+ panoramas)",
    )
    r.add_argument(
        "--stream-chunk", dest="stream_chunk", type=int,
        help="streamed forming chunk size in events (0 disables; default "
        "auto-enables above ~8M events)",
    )
    r.add_argument(
        "--stream-light", dest="stream_light", type=int, choices=(0, 1),
        help="streaming tier: 0 = full (zero O(N) residency; the measured-"
        "fastest default), 1 = light (resident residual fields, Jacobian-"
        "only recompute; equivalence-tested, slower on v5e and HBM-capped "
        "near ~16M events/device)",
    )
    r.add_argument(
        "--num-devices", dest="num_devices", type=int,
        help="solve each window sharded over this many accelerators "
        "(default: all local TPU devices)",
    )
    r.add_argument(
        "--time-window-size", dest="time_window_size", type=float,
        help="sliding-window length [s] (reference time_window_size; "
        "default: the whole BA span, as in the experiments)",
    )
    r.add_argument(
        "--sliding-window-stride", dest="sliding_window_stride", type=float,
        help="sliding-window stride [s] (reference sliding_window_stride)",
    )
    r.add_argument("--irls", choices=["huber", "cauchy"])
    r.add_argument("--spline-order", dest="spline_order", type=int, choices=[2, 4])
    r.add_argument(
        "--super-res-height", dest="super_res_height", type=int,
        help="after BA, solve a full-grid super-resolution map at this pano "
        "height (width 2x) from the refined trajectory (the reference's "
        "production 4K path); saves Gx_sr/Gy_sr + HSV + Poisson PNGs",
    )
    r.add_argument(
        "--debug-nans", action="store_true",
        help="enable jax_debug_nans (numerical failure detection)",
    )
    r.add_argument(
        "--profile-dir", help="write a jax.profiler trace to this directory"
    )
    r.set_defaults(fn=_cmd_run)

    c = sub.add_parser("convert-bag", help="rosbag -> events.npz")
    c.add_argument("--bag", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--events-topic", default="/dvs/events")
    c.add_argument("--camera-info-topic", default="/dvs/camera_info")
    c.add_argument("--calib-out")
    c.set_defaults(fn=_cmd_convert_bag)

    s = sub.add_parser("synth", help="generate a synthetic dataset")
    s.add_argument("--out", required=True)
    s.add_argument("--sensor", type=int, default=64)
    s.add_argument("--pano-height", dest="pano_height", type=int, default=128)
    s.add_argument("--c-th", dest="c_th", type=float, default=0.1)
    s.add_argument("--duration", type=float, default=1.0)
    s.add_argument("--steps", type=int, default=600)
    s.add_argument("--motion", type=float, default=0.25)
    s.add_argument("--texture-smooth", dest="texture_smooth", type=int, default=3)
    s.add_argument("--texture-amp", dest="texture_amp", type=float, default=3.0)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=_cmd_synth)

    e = sub.add_parser("eval", help="rotation RMSE vs ground truth")
    e.add_argument("--traj", required=True)
    e.add_argument("--gt", required=True)
    e.add_argument("--no-align", action="store_true")
    e.set_defaults(fn=_cmd_eval)

    sv = sub.add_parser("suite", help="synthetic accuracy/throughput suite")
    sv.add_argument("--out", default="suite_results.json")

    def _cmd_suite(a):
        from .eval_suite import run_suite

        run_suite(a.out)

    sv.set_defaults(fn=_cmd_suite)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
