"""Orchestration: data loading, sliding-window driver, artifact outputs.

TPU-native replacement for the reference's ``EMBA`` orchestrator
(``src/emba/emba.cpp``):

* constructor duties (``emba.cpp:25-385``): config, output directories,
  event loading + systematic subsampling, front-end pose loading, initial
  map loading (or random init) + 3x3 median blur, model construction,
* ``Run()`` (``emba.cpp:400-471``): the sliding-window loop — event subset,
  pose-subset spline fitting, control-pose alignment/append, per-window LM
  solve, segment commit, window slide (in the experiments the window covers
  the whole BA span, so the loop runs once),
* data recording (params.txt, iterations.txt, per-iteration map dumps,
  refined TUM trajectory — ``solver.cpp:370-479``, ``emba.cpp:466-470``),
* plus what the reference lacks (SURVEY.md §5): window-level checkpoint /
  resume of the full BA state.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from . import io as eio
from . import model, pairing, recon, solver, spline
from .camera import PinholeCamera
from .config import BAConfig


def median_blur_3x3(img: np.ndarray) -> np.ndarray:
    """3x3 median filter with replicated borders (reference
    ``emba.cpp:358-364`` uses cv::medianBlur on CV_32F)."""
    p = np.pad(img.astype(np.float32), 1, mode="edge")
    stack = np.stack(
        [p[i : i + img.shape[0], j : j + img.shape[1]] for i in range(3) for j in range(3)]
    )
    return np.median(stack, axis=0).astype(np.float64)


def auto_compact_cap(hw: int, num_events: int, thres_valid_pixel: int):
    """Auto-enable active-pixel compaction for large panoramas.

    The map block of the normal equations only needs rows for observed
    pixels. Safe cap: a pixel needs >= thres_valid_pixel events to become
    active, so actives <= num_events / thres (rounded up to a power of two
    for compile-cache stability). Returns None when compaction would not
    shrink the solve domain meaningfully (small panos / dense coverage).
    """
    bound = num_events // max(1, thres_valid_pixel) + 1
    cap = 1 << max(12, int(np.ceil(np.log2(bound))))
    if hw >= 2 * 1024 * 1024 and cap < hw // 2:
        return cap
    return None


def retune_compact_cap(cap: int, observed_active: int, hw: int) -> int:
    """Adapt the compaction cap to the ACTIVE-pixel count observed in the
    window just solved: cap = next_pow2(2 * observed), floored at 4096 and
    clamped to next_pow2(hw). The power-of-two grid plus the 2x headroom
    gives hysteresis — the cap only changes when observed actives leave the
    (cap/4, cap/2] band — so the compile cache sees few distinct shapes.
    """
    desired = 1 << max(12, int(np.ceil(np.log2(max(1, 2 * observed_active)))))
    return min(desired, 1 << int(np.ceil(np.log2(hw))))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _count_active_device(knots, gx, gy, dev, cfg):
    lin = model.linearize(knots, gx, gy, dev, cfg, False)
    return jnp.sum((lin.num_ev_map >= cfg.thres_valid_pixel).astype(jnp.int32))


def count_active_pixels(knots, gx, gy, dev, mcfg) -> int:
    """Observed active-pixel count for a solved window: pano pixels with
    >= thres_valid_pixel inlier events (reference model.cpp:407-411). cfg is
    normalized to compact_cap=None / use_pallas=False so the compiled
    program is reused across cap changes (linearize depends on neither)."""
    cfg = dataclasses.replace(mcfg, compact_cap=None, use_pallas=False)
    return int(_count_active_device(knots, gx, gy, dev, cfg))


# Auto-stream thresholds (events/device): the classic resident-(D, N)-
# linearization path is the fastest LM iteration wherever it fits (measured
# v5e, 1024x512: 16M classic fused 6.58M ev/s vs streamed 5.03M; 24M classic
# OOMs), so stream only beyond 16M events/device — 8M when the map row space
# exceeds 2^20 rows (a 4K-pano A12 leaves less HBM for the linearization;
# that combination is unvalidated).
CLASSIC_CAP_SMALL_ROWS = 16_000_000
CLASSIC_CAP_LARGE_ROWS = 8_000_000
ROWS_SMALL = 1 << 20


def plan_model_config(
    mcfg: model.ModelConfig,
    cfg: BAConfig,
    t: np.ndarray,
    t_ba_beg: float,
    t_ba_end: float,
    win_size: float,
    win_stride: float,
    n_dev: int,
    classic_cap_small: int = CLASSIC_CAP_SMALL_ROWS,
    classic_cap_large: int = CLASSIC_CAP_LARGE_ROWS,
):
    """Pre-run model-config planning: auto compaction cap, then the
    auto-stream decision keyed on the LARGEST running window's per-device
    event count and the POST-compaction map row space.

    The largest-window count is exact: events are time-sorted, so each
    window's count is two searchsorteds, and only window starts whose window
    actually RUNS (the run loop requires t_win_end < t_ba_end + 1e-3) enter
    the max. The streamed tier default is the zero-residency FULL tier at
    every streamed scale: measured on v5e (docs/STATUS.md), the
    resident-LIGHT tier is slower at 2M (5.0M vs 6.6M ev/s — its
    retained-field writes outweigh the skipped residual recompute), within
    noise at 16M where its fused temps barely fit HBM, and OOMs beyond.
    ``stream_light`` stays as an explicit, equivalence-tested knob.

    Returns ``(mcfg, auto_cap)`` — ``auto_cap`` True when the compaction cap
    was auto-chosen (the run loop then retunes it per window).
    """
    # Compaction first: the classic/stream decision keys on the
    # post-compaction row space (an auto-compacted 4K pano solves in a
    # <= 2^20-row space and deserves the larger classic cap).
    auto_cap = mcfg.compact_cap is None
    if auto_cap:
        cap = auto_compact_cap(
            mcfg.pano_width * mcfg.pano_height, len(t),
            mcfg.thres_valid_pixel,
        )
        if cap is not None:
            mcfg = dataclasses.replace(mcfg, compact_cap=cap)
    auto_cap = auto_cap and mcfg.compact_cap is not None

    edges_beg = np.arange(t_ba_beg, t_ba_end, win_stride)
    edges_beg = edges_beg[edges_beg + win_size < t_ba_end + 1e-3]
    max_win_events = int(
        np.max(
            np.searchsorted(t, edges_beg + win_size + 1e-3)
            - np.searchsorted(t, edges_beg - 1e-3)
        )
    ) if len(edges_beg) else len(t)
    per_dev = max_win_events / max(1, n_dev)
    rows = mcfg.compact_cap or (mcfg.pano_width * mcfg.pano_height)
    classic_cap = classic_cap_small if rows <= ROWS_SMALL else classic_cap_large
    if cfg.stream_chunk is None and per_dev > classic_cap:
        mcfg = dataclasses.replace(mcfg, stream_chunk=1 << 21)
    if mcfg.stream_chunk is not None and cfg.stream_light is not None:
        mcfg = dataclasses.replace(mcfg, stream_light=bool(cfg.stream_light))
    return mcfg, auto_cap


def systematic_subsample(t, x, y, pol, rate: int):
    """Keep every ``rate``-th event (reference ``emba.cpp:282-304``)."""
    if rate < 2:
        return t, x, y, pol
    idx = np.arange(rate - 1, len(t), rate)
    return t[idx], x[idx], y[idx], pol[idx]


@dataclasses.dataclass
class RunResult:
    trajectory: spline.Trajectory
    gx: np.ndarray
    gy: np.ndarray
    window_stats: list
    result_dir: str | None = None


@dataclasses.dataclass
class _PreparedWindow:
    """Host-side window preparation product (see ``_prepare_window``)."""

    new_cps: np.ndarray  # fitted control poses for this window (pre-alignment)
    win: pairing.EventWindow  # paired event window (pairing indices, batches)
    seg_num_knots: int  # predicted knot count of the window segment
    prep_s: float  # host time spent preparing
    pushed: int  # knots this window's pushback would add


class EmbaPipeline:
    """End-to-end EMBA run over an event stream."""

    def __init__(
        self,
        cfg: BAConfig,
        camera: PinholeCamera,
        events: tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
        pose_times: np.ndarray,
        pose_rotations: np.ndarray,
        init_gx: np.ndarray | None = None,
        init_gy: np.ndarray | None = None,
        result_dir: str | None = None,
        record_data: bool = False,
        record_maps: bool = False,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.camera = camera
        self.record_data = record_data and result_dir is not None
        self.record_maps = record_maps
        self.result_dir = result_dir
        self.dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32

        t, x, y, pol = events
        order = np.argsort(t, kind="stable")
        t, x, y, pol = t[order], x[order], y[order], pol[order]
        # BA interval cut (+ time offset already applied upstream)
        t0 = cfg.start_time + cfg.time_offset
        t1 = cfg.stop_time + cfg.time_offset
        m = (t >= t0 + 1e-6) & (t <= t1)
        t, x, y, pol = t[m], x[m], y[m], pol[m]
        self.t, self.x, self.y, self.pol = systematic_subsample(
            t, x, y, pol, cfg.event_sampling_rate
        )

        self.pose_times = np.asarray(pose_times, np.float64)
        self.pose_rotations = np.asarray(pose_rotations, np.float64)

        # Initial map (reference emba.cpp:333-364).
        H, W = cfg.pano_height, cfg.pano_width
        if init_gx is None:
            rng = np.random.default_rng(seed)
            if cfg.use_cg:
                init_gx = np.zeros((H, W))
                init_gy = np.zeros((H, W))
            else:
                init_gx = rng.normal(0.0, 0.1 * cfg.c_th, size=(H, W))
                init_gy = rng.normal(0.0, 0.1 * cfg.c_th, size=(H, W))
        else:
            H, W = init_gx.shape
            cfg.pano_height, cfg.pano_width = H, W
        self.gx = median_blur_3x3(np.asarray(init_gx))
        self.gy = median_blur_3x3(np.asarray(init_gy))

        self.bearing_lut = camera.bearing_lut()

        # Sliding-window state (reference emba.cpp:309-331).
        self.t_ba_beg = t0
        self.t_ba_end = t1
        self.win_size = cfg.window_size
        self.win_stride = cfg.sliding_window_stride
        self.cp_stride = int(round(cfg.sliding_window_stride / cfg.dt_knots))
        self.traj = spline.Trajectory.empty(t0, cfg.dt_knots, cfg.spline_order)

        if self.record_data:
            eio.ensure_dir(result_dir)
            eio.ensure_dir(os.path.join(result_dir, "final_results"))
            for d in ("Gx_evo", "Gy_evo", "G_hsv_evo", "map_poisson_evo", "map_opt"):
                eio.ensure_dir(os.path.join(result_dir, d))
            self._write_params()
            self._iter_log = open(
                os.path.join(result_dir, "final_results", "iterations.txt"), "w"
            )
        else:
            self._iter_log = None

    # -- recording ----------------------------------------------------------

    def _write_params(self):
        cfg = self.cfg
        with open(os.path.join(self.result_dir, "params.txt"), "w") as f:
            for k, v in dataclasses.asdict(cfg).items():
                f.write(f"{k} = {v}\n")

    def _save_maps(self, tag: str, win_id: int, it: int, gx=None, gy=None):
        if not (self.record_data and self.record_maps):
            return
        gx = np.asarray(self.gx if gx is None else gx)
        gy = np.asarray(self.gy if gy is None else gy)
        base = os.path.join(self.result_dir, tag)
        pre = f"win_{win_id:04d}_"
        eio.save_png(os.path.join(base, f"{pre}Gx_{it:04d}.png"), gx)
        eio.save_png(os.path.join(base, f"{pre}Gy_{it:04d}.png"), gy)
        hsv = eio.gradient_hsv_image(gx, gy)
        eio.save_png(os.path.join(base, f"{pre}G_hsv_{it:04d}.png"), hsv)
        bright = np.asarray(
            recon.reconstruct_from_gradient(jnp.asarray(gx), jnp.asarray(gy))
        )
        eio.save_png(os.path.join(base, f"{pre}poisson_{it:04d}.png"), bright)

    def solve_super_res_map(self, height: int, width: int | None = None):
        """Production super-resolution map: solve the FULL pixel grid at
        ``height`` (width 2x) closed-form from the REFINED trajectory over
        every event inside its time support (``model.solve_map_only``).

        This is the reference's production high-resolution path — its 4K
        panoramas are maps rendered from 1K-refined trajectories (poster:
        240x180 events -> 4096x2048 maps; DVXplorer/EVK4 rows) — made a
        first-class output: with the pose fixed the LEGM residual is affine
        in G, so one per-pixel 2x2 solve is the exact regularized-quadratic
        minimizer, with no A11/A12 residency and no compaction cap at any
        resolution. The pairing-displacement outlier cut scales with the
        resolution ratio (it is measured in pano pixels). Returns
        ``(gx, gy, costs)``; ``costs`` are the data-cost evaluations of
        :func:`model.solve_map_only` (last = at the solved map).

        Multi-chip: with more than one accelerator (or ``cfg.num_devices``
        set > 1) the solve runs as the SPMD sharded program
        (:func:`dist.solve_map_only_sharded`: events sharded with exact
        halo pairing, per-pixel blocks reduce-scattered to row chunks,
        chunk-local closed-form solve — the map block is per-pixel
        independent, so it shards perfectly)."""
        W = width or 2 * height
        cfg0 = self.cfg.model_config()
        scale = height / cfg0.pano_height
        chunk = cfg0.stream_chunk or (1 << 20)
        mcfg = dataclasses.replace(
            cfg0,
            pano_width=W,
            pano_height=height,
            outlier_dp_norm=cfg0.outlier_dp_norm * scale,
            compact_cap=None,
            stream_chunk=chunk,
        )
        m = (self.t >= self.traj.t_beg) & (self.t <= self.traj.t_end - 1e-9)
        win = pairing.build_window(
            self.t[m], self.x[m], self.y[m], self.pol[m], self.camera.width,
            self.traj.locate, self.cfg.event_batch_size,
        )
        dev = model.DeviceWindow.from_window(
            win, self.bearing_lut, self.camera.width, self.dtype,
            pad_multiple=chunk,
        )
        z = jnp.zeros((height, W), self.dtype)
        k = jnp.asarray(self.traj.knots, self.dtype)
        n_iter = 3 if mcfg.use_irls else 1
        if self.cfg.num_devices is not None:
            n_dev = self.cfg.num_devices
        else:
            n_dev = (
                jax.device_count() if jax.default_backend() == "tpu" else 1
            )
        if n_dev > 1:
            from . import dist

            mesh = dist.make_mesh(n_dev, 1)
            gx, gy, costs = dist.solve_map_only_sharded(
                dist.replicate(mesh, k), dist.replicate(mesh, z),
                dist.replicate(mesh, z),
                dist.shard_window_all(dev, mesh), mcfg, mesh,
                self.camera.width * self.camera.height, num_iters=n_iter,
            )
        else:
            gx, gy, costs = model.solve_map_only(
                k, z, z, dev, mcfg, num_iters=n_iter,
            )
        return np.asarray(gx), np.asarray(gy), costs

    def _coarse_presolve(self, seg_knots, dev, mcfg, cfg, fix_first):
        """Coarse-to-fine pose pre-solve (BAConfig.coarse_to_fine): solve
        the window's pose at a HALF-resolution pano — |dp| in pixels
        halves, exactly the LEGM linearization's systematic-error axis —
        and return the refined knots for the full-resolution solve. The
        DeviceWindow is pano-independent (bearings + pairing only), so the
        coarse stage reuses it; the init map is the current map pooled 2x
        (gradient per big pixel = 2x the block-average of the small-pixel
        gradients); the coarse stage's map is discarded. Runs the fused
        single-device window (the coarse problem is small)."""
        if mcfg.pano_height % 2 or mcfg.pano_width % 2:
            return seg_knots  # odd pano: skip (nothing to pool)

        def pool2(g):
            h, w = np.asarray(g).shape
            return 2.0 * np.asarray(g).reshape(
                h // 2, 2, w // 2, 2
            ).mean(axis=(1, 3))

        mc = dataclasses.replace(
            mcfg,
            pano_width=mcfg.pano_width // 2,
            pano_height=mcfg.pano_height // 2,
            outlier_dp_norm=max(0.5 * mcfg.outlier_dp_norm, 1.5),
            compact_cap=None,
        )
        k, _gx, _gy, _cost, n_it, _conv = solver.solve_window_fused(
            jnp.asarray(seg_knots, self.dtype),
            jnp.asarray(pool2(self.gx), self.dtype),
            jnp.asarray(pool2(self.gy), self.dtype),
            dev,
            mc,
            jnp.asarray(cfg.damping_factor, self.dtype),
            jnp.asarray(cfg.tol_fun, self.dtype),
            fix_first=fix_first,
            max_num_iter=cfg.max_num_iter,
            num_times_tol_fun_sat=cfg.num_times_tol_fun_sat,
        )
        if self._iter_log is not None:
            self._iter_log.write(
                f"coarse presolve: {int(n_it)} iters at "
                f"{mc.pano_width}x{mc.pano_height}\n"
            )
        return np.asarray(k, np.float64)

    def _save_evo(self, win_id: int, it: int, gx, gy):
        """Per-LM-iteration evolution dumps (reference ``saveEvoData``,
        solver.cpp:370-425): the evolving Gx/Gy/HSV images plus the Poisson
        brightness snapshot, one file set per iteration."""
        if not (self.record_data and self.record_maps):
            return
        gx, gy = np.asarray(gx), np.asarray(gy)
        pre = f"win_{win_id:04d}_"
        eio.save_png(
            os.path.join(self.result_dir, "Gx_evo", f"{pre}{it:04d}.png"), gx
        )
        eio.save_png(
            os.path.join(self.result_dir, "Gy_evo", f"{pre}{it:04d}.png"), gy
        )
        eio.save_png(
            os.path.join(self.result_dir, "G_hsv_evo", f"{pre}{it:04d}.png"),
            eio.gradient_hsv_image(gx, gy),
        )
        bright = np.asarray(
            recon.reconstruct_from_gradient(jnp.asarray(gx), jnp.asarray(gy))
        )
        eio.save_png(
            os.path.join(
                self.result_dir, "map_poisson_evo", f"{pre}{it:04d}.png"
            ),
            bright,
        )

    # -- checkpointing (new vs reference) ------------------------------------

    def save_checkpoint(self, path: str, window_idx: int,
                        lm_state: dict | None = None):
        """Persist the BA state. Window-boundary checkpoints carry the
        committed trajectory + maps + the NEXT window index. Mid-window
        checkpoints (``lm_state`` from :func:`solver.lm_state_dict`)
        additionally carry the in-flight LM state — current seg knots, LM
        maps, lambda, iteration, cost_min, tol counter — so an interrupted
        window resumes BIT-exactly (SURVEY.md §5's orbax-style contract).
        The write is atomic (tmp + rename): a kill mid-write never corrupts
        the previous checkpoint."""
        payload = dict(
            knots=self.traj.knots,
            t_beg=self.traj.t_beg,
            dt=self.traj.dt,
            order=self.traj.order,
            gx=np.asarray(self.gx),
            gy=np.asarray(self.gy),
            window_idx=window_idx,
        )
        if lm_state is not None:
            payload.update(
                mid_window=True,
                lm_knots=lm_state["knots"],
                lm_gx=lm_state["gx"],
                lm_gy=lm_state["gy"],
                lm_lam=lm_state["lam"],
                lm_cost_min=lm_state["cost_min"],
                lm_count_tol_sat=lm_state["count_tol_sat"],
                lm_it=lm_state["it"],
                lm_cost_decreased=lm_state["cost_decreased"],
            )
        tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)

    def load_checkpoint(self, path: str) -> int:
        z = np.load(path)
        self.traj = spline.Trajectory(
            t_beg=float(z["t_beg"]),
            dt=float(z["dt"]),
            knots=z["knots"],
            order=int(z["order"]),
        )
        self.gx, self.gy = z["gx"], z["gy"]
        if "mid_window" in z and bool(z["mid_window"]):
            # in-flight LM state: run() resumes INSIDE this window
            self._resume_lm = dict(
                knots=z["lm_knots"],
                gx=z["lm_gx"],
                gy=z["lm_gy"],
                lam=float(z["lm_lam"]),
                cost_min=float(z["lm_cost_min"]),
                count_tol_sat=int(z["lm_count_tol_sat"]),
                it=int(z["lm_it"]),
                cost_decreased=bool(z["lm_cost_decreased"]),
            )
        else:
            self._resume_lm = None
        return int(z["window_idx"])

    # -- window preparation (host-side, prefetchable) -----------------------

    def _prepare_window(
        self,
        count_window: int,
        first_window: bool,
        t_win_beg: float,
        t_win_end: float,
        t_pose_beg: float,
        t_pose_end: float,
        base_num_knots: int,
        already_pushed: bool = False,
    ) -> _PreparedWindow:
        """All host-side work for one window that does NOT depend on any
        earlier window's solution: event-subset extraction (reference
        ``getEventSubset``, emba.cpp:473-510), front-end pose-subset spline
        fitting (emba.cpp:412-417), and the event pairing/batching
        (``pairing.build_window``).

        The pairing only needs the window segment's knot TIME GRID (t_beg,
        dt, count — ``spline.locate`` never reads knot values), and the
        fitted ``new_cps`` come from the front-end poses, so this runs on a
        worker thread overlapped with the PREVIOUS window's device solve —
        the window-pipelining axis (SURVEY.md §2.3 PP row). Only the
        alignment of ``new_cps`` to the solved trajectory tail stays on the
        main thread.

        ``base_num_knots``: trajectory knot count before this window's
        pushback (exact at submission time — the prefetch is submitted after
        the current window's pushback). ``already_pushed``: the window's
        pushback is already in the trajectory (mid-window checkpoint
        resume), so the segment knot count is ``base - idx_cp_beg``.
        """
        cfg = self.cfg
        t0 = time.perf_counter()
        lo = np.searchsorted(self.t, t_win_beg + 1e-3, side="right")
        hi = np.searchsorted(self.t, t_win_end - 1e-3, side="right")
        ev = (self.t[lo:hi], self.x[lo:hi], self.y[lo:hi], self.pol[lo:hi])

        pm = (self.pose_times > t_pose_beg) & (self.pose_times < t_pose_end)
        new_cps = spline.fit_knots_long(
            self.pose_times[pm],
            self.pose_rotations[pm],
            t_pose_beg,
            t_pose_end,
            cfg.dt_knots,
            cfg.spline_order,
        )
        pushed = len(new_cps) if first_window else len(new_cps) - 1
        idx_cp_beg = count_window * self.cp_stride
        seg_num_knots = (
            base_num_knots + (0 if already_pushed else pushed) - idx_cp_beg
        )
        seg_t_beg = self.t_ba_beg + idx_cp_beg * cfg.dt_knots

        def loc(tq):
            return spline.locate(
                tq, seg_t_beg, cfg.dt_knots, seg_num_knots, cfg.spline_order
            )

        win = pairing.build_window(
            ev[0], ev[1], ev[2], ev[3], self.camera.width, loc,
            cfg.event_batch_size,
        )
        return _PreparedWindow(
            new_cps=new_cps,
            win=win,
            seg_num_knots=seg_num_knots,
            prep_s=time.perf_counter() - t0,
            pushed=pushed,
        )

    @staticmethod
    def _stats_from_trace(num_events, n_it, conv, trace, total_s):
        """LMStats for a fused/sharded window from the on-device
        per-iteration trace (lm.TRACE_COLS): real per-iteration records,
        Np and compaction-dropped counts per forming pass. Only the total
        wall time is a real timing measurement (one device program — phase
        times stay 0, never fabricated splits)."""
        from . import lm

        n_it = int(n_it)
        tr = np.asarray(trace)
        stats = solver.LMStats(num_events=num_events)
        stats.converged = bool(conv)
        stats.count_objective = n_it
        stats.count_solve = n_it
        stats.iterations = lm.trace_records(tr, n_it)
        stats.active_px_per_form, stats.dropped_meas_per_form = (
            lm.forming_stats_from_trace(tr, n_it)
        )
        stats.count_form = len(stats.active_px_per_form)
        stats.time_total_s = total_s
        return stats

    # -- the sliding-window loop (reference Run(), emba.cpp:400-471) --------

    def run(self, resume_from: str | None = None) -> RunResult:
        cfg = self.cfg
        mcfg = cfg.model_config()
        lm = cfg.lm_config()

        # Multi-chip: solve each window with the sharded LM program when
        # more than one accelerator is present (or when explicitly asked).
        if cfg.num_devices is not None:
            n_dev = cfg.num_devices
        else:
            n_dev = (
                jax.device_count() if jax.default_backend() == "tpu" else 1
            )
        # CG composes with sharding (row-chunked distributed CG,
        # dist._solve_cg_rowchunks) — no single-device fallback.
        use_sharded = n_dev > 1

        mcfg, auto_cap = plan_model_config(
            mcfg, cfg, self.t, self.t_ba_beg, self.t_ba_end, self.win_size,
            self.win_stride, n_dev,
        )

        t_win_beg = self.t_ba_beg
        t_win_end = t_win_beg + self.win_size
        t_pose_beg, t_pose_end = t_win_beg, t_win_end
        first_window = True
        count_window = 0
        pose_latest = None
        window_stats = []

        resume_lm = None
        if resume_from:
            count_window = self.load_checkpoint(resume_from)
            # mid-window checkpoint: count_window is the IN-FLIGHT window;
            # its pushback/alignment are already in the restored trajectory
            # and the LM resumes from the stored schedule state
            resume_lm = getattr(self, "_resume_lm", None)
            first_window = count_window == 0
            t_win_beg += count_window * self.win_stride
            t_win_end += count_window * self.win_stride
            t_pose_beg = t_win_end - self.win_stride if count_window else t_win_beg
            t_pose_end = t_win_end
            if not first_window:
                tq = t_win_end - self.win_stride - 1e-6
                pose_latest = (tq, np.asarray(self.traj.evaluate(tq))[0])

        # Window pipelining (the PP axis, SURVEY.md §2.3): the host-side
        # preparation of window k+1 (event subset, pose-subset spline fit,
        # event pairing — none of which read window k's solution) runs on a
        # worker thread overlapped with window k's device solve. Single
        # worker => preparations stay ordered.
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)
        self._prep_s, self._prep_wait_s = [], []
        next_fut = executor.submit(
            self._prepare_window, count_window, first_window, t_win_beg,
            t_win_end, t_pose_beg, t_pose_end, self.traj.num_knots,
            resume_lm is not None,
        )

        while t_win_end < self.t_ba_end + 1e-3:
            tw0 = time.perf_counter()
            prep = next_fut.result()
            self._prep_wait_s.append(time.perf_counter() - tw0)
            self._prep_s.append(prep.prep_s)

            new_cps = prep.new_cps
            if resume_lm is None:
                if not first_window:
                    # align to the tail of the current trajectory
                    # (emba.cpp:420-428)
                    R0_inv = new_cps[0].T
                    new_cps = np.einsum(
                        "ij,jk,nkl->nil", pose_latest[1], R0_inv, new_cps
                    )
                    new_cps = new_cps[1:]  # drop the shared first knot
                self.traj.pushback(new_cps)
            # else: mid-window resume — the checkpointed trajectory already
            # contains this window's aligned pushback

            idx_cp_beg = count_window * self.cp_stride
            seg = self.traj.segment(idx_cp_beg, self.traj.num_knots)
            assert seg.num_knots == prep.seg_num_knots, (
                seg.num_knots, prep.seg_num_knots
            )

            # Prefetch the NEXT window's preparation before solving this one
            # (the knot base count is exact now that pushback has happened).
            nt_win_beg = t_win_beg + self.win_stride
            nt_win_end = t_win_end + self.win_stride
            if nt_win_end < self.t_ba_end + 1e-3:
                next_fut = executor.submit(
                    self._prepare_window, count_window + 1, False,
                    nt_win_beg, nt_win_end, t_win_end, nt_win_end,
                    self.traj.num_knots,
                )

            # Solve this window.
            win = prep.win
            dev = model.DeviceWindow.from_window(
                win, self.bearing_lut, self.camera.width, self.dtype,
                # pre-pad streamed windows to a chunk multiple: the streamed
                # passes then hold zero padded copies (model.py)
                pad_multiple=(mcfg.stream_chunk or 1) if n_dev == 1 else 1,
            )
            win_id = count_window

            def cb(it, gx, gy, info):
                if self._iter_log is not None:
                    self._iter_log.write(
                        f"win {win_id} iter {it} log10(lambda)="
                        f"{np.log10(info['lam']):.2f} cost_min={info['cost_min']}\n"
                    )
                self._save_evo(win_id, it, gx, gy)

            fused = (
                cfg.fused_lm
                if cfg.fused_lm is not None
                else not self.record_data
            )
            if resume_lm is not None:
                # mid-window resume restores host-schedule state; the fused
                # while_loop carries its own — route this window to the
                # host-driven loop (same results, bit-identical)
                fused = False
            # Mid-window LM checkpointing (host loops only; the fused
            # while_loop is one device program with no host re-entry).
            ck_every = cfg.lm_checkpoint_every if self.record_data else 0
            if ck_every:
                ck_path = os.path.join(
                    self.result_dir, "final_results", "checkpoint.npz"
                )

                def ck_cb(state, _w=win_id):
                    self.save_checkpoint(ck_path, _w, lm_state=state)
            else:
                ck_cb = None
            # Fused-window fence (docs/STATUS.md): the fused while_loop
            # program reproducibly kills the remote TPU worker at 64M
            # events/device even though its compiled footprint fits; the
            # host-driven loop handles that scale. Fall back automatically
            # and record the decision (runtime.json lm_mode).
            fused_fallback = (
                fused
                and win.num_events / max(1, n_dev) > cfg.fused_event_cap
            )
            if fused_fallback:
                fused = False
            def run_solve(seg_knots, vcfg, ck_cb_v, resume_v, cb_v=None):
                """One window solve on the selected execution path (fused /
                host x single-device / sharded). Returns (knots, gx, gy,
                stats)."""
                if fused and use_sharded:
                    from . import dist

                    # streamed forming composes with sharding (chunk-
                    # recomputed Jacobians shard-locally); stream_chunk is
                    # honored
                    mesh = dist.make_mesh(n_dev, 1)
                    t0 = time.perf_counter()
                    # memoized builder: one compile per distinct
                    # (mesh, cfg, knot count, ...) signature across windows
                    solve = dist.solve_window_sharded_cached(
                        mesh, vcfg, seg.num_knots,
                        self.camera.width * self.camera.height,
                        fix_first=first_window,
                        max_num_iter=cfg.max_num_iter,
                        num_times_tol_fun_sat=cfg.num_times_tol_fun_sat,
                        return_trace=True,
                        use_cg=cfg.use_cg,
                    )
                    knots, gx_j, gy_j, cost_min, n_it, conv, trace = solve(
                        *dist.replicate(
                            mesh,
                            jnp.asarray(seg_knots, self.dtype),
                            jnp.asarray(self.gx, self.dtype),
                            jnp.asarray(self.gy, self.dtype),
                        ),
                        dist.shard_window_all(dev, mesh),
                        jnp.asarray(cfg.damping_factor, self.dtype),
                        jnp.asarray(cfg.tol_fun, self.dtype),
                    )
                    stats = self._stats_from_trace(
                        win.num_events, n_it, conv, trace,
                        time.perf_counter() - t0,
                    )
                elif fused:
                    t0 = time.perf_counter()
                    knots, gx_j, gy_j, cost_min, n_it, conv, trace = (
                        solver.solve_window_fused(
                            jnp.asarray(seg_knots, self.dtype),
                            jnp.asarray(self.gx, self.dtype),
                            jnp.asarray(self.gy, self.dtype),
                            dev,
                            vcfg,
                            jnp.asarray(cfg.damping_factor, self.dtype),
                            jnp.asarray(cfg.tol_fun, self.dtype),
                            fix_first=first_window,
                            use_cg=cfg.use_cg,
                            max_num_iter=cfg.max_num_iter,
                            num_times_tol_fun_sat=cfg.num_times_tol_fun_sat,
                            return_trace=True,
                        )
                    )
                    stats = self._stats_from_trace(
                        win.num_events, n_it, conv, trace,
                        time.perf_counter() - t0,
                    )
                elif use_sharded:
                    # Host-driven sharded loop: recording runs (evo dumps,
                    # per-phase timing, iterations.txt) keep full
                    # observability on multi-chip meshes (reference
                    # saveEvoData, solver.cpp:370-425).
                    from . import dist

                    mesh = dist.make_mesh(n_dev, 1)
                    knots, gx_j, gy_j, stats = dist.solve_window_sharded_host(
                        *dist.replicate(
                            mesh,
                            jnp.asarray(seg_knots, self.dtype),
                            jnp.asarray(self.gx, self.dtype),
                            jnp.asarray(self.gy, self.dtype),
                        ),
                        dist.shard_window_all(dev, mesh),
                        mesh,
                        vcfg,
                        self.camera.width * self.camera.height,
                        lm,
                        damping_factor=cfg.damping_factor,
                        fix_first=first_window,
                        use_cg=cfg.use_cg,
                        callback=cb_v,
                        checkpoint_cb=ck_cb_v,
                        checkpoint_every=ck_every if ck_cb_v else 0,
                        resume_state=resume_v,
                    )
                else:
                    knots, gx_j, gy_j, stats = solver.solve_window(
                        jnp.asarray(seg_knots, self.dtype),
                        jnp.asarray(self.gx, self.dtype),
                        jnp.asarray(self.gy, self.dtype),
                        dev,
                        vcfg,
                        lm,
                        damping_factor=cfg.damping_factor,
                        fix_first=first_window,
                        use_cg=cfg.use_cg,
                        callback=cb_v,
                        checkpoint_cb=ck_cb_v,
                        checkpoint_every=ck_every if ck_cb_v else 0,
                        resume_state=resume_v,
                    )
                return knots, gx_j, gy_j, stats

            ms_sel = None
            if cfg.multi_start and resume_lm is None:
                # MULTI-START window (BAConfig.multi_start): solve all four
                # (sample_mode x coarse-to-fine) variants — the LEGM cost
                # landscape is multi-basin on high-texture/large-|dp|
                # problems and the variants act as independent starts —
                # and keep the one with the LOWEST window data cost under
                # the reference evaluation model (GT-free selection;
                # measured to track the better variant on 9/10 suite rows,
                # docs/suite_table_ecrot_r5.md). Mid-window checkpoints are
                # disabled inside variants (window-boundary checkpoints
                # still cover the run).
                eval_cfg = dataclasses.replace(mcfg, sample_mode="curr")
                best = None
                for sm in ("curr", "mid"):
                    for c2f in (False, True):
                        vcfg = dataclasses.replace(mcfg, sample_mode=sm)
                        k0 = seg.knots
                        if c2f:
                            k0 = self._coarse_presolve(
                                k0, dev, vcfg, cfg, first_window
                            )
                        # per-iteration callbacks (evo dumps) stay off inside variants
                        # — they would overwrite each other; the
                        # selected window's maps are saved after
                        # selection as usual
                        kv, gxv, gyv, stv = run_solve(
                            k0, vcfg, None, None
                        )
                        if eval_cfg.stream_chunk is not None:
                            pe_v = float(
                                model.cost_and_activity_streamed(
                                    kv, gxv, gyv, dev, eval_cfg
                                )[0]
                            )
                        else:
                            lin_v = model.linearize(
                                kv, gxv, gyv, dev, eval_cfg, need_deriv=False
                            )
                            pe_v = float(model.data_cost(lin_v.e, eval_cfg))
                        sel = sm + ("+c2f" if c2f else "")
                        if self._iter_log is not None:
                            self._iter_log.write(
                                f"win {win_id} multi-start {sel}: "
                                f"data cost {pe_v}\n"
                            )
                        if best is None or pe_v < best[0]:
                            best = (pe_v, sel, kv, gxv, gyv, stv)
                _pe, ms_sel, knots, gx_j, gy_j, stats = best
            else:
                if cfg.coarse_to_fine and resume_lm is None:
                    # coarse-to-fine pose pre-solve (skipped on mid-window
                    # resume: the resumed knots are already past the coarse
                    # regime)
                    seg = dataclasses.replace(
                        seg,
                        knots=self._coarse_presolve(
                            seg.knots, dev, mcfg, cfg, first_window
                        ),
                    )
                knots, gx_j, gy_j, stats = run_solve(
                    seg.knots, mcfg, ck_cb, resume_lm, cb_v=cb
                )
            resume_lm = None  # consumed by the resumed window
            stats.lm_mode = (
                ("fused-sharded" if fused else "host-sharded")
                if use_sharded
                else ("fused" if fused else "host")
            ) + ("(fused-cap-fallback)" if fused_fallback else "") + (
                f"+multistart:{ms_sel}" if ms_sel else ""
            )
            self.gx, self.gy = np.asarray(gx_j), np.asarray(gy_j)
            seg = dataclasses.replace(seg, knots=np.asarray(knots, np.float64))
            self.traj.replace_with(seg, seg.num_knots, 0, idx_cp_beg)
            if auto_cap:
                # Retune the compaction cap for the NEXT window from the
                # active count actually observed in this one (2x headroom,
                # pow2 grid; see retune_compact_cap). Also repairs an
                # undersized cap — beyond-cap actives are dropped from the
                # solve, so growing restores them next window.
                observed = count_active_pixels(knots, gx_j, gy_j, dev, mcfg)
                if not stats.active_px_per_form:
                    stats.note_active_pixels(observed)
                # Beyond-cap actives were dropped from this window's solve;
                # surface the overflow (runtime.json) — the retune below
                # restores them next window.
                stats.overflow_active_pixels = max(
                    0, observed - (mcfg.compact_cap or observed)
                )
                new_cap = retune_compact_cap(
                    mcfg.compact_cap, observed, mcfg.pano_width * mcfg.pano_height
                )
                if new_cap != mcfg.compact_cap:
                    mcfg = dataclasses.replace(mcfg, compact_cap=new_cap)
            window_stats.append(stats)
            self._save_maps("map_opt", win_id, len(stats.iterations))

            # Latest pose for the next window's alignment (emba.cpp:458-460).
            tq = t_win_end - 1e-6
            pose_latest = (tq, np.asarray(self.traj.evaluate(tq))[0])

            # Slide (emba.cpp:512-532).
            t_win_beg += self.win_stride
            t_pose_beg = t_win_end
            t_win_end += self.win_stride
            t_pose_end = t_win_end
            count_window += 1
            first_window = False

            if self.record_data:
                self.save_checkpoint(
                    os.path.join(self.result_dir, "final_results", "checkpoint.npz"),
                    count_window,
                )

        executor.shutdown(wait=False)

        if self.record_data:
            self.traj.write_tum(
                os.path.join(
                    self.result_dir, "final_results", "trajectory_refined.txt"
                ),
                time_offset=cfg.time_offset,
            )
            eio.save_map_bin(
                os.path.join(self.result_dir, "final_results", "Gx.bin"),
                os.path.join(self.result_dir, "final_results", "Gy.bin"),
                self.gx,
                self.gy,
            )
            if cfg.super_res_height:
                gx_sr, gy_sr, costs_sr = self.solve_super_res_map(
                    cfg.super_res_height
                )
                fr = os.path.join(self.result_dir, "final_results")
                eio.save_map_bin(
                    os.path.join(fr, "Gx_sr.bin"),
                    os.path.join(fr, "Gy_sr.bin"),
                    gx_sr,
                    gy_sr,
                )
                eio.save_png(
                    os.path.join(fr, "G_hsv_sr.png"),
                    eio.gradient_hsv_image(gx_sr, gy_sr),
                )
                eio.save_png(
                    os.path.join(fr, "poisson_sr.png"),
                    np.asarray(
                        recon.reconstruct_from_gradient(
                            jnp.asarray(gx_sr), jnp.asarray(gy_sr)
                        )
                    ),
                )
                with open(os.path.join(fr, "super_res.json"), "w") as f:
                    json.dump(
                        {
                            "height": cfg.super_res_height,
                            "width": gx_sr.shape[1],
                            "data_costs": costs_sr,
                        },
                        f,
                        indent=2,
                    )
            self._write_runtime(window_stats)
            if self._iter_log is not None:
                self._iter_log.close()

        return RunResult(
            trajectory=self.traj,
            gx=self.gx,
            gy=self.gy,
            window_stats=window_stats,
            result_dir=self.result_dir,
        )

    def _write_runtime(self, window_stats):
        """Per-phase runtime logs (reference runtime_*.txt,
        solver.cpp:147-151, 218-222, 290-294) + events/s."""
        agg = {"form": 0.0, "solve": 0.0, "objective": 0.0}
        counts = {"form": 0, "solve": 0, "objective": 0}
        n_ev = 0
        for st in window_stats:
            agg["form"] += st.time_form_s
            agg["solve"] += st.time_solve_s
            agg["objective"] += st.time_objective_s
            counts["form"] += st.count_form
            counts["solve"] += st.count_solve
            counts["objective"] += st.count_objective
            n_ev += st.num_events
        out = {
            "phases_s": agg,
            "phase_counts": counts,
            "num_events": n_ev,
            # phase times are separate value-fetch-synced jitted calls (host
            # LM mode); fused mode reports total_s only (phases_s stay 0)
            "sync_method": window_stats[-1].sync_method if window_stats else "",
            "total_s": sum(st.time_total_s for st in window_stats),
            # Np per form call per window (reference solver.cpp:283-293)
            "num_active_pixels": [st.active_px_per_form for st in window_stats],
            # no silent truncation: compaction-overflow drops per window
            "dropped_measurements": [
                st.dropped_meas_per_form for st in window_stats
            ],
            "overflow_active_pixels": [
                st.overflow_active_pixels for st in window_stats
            ],
            # Window pipelining: host prep cost per window vs the time the
            # main loop actually BLOCKED on it (prefetched preps overlap the
            # previous window's solve, so wait << prep from window 2 on).
            "window_prep_s": getattr(self, "_prep_s", []),
            "window_prep_wait_s": getattr(self, "_prep_wait_s", []),
            # LM execution mode per window (fused / host / sharded variants;
            # "(fused-cap-fallback)" marks the fused->host safety fence)
            "lm_mode": [st.lm_mode for st in window_stats],
            "events_per_second": window_stats[-1].events_per_second()
            if window_stats
            else {},
        }
        with open(
            os.path.join(self.result_dir, "final_results", "runtime.json"), "w"
        ) as f:
            json.dump(out, f, indent=2)
