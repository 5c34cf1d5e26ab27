"""Configuration system: dataclasses + per-sequence presets.

Replaces the reference's ROS parameter plumbing (``src/emba/emba.cpp:28-112``
reading launch XML into ``BASettings``/``LMSettings``,
``include/emba/params.h:4-61``). Preset values transcribed from the ten
launch files (``launch/*.launch``); the ECD time offsets from
``emba.cpp:227-241``.
"""

from __future__ import annotations

import dataclasses

from .model import ModelConfig
from .solver import LMConfig


@dataclasses.dataclass
class BAConfig:
    """Full run configuration (reference ``BASettings`` + dataset info)."""

    dataset: str = "ECRot_dataset"
    sequence: str = "synth"
    # Time interval for BA [s] (sequence-relative; time_offset applied on load)
    start_time: float = 0.1
    stop_time: float = 2.4
    time_offset: float = 0.0

    # Measurement model
    c_th: float = 0.2
    thres_valid_pixel: int = 5
    alpha: float = 5.0
    damping_factor: float = 1.0
    outlier_dp_norm: float = 10.0
    # Map sampling point for the LEGM residual/Jacobians: "curr" (the
    # reference formulation, model.cpp:194-221) or "mid" (midpoint-rule
    # quadrature — halves the linearization's systematic error on large
    # inter-event displacements at zero cost; see ModelConfig.sample_mode).
    sample_mode: str = "curr"
    # Coarse-to-fine: pre-solve each window's pose at a HALF-resolution
    # pano (|dp| in pixels halves — the LEGM linearization's validity
    # axis), then run the normal full-resolution window from the
    # coarse-refined knots. The coarse stage reuses the window's event
    # data (the DeviceWindow is pano-independent); its map is discarded.
    coarse_to_fine: bool = False
    # Multi-start BA: solve each window with all four (sample_mode x
    # coarse_to_fine) variants and keep the one with the lowest window
    # data cost under the reference evaluation model — a GT-free selection
    # (the LEGM landscape is multi-basin on high-texture problems; see
    # docs/suite_table_ecrot_r5.md). ~4x window solve cost.
    multi_start: bool = False

    # Solver options
    use_cg: bool = False
    use_irls: bool = False
    cost_type: str = "quadratic"
    eta: float = 0.1

    # Events
    event_batch_size: int = 100
    event_sampling_rate: int = 1

    # Map
    init_map_available: bool = True
    pano_height: int = 512
    pano_width: int = 1024

    # Trajectory
    dt_knots: float = 0.05
    spline_order: int = 2

    # Sliding window
    time_window_size: float | None = None  # None => whole BA span (as in exps)
    sliding_window_stride: float = 1.0

    # LM
    max_num_iter: int = 50
    tol_fun: float = 1e-3
    num_times_tol_fun_sat: int = 2

    # Numerics
    dtype: str = "float32"
    # Pallas A12 kernel: None = auto (on for TPU + float32), else force.
    use_pallas: bool | None = None
    # Run each window's LM fully on device (lax.while_loop): fastest, but
    # per-iteration logs/timings are unavailable. Auto-selected by the
    # pipeline when not recording data.
    fused_lm: bool | None = None
    # Largest per-device event count the fused while_loop window is allowed
    # to take: beyond it the pipeline falls back to the host-driven LM loop
    # and records the decision in runtime.json (lm_mode). Fused windows are
    # repeatedly validated to 32M events/device on v5e; 40M and 48M passed
    # one isolated probe each, but a 48.0M-event pipeline window crashed the
    # remote TPU worker (docs/fused_64m_probe_r3.md), as 64M does
    # reproducibly — even though the compiled footprint fits. The host loop
    # runs 64M+ fine at near-identical throughput at these scales, so the
    # default stays at the repeatedly-validated boundary. Raise at your own
    # risk.
    fused_event_cap: int = 32_000_000
    # Active-pixel compaction: solve only the observed map pixels (row cap;
    # None = full pixel grid). Essential for 4K+ panoramas where <10% of the
    # grid is ever observed — shrinks A12/A22 and the map-side GEMMs by the
    # sparsity factor. Set >= the expected active-pixel count (overflow
    # pixels are held fixed for the iteration).
    compact_cap: int | None = None
    # Streamed forming chunk (events): recompute Jacobians chunk-wise during
    # accumulation instead of holding (D, N) arrays. None = auto (enabled
    # above ~8M events/device); 0 disables.
    stream_chunk: int | None = None
    # Streaming tier: False/None = FULL (zero O(N) residency — the measured
    # default at every scale, 10^8-event windows); True = LIGHT (resident
    # (N,) residual fields, Jacobian-only chunk recompute — equivalence-
    # tested but measured slower on v5e and HBM-capped near ~16M
    # events/device; see docs/STATUS.md).
    stream_light: bool | None = None
    # Light-trial classic LM (ModelConfig.light_trial): trial evaluations pay
    # only the cost pass; Jacobians are recomputed in the forming pass after
    # accepts (the reference's own trial structure, solver.cpp:66-103).
    # Bit-identical results. None = auto (off pending the measured default).
    light_trial: bool | None = None
    # Mid-window LM checkpointing (recording runs, host-driven loops): write
    # the full LM resume state (current knots/maps, lambda, iteration,
    # cost_min, tol counter) into checkpoint.npz every N LM iterations, so
    # an interrupted hours-long window resumes BIT-exactly with --resume
    # (SURVEY.md §5). 0 disables. Fused while_loop windows checkpoint at
    # window boundaries only (one device program, no host re-entry).
    lm_checkpoint_every: int = 10
    # Multi-chip: number of devices for the sharded LM window (None = auto:
    # all local devices when >1; 1 = force single-device). The window is
    # solved by dist.make_solve_window_sharded over an (n, 1) mesh with
    # events sharded across all chips and exact halo pairing.
    num_devices: int | None = None
    # Super-resolution map output (the reference's production 4K path: its
    # 4K panoramas are maps rendered from 1K-refined trajectories — poster,
    # DVXplorer/EVK4 rows). After the BA run, solve the FULL pixel grid at
    # this pano height (width = 2x) closed-form from the refined trajectory
    # (model.solve_map_only: with the pose fixed the residual is affine in
    # G, so one per-pixel 2x2 solve is the exact regularized minimizer; no
    # compaction, O(HW + chunk) memory at any resolution). Saved as
    # final_results/Gx_sr.bin / Gy_sr.bin (+ PNGs). None disables.
    super_res_height: int | None = None

    def model_config(self) -> ModelConfig:
        if self.use_pallas is None:
            import jax

            use_pallas = (
                jax.default_backend() == "tpu" and self.dtype == "float32"
            )
        else:
            use_pallas = self.use_pallas
        return ModelConfig(
            c_th=self.c_th,
            pano_width=self.pano_width,
            pano_height=self.pano_height,
            thres_valid_pixel=self.thres_valid_pixel,
            alpha=self.alpha,
            outlier_dp_norm=self.outlier_dp_norm,
            sample_mode=self.sample_mode,
            use_irls=self.use_irls,
            cost_type=self.cost_type if self.use_irls else "quadratic",
            eta=self.eta if self.use_irls else 1.0,
            spline_order=self.spline_order,
            use_pallas=use_pallas,
            light_trial=bool(self.light_trial),
            compact_cap=self.compact_cap,
            stream_chunk=self.stream_chunk or None,
            stream_light=bool(self.stream_light) and bool(self.stream_chunk),
        )

    def lm_config(self) -> LMConfig:
        return LMConfig(
            max_num_iter=self.max_num_iter,
            tol_fun=self.tol_fun,
            num_times_tol_fun_sat=self.num_times_tol_fun_sat,
        )

    @property
    def window_size(self) -> float:
        if self.time_window_size is None:
            return self.stop_time - self.start_time
        return self.time_window_size


# ECD (rpg_ijrr_dataset) event-vs-groundtruth time offsets
# (reference emba.cpp:227-241).
ECD_TIME_OFFSETS = {
    "shapes_rotation": 1468939802.884364206,
    "poster_rotation": 1468940145.246817987,
    "boxes_rotation": 1468940843.845407417,
    "dynamic_rotation": 1473347265.928210508,
}

# Common values across all ten launch files: C_th per sequence; BA interval;
# everything else shared (max_num_iter=50, tol_fun=1e-3, thres_valid_pixel=5,
# alpha=5.0, damping=1.0, dt_knots=0.05, quadratic cost, no CG/IRLS).
_COMMON = dict(
    thres_valid_pixel=5,
    alpha=5.0,
    damping_factor=1.0,
    dt_knots=0.05,
    max_num_iter=50,
    tol_fun=1e-3,
    num_times_tol_fun_sat=2,
    use_cg=False,
    use_irls=False,
    event_batch_size=100,
    event_sampling_rate=1,
    sliding_window_stride=1.0,
)

# (dataset, start, stop, C_th) per sequence, from launch/*.launch.
_SEQUENCES = {
    # ECRot synthetic/real
    "playroom": ("ECRot_dataset", 0.1, 2.4, 0.45),
    "bicycle": ("ECRot_dataset", 0.1, 4.9, 0.2),
    "city": ("ECRot_dataset", 0.1, 4.9, 0.2),
    "street": ("ECRot_dataset", 0.1, 4.9, 0.2),
    "town": ("ECRot_dataset", 0.1, 4.9, 0.2),
    "bay": ("ECRot_dataset", 0.1, 4.9, 0.2),
    # ECD rotation sequences (BA interval 1.0-11.0, launch/{shapes,...}.launch)
    "shapes_rotation": ("rpg_ijrr_dataset", 1.0, 11.0, 0.2),
    "poster_rotation": ("rpg_ijrr_dataset", 1.0, 11.0, 0.2),
    "boxes_rotation": ("rpg_ijrr_dataset", 1.0, 11.0, 0.2),
    "dynamic_rotation": ("rpg_ijrr_dataset", 1.0, 11.0, 0.2),
}


def preset(sequence: str, **overrides) -> BAConfig:
    """Per-sequence configuration mirroring ``launch/<sequence>.launch``."""
    if sequence not in _SEQUENCES:
        raise KeyError(
            f"unknown sequence {sequence!r}; available: {sorted(_SEQUENCES)}"
        )
    dataset, start, stop, c_th = _SEQUENCES[sequence]
    cfg = BAConfig(
        dataset=dataset,
        sequence=sequence,
        start_time=start,
        stop_time=stop,
        c_th=c_th,
        time_offset=ECD_TIME_OFFSETS.get(sequence, 0.0),
        **_COMMON,
    )
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg
