"""Reference-scale production run: the FULL pipeline over the 203M-event
synthetic stream (c_th=0.0125, 4.8 s, 1024x512 pano) in sliding windows —
SURVEY.md §6's 10^8-event regime, which the reference only survives by
subsampling (emba.cpp:282-304). Exercises, at scale and end-to-end:
window prep prefetch, auto-streaming tiers, the fused_event_cap fence
(windows ~50M events/device fall back to the host loop and record it),
adaptive compaction, checkpointing, and runtime.json observability.

Usage (TPU): python scripts/r4_bigrun.py [out_dir]
Writes a trimmed runtime summary to docs/run_203m_r4.json (the committed
artifact behind STATUS.md's 203M scale-table row).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

import numpy as np  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emba_bigrun_r4"
DATA = os.path.join(REPO, ".cache", "bench_s128_p512_n600_t4.8_c0.0125.npz")

z = np.load(DATA)
t, x, y, pol = z["t"], z["x"], z["y"], z["pol"]
print(f"events: {len(t):,}", flush=True)

from emba_tpu import spline, synth  # noqa: E402
from emba_tpu.config import BAConfig  # noqa: E402
from emba_tpu.pipeline import EmbaPipeline  # noqa: E402

traj_gt = spline.Trajectory(
    t_beg=float(z["t_beg"]), dt=float(z["dt_knots"]),
    knots=np.asarray(z["knots"]), order=2,
)
# front-end-like poses: GT sampled at 100 Hz with a smooth rotational drift
rng = np.random.default_rng(3)
pose_times = np.arange(0.0, 4.8, 0.01)
R_gt = np.asarray(traj_gt.evaluate(pose_times))
steps = rng.normal(size=(len(pose_times), 3)) * 0.002
walk = np.cumsum(steps, axis=0)
walk -= walk[0]
pose_rots = spline._np_exp(walk) @ R_gt

sensor = synth.default_sensor(128, 128, f=128 * 0.9)
cam = sensor

cfg = BAConfig(
    start_time=0.0, stop_time=4.8, c_th=0.0125, alpha=0.5,
    dt_knots=0.05, max_num_iter=10, dtype="float32",
    time_window_size=1.2, sliding_window_stride=1.2,  # 4 x ~50M events
    # ask for fused: each ~50M-event window exceeds the 32M/device
    # fused_event_cap default (emba_tpu/config.py), so the fence must route
    # every window to the host loop and record it
    fused_lm=True,
)
pipe = EmbaPipeline(
    cfg, cam, (t, x, y, pol), pose_times, pose_rots,
    init_gx=np.asarray(z["gx"]), init_gy=np.asarray(z["gy"]),
    result_dir=OUT, record_data=True,
)
t0 = time.perf_counter()
res = pipe.run()
wall = time.perf_counter() - t0

head = subprocess.run(
    ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True,
).stdout.strip()
rt = json.load(open(os.path.join(OUT, "final_results", "runtime.json")))
summary = dict(
    git_head=head,
    num_events=int(len(t)),
    windows=len(res.window_stats),
    window_events=[st.num_events for st in res.window_stats],
    lm_mode=rt["lm_mode"],
    lm_iterations=[len(st.iterations) for st in res.window_stats],
    cost_first=[st.iterations[0]["cost_min"] for st in res.window_stats],
    cost_last=[st.iterations[-1]["cost_min"] for st in res.window_stats],
    events_per_s_last_window=rt["events_per_second"],
    window_prep_s=rt["window_prep_s"],
    window_prep_wait_s=rt["window_prep_wait_s"],
    dropped_measurements=rt["dropped_measurements"],
    total_wall_s=wall,
    overall_events_per_iter_per_s=(
        sum(st.num_events * len(st.iterations) for st in res.window_stats)
        / sum(st.time_total_s for st in res.window_stats)
    ),
)
with open(os.path.join(REPO, "docs", "run_203m_r4.json"), "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary, indent=2), flush=True)
