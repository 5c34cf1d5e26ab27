"""Halo-exchange scaling: the sharded LM window's log-depth ppermute prefix
fold (dist._linearize_sharded) must keep exact cross-shard pairing at shard
counts beyond the default 8-device mesh. Runs in a subprocess because the
virtual CPU device count is fixed per process (conftest pins 8)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np

n_dev = int(sys.argv[1])
outfile = sys.argv[2]
repo = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    " --xla_force_host_platform_device_count=%d" % n_dev
)
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_emba_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.device_count() == n_dev

import jax.numpy as jnp

sys.path.insert(0, repo)
from emba_tpu import dist, model, pairing, solver, synth

rng = np.random.default_rng(9)
sensor = synth.default_sensor(32, 32, f=30.0)
scene = synth.generate(
    rng, sensor, pano_width=128, pano_height=64, c_th=0.15, t_end=0.5,
    dt_knots=0.05, num_steps=150, motion_amp=0.2,
)
cfg = model.ModelConfig(
    c_th=0.15, pano_width=128, pano_height=64, thres_valid_pixel=2, alpha=1.0
)
win = pairing.build_window(
    scene.t, scene.x, scene.y, scene.pol, sensor.width, scene.traj.locate, 100
)
dev = model.DeviceWindow.from_window(
    win, sensor.bearing_lut(), sensor.width, jnp.float64
)
knots = jnp.asarray(scene.traj.knots)
Gx = jnp.asarray(scene.gx)
Gy = jnp.asarray(scene.gy)
damping = jnp.asarray(1.0, jnp.float64)
tolf = jnp.asarray(1e-3, jnp.float64)

# single-device fused reference IN THE SAME PROCESS
k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
    knots, Gx, Gy, dev, cfg, damping, tolf, fix_first=True, max_num_iter=5
)

mesh = dist.make_mesh(n_dev, 1, jax.devices())
solve = dist.make_solve_window_sharded(
    mesh, cfg, scene.traj.num_knots, 32 * 32, fix_first=True, max_num_iter=5
)
kN, gxN, gyN, costN, itN, convN = solve(
    *dist.replicate(mesh, knots, Gx, Gy),
    dist.shard_window_all(dev, mesh), damping, tolf,
)
out = dict(
    n_dev=n_dev,
    iters=[int(it1), int(itN)],
    cost=[float(cost1), float(costN)],
    dk=float(np.max(np.abs(np.asarray(kN) - np.asarray(k1)))),
    dgx=float(np.max(np.abs(np.asarray(gxN) - np.asarray(gx1)))),
    dgy=float(np.max(np.abs(np.asarray(gyN) - np.asarray(gy1)))),
)
with open(outfile, "w") as f:
    json.dump(out, f)
"""


@pytest.mark.parametrize("n_dev", [16, 32])
def test_sharded_window_matches_fused_at_scale(tmp_path, n_dev):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "out.json"
    p = subprocess.run(
        [sys.executable, str(worker), str(n_dev), str(out), repo],
        env=env, capture_output=True, text=True, timeout=480,
    )
    assert p.returncode == 0, f"worker failed:\n{p.stderr[-4000:]}"
    r = json.load(open(out))
    assert r["iters"][0] == r["iters"][1] and r["iters"][0] > 1
    np.testing.assert_allclose(r["cost"][1], r["cost"][0], rtol=1e-9)
    assert r["dk"] < 1e-9
    assert r["dgx"] < 1e-8 and r["dgy"] < 1e-8
