"""Two-PROCESS jax.distributed exercise of the multi-host path (SURVEY.md §5
distributed-backend row): the sharded LM window runs across two separate
processes (4 virtual CPU devices each, 8 global) through a real
jax.distributed.initialize bootstrap — the executable stand-in for the
BASELINE.md N>=2-host measurement point (no second TPU host exists here).

Each worker builds the identical problem from the same seed, constructs the
GLOBAL sharded arrays via make_array_from_callback (only its addressable
shards are materialized locally), runs dist.make_solve_window_sharded over
the 2x(4-device) global mesh, and dumps the replicated result; the test
compares both workers' outputs against the single-process fused solver.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np

proc_id = int(sys.argv[1])
port = sys.argv[2]
outfile = sys.argv[3]
repo = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=proc_id,
)
assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, repo)
from emba_tpu import dist, model, pairing, synth

# identical problem in both processes (same seed)
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

mesh = dist.make_mesh(4, 2, jax.devices())


def gput(a, spec):
    # Global sharded array: each process materializes only the shards it
    # addresses (the multi-host data-loading pattern; every process holds
    # the full host copy here because the fixture is tiny and seeded).
    a = np.asarray(a)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])


n_dev = 8
padded = dist.pad_window(dev, n_dev)
ev = P(("ev", "tile"))
dev_g = model.DeviceWindow(
    bearings=gput(padded.bearings, P(None, ("ev", "tile"))),
    pol_signed=gput(padded.pol_signed, ev),
    prev_idx=gput(padded.prev_idx, ev),
    has_prev=gput(padded.has_prev, ev),
    batch_ids=gput(padded.batch_ids, ev),
    batch_s=gput(padded.batch_s, P()),
    batch_u=gput(padded.batch_u, P()),
    sensor_pix=gput(padded.sensor_pix, ev),
)
knots = gput(scene.traj.knots, P())
Gx = gput(scene.gx, P())
Gy = gput(scene.gy, P())

solve = dist.make_solve_window_sharded(
    mesh, cfg, scene.traj.num_knots, 32 * 32, fix_first=True, max_num_iter=5
)
k8, gx8, gy8, cost8, it8, conv8 = solve(
    knots, Gx, Gy, dev_g,
    gput(np.float64(1.0), P()), gput(np.float64(1e-3), P()),
)
out = dict(
    cost=float(cost8),
    iters=int(it8),
    knots_sum=float(np.abs(np.asarray(jax.device_get(k8))).sum()),
    gx_sum=float(np.abs(np.asarray(jax.device_get(gx8))).sum()),
    process=proc_id,
)
with open(outfile, "w") as f:
    json.dump(out, f)
jax.distributed.shutdown()
"""


def test_two_process_sharded_window(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # workers set their own device count (4)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port),
             str(outs[i]), repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    results = []
    for p, out in zip(procs, outs):
        try:
            stdout, stderr = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process run timed out")
        assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
        results.append(json.load(open(out)))

    # both processes must agree (replicated outputs)
    assert results[0]["iters"] == results[1]["iters"]
    np.testing.assert_allclose(results[0]["cost"], results[1]["cost"], rtol=1e-12)

    # and match the single-process fused solver on the same problem
    import dataclasses  # noqa: F401  (parity of imports with worker)

    import jax.numpy as jnp

    from emba_tpu import model, pairing, solver, synth

    rng = np.random.default_rng(9)
    sensor = synth.default_sensor(32, 32, f=30.0)
    scene = synth.generate(
        rng, sensor, pano_width=128, pano_height=64, c_th=0.15, t_end=0.5,
        dt_knots=0.05, num_steps=150, motion_amp=0.2,
    )
    cfg = model.ModelConfig(
        c_th=0.15, pano_width=128, pano_height=64, thres_valid_pixel=2,
        alpha=1.0,
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width,
        scene.traj.locate, 100,
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    k1, gx1, gy1, cost1, it1, conv1 = solver.solve_window_fused(
        jnp.asarray(scene.traj.knots), jnp.asarray(scene.gx),
        jnp.asarray(scene.gy), dev, cfg, jnp.asarray(1.0),
        jnp.asarray(1e-3), fix_first=True, max_num_iter=5,
    )
    assert results[0]["iters"] == int(it1)
    np.testing.assert_allclose(results[0]["cost"], float(cost1), rtol=1e-9)
    np.testing.assert_allclose(
        results[0]["knots_sum"], float(np.abs(np.asarray(k1)).sum()),
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        results[0]["gx_sum"], float(np.abs(np.asarray(gx1)).sum()), rtol=1e-8
    )


def test_elastic_resume_across_mesh_sizes():
    """ELASTICITY (SURVEY.md §5): a mid-window LM checkpoint taken on an
    8-shard mesh resumes on a 4-shard mesh AND on a single device, landing
    on the uninterrupted run's result. Checkpoints are mesh-independent
    (host numpy state; the linearization and normal equations are re-derived
    on the new topology), so a pod that loses devices restarts on whatever
    mesh remains. Same-topology resume is bit-exact
    (tests/test_pipeline.py::test_mid_window_checkpoint_resume); across
    topologies the reduction ORDER changes (psum tree vs single-device
    chunk order), so equality here is to f64 reduction tolerance, not bits.
    """
    import jax
    import jax.numpy as jnp

    from emba_tpu import dist, model, pairing, solver, synth

    rng = np.random.default_rng(21)
    sensor = synth.default_sensor(32, 32, f=30.0)
    scene = synth.generate(
        rng, sensor, pano_width=128, pano_height=64, c_th=0.15, t_end=0.5,
        dt_knots=0.05, num_steps=150, motion_amp=0.2,
    )
    cfg = model.ModelConfig(
        c_th=0.15, pano_width=128, pano_height=64, thres_valid_pixel=2,
        alpha=1.0,
    )
    win = pairing.build_window(
        scene.t, scene.x, scene.y, scene.pol, sensor.width,
        scene.traj.locate, 100,
    )
    dev = model.DeviceWindow.from_window(
        win, sensor.bearing_lut(), sensor.width, jnp.float64
    )
    # imperfect init so LM does real work
    knots = jnp.asarray(scene.traj.knots)
    Gx = jnp.asarray(scene.gx * 0.7)
    Gy = jnp.asarray(scene.gy * 0.7)
    nsp = 32 * 32
    lm_cfg = solver.LMConfig(max_num_iter=8)

    # uninterrupted 8-shard reference
    mesh8 = dist.make_mesh(8, 1, jax.devices()[:8])
    k_ref, gx_ref, _gy, st_ref = dist.solve_window_sharded_host(
        *dist.replicate(mesh8, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh8), mesh8, cfg, nsp, lm_cfg,
        fix_first=True,
    )

    # interrupted 8-shard run: checkpoint every iteration, stop at 4
    saved = []
    dist.solve_window_sharded_host(
        *dist.replicate(mesh8, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh8), mesh8, cfg, nsp,
        solver.LMConfig(max_num_iter=4), fix_first=True,
        checkpoint_cb=saved.append, checkpoint_every=1,
    )
    state = saved[-1]
    assert state["it"] >= 3

    # resume on a 4-shard mesh
    mesh4 = dist.make_mesh(4, 1, jax.devices()[:4])
    k4, _gx4, _gy4, st4 = dist.solve_window_sharded_host(
        *dist.replicate(mesh4, knots, Gx, Gy),
        dist.shard_window_all(dev, mesh4), mesh4, cfg, nsp, lm_cfg,
        fix_first=True, resume_state=state,
    )
    # resume on a single device (the host-loop solver)
    k1, _gx1, _gy1, st1 = solver.solve_window(
        knots, Gx, Gy, dev, cfg, lm_cfg, fix_first=True,
        resume_state=state,
    )

    cost_ref = st_ref.iterations[-1]["cost_min"]
    for k_el, st_el in ((k4, st4), (k1, st1)):
        assert (
            len(st_el.iterations) + state["it"] == len(st_ref.iterations)
        )
        np.testing.assert_allclose(
            st_el.iterations[-1]["cost_min"], cost_ref, rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(k_el), np.asarray(k_ref), atol=1e-9
        )
