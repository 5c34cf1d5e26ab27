"""Round-5 probe of the ONE untried forming lever (VERDICT r4 item 2):
an IN-KERNEL DMA gather — scalar-prefetched per-chunk source indices
driving per-column HBM->VMEM async copies inside a Pallas grid — vs the
XLA gather the bucket prepass currently issues
(kernels/a12_accum.py:_bucket_prepass, the measured forming floor).

The micro-kernel mirrors the prepass's access pattern: for each grid chunk
of MC measurements, fetch MC random columns of an (R, N) f32 HBM payload
into VMEM and reduce them (the reduction stands in for the real kernel's
GEMMs and forces the data). Two DMA disciplines are timed:

  * serial: start+wait per column (DMA latency bound — the floor),
  * batched: start all MC with per-slot semaphores, then wait all
    (issue-rate/overlap bound — the ceiling).

Reference points: the SAME gather via jnp.take (the status quo) at R rows,
amortized over K in-program repetitions (no tunnel-dispatch floor in any
number — ADVICE r4 methodology).

Usage (TPU): python scripts/r5_dma_gather_probe.py ; one JSON line ->
docs/dma_gather_probe_r5.json.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2_000_000
MC = 256  # columns per grid chunk (the prepass chunk size)


def _dma_kernel(idx_ref, hbm_ref, out_ref, scratch, sems, *, rows, serial):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if serial:
        def body(j, _):
            c = idx_ref[i, j]
            dma = pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(c, 1)],
                scratch.at[:, pl.ds(j, 1)],
                sems.at[0],
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, MC, body, 0)
    else:
        def start(j, _):
            c = idx_ref[i, j]
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(c, 1)],
                scratch.at[:, pl.ds(j, 1)],
                sems.at[j],
            ).start()
            return 0

        jax.lax.fori_loop(0, MC, start, 0)

        def wait(j, _):
            pltpu.make_async_copy(
                hbm_ref.at[:, pl.ds(0, 1)],
                scratch.at[:, pl.ds(j, 1)],
                sems.at[j],
            ).wait()
            return 0

        jax.lax.fori_loop(0, MC, wait, 0)

    out_ref[...] += jnp.sum(scratch[...], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("rows", "serial"))
def dma_gather_sum(payload, idx, rows: int, serial: bool):
    n_chunks = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_dma_kernel, rows=rows, serial=serial),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((rows, 1), lambda i, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, MC), jnp.float32),
                pltpu.SemaphoreType.DMA((MC,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        # CPU smoke-testable (timing only meaningful on TPU)
        interpret=jax.default_backend() != "tpu",
    )(idx, payload)


def timed(fn, *args, reps=5):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    rng = np.random.default_rng(5)
    res = {}
    for rows in (8, 16):
        payload = jnp.asarray(rng.standard_normal((rows, N)), jnp.float32)
        perm = rng.permutation(N).astype(np.int32)
        n_chunks = N // MC
        idx = jnp.asarray(perm[: n_chunks * MC].reshape(n_chunks, MC))

        # XLA reference (K-amortized, full-sum — see r5_gather_probe)
        src = jnp.asarray(perm)

        @jax.jit
        def xla_g(p, s):
            def body(_, carry):
                acc, off = carry
                out = jnp.take(p, (s + off) % p.shape[1], axis=1)
                tot = out.sum()
                return acc + tot, (tot.astype(jnp.int32) & 7) + 1

            acc, _ = jax.lax.fori_loop(
                0, 4, body, (jnp.zeros((), jnp.float32), jnp.int32(0))
            )
            return acc

        t_xla = timed(xla_g, payload, src) / 4
        res[f"xla_rows{rows}"] = {"s": t_xla, "cols_per_s": N / t_xla}
        print(f"# XLA take rows={rows}: {t_xla*1e3:.1f} ms, "
              f"{N/t_xla/1e6:.1f}M cols/s", file=sys.stderr, flush=True)

        for serial in (False, True):
            tag = "serial" if serial else "batched"
            try:
                t = timed(dma_gather_sum, payload, idx, rows, serial)
            except Exception as e:  # noqa: BLE001 — mosaic feature gaps
                res[f"dma_{tag}_rows{rows}"] = {"error": repr(e)[:300]}
                print(f"# DMA {tag} rows={rows}: FAILED {type(e).__name__}",
                      file=sys.stderr, flush=True)
                continue
            res[f"dma_{tag}_rows{rows}"] = {
                "s": t,
                "cols_per_s": n_chunks * MC / t,
                "per_dma_ns": t / (n_chunks * MC) * 1e9,
            }
            print(f"# DMA {tag} rows={rows}: {t*1e3:.1f} ms, "
                  f"{n_chunks*MC/t/1e6:.1f}M cols/s, "
                  f"{t/(n_chunks*MC)*1e9:.0f} ns/DMA",
                  file=sys.stderr, flush=True)

    print(json.dumps(res))
    with open(os.path.join(REPO, "docs", "dma_gather_probe_r5.json"),
              "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
