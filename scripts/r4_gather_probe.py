"""Micro-probe: what bounds the bucket-prepass payload gather?

The a12_accum bucket prepass gathers a (np_rows, N) f32 payload along N
with a random permutation (`jnp.take(payload, src, axis=1)`); at 2M
events this is ~60% of the prepass and the largest single component of
the kernel call (docs/ab_bf16_kernel_r4.json). This times the SAME gather
at varying row counts and N to distinguish:

  * time ~ rows  -> HBM-bandwidth bound: fewer/wider rows could help,
  * time ~ N only -> per-column gather-op bound: row packing is free but
    nothing short of removing the gather helps.

Usage: python scripts/r4_gather_probe.py ; prints one JSON line.
"""

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


def timed(fn, *args, reps=5):
    out = fn(*args)
    _ = float(out.ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    rng = np.random.default_rng(3)
    res = {}
    for rows, n in [(17, 2_000_000), (9, 2_000_000), (33, 2_000_000),
                    (17, 1_000_000)]:
        payload = jnp.asarray(
            rng.standard_normal((rows, n)), jnp.float32
        )
        src = jnp.asarray(rng.permutation(n).astype(np.int32))

        @jax.jit
        def g(p, s):
            return jnp.take(p, s, axis=1)[:, ::997].sum(axis=1)

        t = timed(g, payload, src)
        res[f"rows{rows}_n{n}"] = {
            "s": t,
            "cols_per_s": n / t,
            "gather_GBps": rows * n * 4 / t / 1e9,
        }
        print(f"# rows={rows} n={n}: {t*1e3:.1f} ms, "
              f"{n/t/1e6:.1f}M cols/s, {rows*n*4/t/1e9:.1f} GB/s",
              file=sys.stderr, flush=True)
    print(json.dumps(res))
    with open(os.path.join(REPO, "docs", "gather_probe_r4.json"), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
