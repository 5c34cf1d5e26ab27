"""Round-5 gather micro-probe (ADVICE r4 items 2-3 applied to the r4
probe): what bounds the bucket-prepass payload gather, measured WITHOUT
the axon tunnel's per-dispatch floor.

Changes vs scripts/r4_gather_probe.py:
  * K gathers run inside ONE jitted lax.fori_loop (chained through a
    rolling index derived from the previous sum, so XLA cannot hoist or
    dedupe them); time/K amortizes the ~25 ms/call tunnel dispatch floor
    out of the estimate.
  * the reduction sums the FULL gathered array (every output element is
    data-dependent — no strided slice for XLA to fold into the gather
    indices).

Usage: python scripts/r5_gather_probe.py ; prints one JSON line and
writes docs/gather_probe_r5.json.
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

K = 8  # gathers per dispatch


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
                    (17, 1_000_000), (1, 2_000_000)]:
        payload = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
        src = jnp.asarray(rng.permutation(n).astype(np.int32))

        @jax.jit
        def g(p, s):
            def body(_, carry):
                acc, off = carry
                # rotate indices by a value derived from the previous
                # iteration's result: serial dependence, no CSE/hoisting
                out = jnp.take(p, (s + off) % p.shape[1], axis=1)
                tot = out.sum()  # FULL-array reduction (nothing foldable)
                return acc + tot, (tot.astype(jnp.int32) & 7) + 1

            acc, _ = jax.lax.fori_loop(
                0, K, body, (jnp.zeros((), jnp.float32), jnp.int32(0))
            )
            return acc

        t = timed(g, payload, src) / K
        res[f"rows{rows}_n{n}"] = {
            "s_per_gather": t,
            "cols_per_s": n / t,
            "gather_GBps": rows * n * 4 / t / 1e9,
            "k_per_dispatch": K,
        }
        print(f"# rows={rows} n={n}: {t*1e3:.1f} ms/gather (K={K}), "
              f"{n/t/1e6:.1f}M cols/s, {rows*n*4/t/1e9:.1f} GB/s",
              file=sys.stderr, flush=True)
    print(json.dumps(res))
    with open(os.path.join(REPO, "docs", "gather_probe_r5.json"), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
