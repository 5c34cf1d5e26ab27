"""Decompose the A12 bucket-prepass cost and compare payload-permutation
strategies on TPU.

The prepass permutes a (rows, N) payload by a random (pixel-sort) index.
TPU gathers fetch whole (8,128) tiles per element, so cost scales with
ceil(rows/8) tiles, not bytes: 24 rows = 3 tiles, 16 rows = 2, 8 rows = 1.
This script times each stage and the row-count variants to pick the layout.

Usage: python scripts/bench_prepass_variants.py [num_events]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".cache", "jaxcache")
)

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    num_pix = 1024 * 512
    tile_px = 512
    mc = 256
    n_tiles = num_pix // tile_px
    n_padded = n + n_tiles * mc
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    rng = np.random.default_rng(0)
    pm = jnp.asarray(rng.integers(0, num_pix, n).astype(np.int32))
    pay24 = jnp.asarray(rng.normal(size=(24, n)).astype(np.float32))
    pay16 = pay24[:16]
    pay8 = pay24[:8]
    res = {"num_events": n}

    # stage 1: sort keys
    @jax.jit
    def sort_keys(pm):
        k, v = jax.lax.sort_key_val(pm, jnp.arange(n, dtype=jnp.int32))
        return k[::97].sum() + v[::97].sum()

    res["sort_keys_s"] = timed(sort_keys, pm)

    # random permutation for the gather variants (what the sort produces)
    perm = jnp.asarray(rng.permutation(n_padded).astype(np.int32) % n)

    def make_gather(rows):
        @jax.jit
        def g(pay, perm):
            out = jnp.take(pay, perm, axis=1)
            return out[:, ::997].sum()

        return g

    res["gather24_s"] = timed(make_gather(24), pay24, perm)
    res["gather16_s"] = timed(make_gather(16), pay16, perm)
    res["gather8_s"] = timed(make_gather(8), pay8, perm)

    # 1-D pix gather (the pixf_b path)
    pix_ext = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    @jax.jit
    def g1(pix_ext, perm):
        return jnp.take(pix_ext, perm)[::997].sum()

    res["gather1d_s"] = timed(g1, pix_ext, perm)

    # 24 separate 1-D gathers (row-split variant)
    @jax.jit
    def g24x1(pay, perm):
        outs = [jnp.take(pay[i], perm)[::997].sum() for i in range(24)]
        return sum(outs)

    res["gather24x1d_s"] = timed(g24x1, pay24, perm)

    # int32 scatter building the inverse permutation (the src build)
    @jax.jit
    def scatter_inv(perm):
        src = jnp.full((n_padded,), n, jnp.int32).at[
            jnp.minimum(perm, n_padded - 1)
        ].set(jnp.arange(n_padded, dtype=jnp.int32), mode="drop")
        return src[::997].sum()

    res["scatter_inv_s"] = timed(scatter_inv, perm)

    # multi-operand sort: key + 16 payload rows in one lax.sort
    @jax.jit
    def sort_multi16(pm, pay):
        ops = [pm] + [pay[i] for i in range(16)]
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return sum(o[::997].sum() for o in out[1:])

    res["sort_multi16_s"] = timed(sort_multi16, pm, pay16)

    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
