"""Microbench the fixed-round gather-walk primitives on TPU.

1. cost/round of: slice col j of topk lists -> gather leaf rows -> MT ->
   best update (fori_loop, no data-dependent conds), widths x LEAF sizes.
2. one-time candidate preselect: lax.top_k([R, L], k) cost.
3. argsort [R] (compaction price), full-width slab pass cost.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rendertoy3c_tpu.trace.leafwalk import _mt_leaf, _slab_entries, _safe_inv

REPS = 50


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS
    print(f"  {name:52s} {dt * 1e6:9.1f} us", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for leaf, n_l in ((64, 769), (128, 385)):
        rows = jnp.asarray(rng.standard_normal((n_l, 9 * leaf), np.float32))
        for width in (2048, 8192, 32768):
            k = 12
            topk_i = jnp.asarray(rng.integers(0, n_l, (width, k)), jnp.int32)
            topk_e = jnp.asarray(
                np.sort(rng.random((width, k)).astype(np.float32)), jnp.float32)
            o = jnp.asarray(rng.standard_normal((width, 3)), jnp.float32)
            d = jnp.asarray(rng.standard_normal((width, 3)), jnp.float32)

            @jax.jit
            def run(rows, topk_i, topk_e, o, d):
                tmin = jnp.zeros((width, 1))

                def body(j, carry):
                    bt, acc = carry
                    ej = jax.lax.dynamic_slice_in_dim(topk_e, j, 1, 1)[:, 0]
                    lj = jax.lax.dynamic_slice_in_dim(topk_i, j, 1, 1)[:, 0]
                    active = ej < bt
                    g = jnp.take(rows, lj, axis=0)
                    t, u, v, hit = _mt_leaf(g, o, d, tmin, bt[:, None])
                    tt = jnp.where(hit & active[:, None], t, 1e30)
                    tl = jnp.min(tt, axis=1)
                    bt = jnp.minimum(bt, tl + 1e5)  # keep active ~always on
                    return bt, acc + jnp.sum(tl) * 1e-30

                bt0 = jnp.full((width,), 1e30 - 1)
                bt, acc = jax.lax.fori_loop(0, REPS, body,
                                            (bt0, jnp.float32(0.0)))
                return acc

            dt = timeit(f"round L={leaf} W={width}", run, rows, topk_i,
                        topk_e, o, d)
            gb = width * 9 * leaf * 4 / 1e9
            print(f"      -> {gb / dt:6.1f} GB/s gather-equivalent", flush=True)

    # one-time preselect costs at R=32768
    R = 32768
    for n_l, k in ((769, 12), (769, 28), (385, 12), (193, 8)):
        ent = jnp.asarray(rng.random((R, n_l), np.float32))

        @jax.jit
        def tk(ent):
            def body(j, acc):
                e, i = jax.lax.top_k(-(ent + acc * 1e-30), k)
                return acc + jnp.sum(e[:, 0]) * 1e-30

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        timeit(f"top_k [{R},{n_l}] k={k}", tk, ent)

    keys = jnp.asarray(rng.integers(0, 1 << 30, R), jnp.int32)

    @jax.jit
    def srt(keys):
        def body(j, acc):
            o = jnp.argsort(keys + acc)
            return acc + o[0] * 0

        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    timeit(f"argsort [{R}] i32", srt, keys)

    aabb = jnp.asarray(rng.random((6, 769), np.float32))
    o = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)

    @jax.jit
    def slab(aabb, o, d):
        def body(j, acc):
            e = _slab_entries(aabb, o + acc * 1e-30, _safe_inv(d),
                              jnp.zeros((R, 1)), jnp.full((R, 1), 1e4))
            return acc + jnp.sum(e[:, 0]) * 1e-30

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    timeit(f"slab [{R},769]", slab, aabb, o, d)


if __name__ == "__main__":
    main()
