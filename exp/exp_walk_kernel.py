"""Dissect the block-walk kernel cost on TPU: single-pass kernel time vs
K (schedule width), RT, plus schedule-build (slab+top_k) time, on the 49k
bounce wavefront."""
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

from exp_trav import build_big_scene, make_wavefronts
from rendertoy3c_tpu.trace import pallas_walk as pw

REPS = 30


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"  {name:40s} {best * 1e6:9.1f} us", flush=True)
    return best


def main():
    scene = build_big_scene()
    waves = make_wavefronts(scene)
    o, d = waves["bounce_sorted"]
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    R = o.shape[0]

    for leaf in (128, 256):
        tab = pw.build_walk_table(scene.geom, scene.num_faces, leaf=leaf)
        print(f"LEAF={leaf}: L={tab.n_leaves}", flush=True)
        for rt in (16, 32, 64):
            rays, r, r_pad = pw._pack(o, d, 1e-3, 1e4, rt)
            count = jnp.asarray(R, jnp.int32).reshape(1)

            @jax.jit
            def sched_build(rays):
                return pw._block_entries(tab, rays, r_pad, rt, R)

            be = sched_build(rays)

            @jax.jit
            def sched_loop(rays):
                def body(i, acc):
                    be = pw._block_entries(tab, rays, r_pad, rt, R)
                    return acc + be[0, 0] * 1e-30
                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            timeit(f"rt={rt} slab+reduce", sched_loop, rays)

            for k in (8, 16, 32):
                kk = min(k, tab.n_leaves)

                @jax.jit
                def one_pass(rays, be):
                    def body(i, acc):
                        neg, idxs = jax.lax.top_k(-(be + acc * 1e-30), kk)
                        out = pw._walk_call(
                            pw._closest_kernel, count,
                            idxs.astype(jnp.int32), rays, tab, rt, False)
                        return acc + jnp.sum(out[:, 0]) * 1e-30
                    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

                timeit(f"rt={rt} K={kk} topk+kernel 1 pass", one_pass, rays,
                       be)


if __name__ == "__main__":
    main()
