"""Ablate the resident-table walk kernel to find the per-round cycle thief.

Variants of _closest_kernel with pieces removed (some give wrong results —
perf only). Bounce wavefront, 49k scene, rt=32.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from exp_trav import build_big_scene, make_wavefronts
from rendertoy3c_tpu.trace import pallas_walk as pw

REPS = 20
ROUNDS = 14  # fixed trip count for fori variants


def make_kernel(variant):
    def kernel(count_ref, rays_ref, rows_ref, aabb_ref,
               out_ref, *, leaf, rt, g):
        for gi in range(g):
            base = gi * rt
            cols = pw._ray_cols(rays_ref, base, rt)
            inv3 = pw._inv_cols3(cols)
            o3 = cols[0:3]
            tmin = cols[6]

            ent = pw._slab_block(aabb_ref, o3, inv3, tmin, cols[7])
            emin = jnp.min(ent, axis=0, keepdims=True)

            init = (
                emin,
                cols[7],
                jnp.full((rt, 1), -1.0, jnp.float32),
            )

            def body(j, carry, cols=cols, o3=o3, inv3=inv3, tmin=tmin):
                emin, best_t, prim = carry
                if variant in ("fori_seq",):
                    lid = j * 2 + 1  # arbitrary in-range leaf
                else:
                    lid = pw._argmin_lane(emin)
                active = jnp.ones((rt, 1), bool)
                if variant == "fixed_row":
                    row = rows_ref[3]
                else:
                    row = rows_ref[lid]
                tcols = tuple(row[c:c + 1, :] for c in range(9))
                t, u, v, hit = pw._mt_block(
                    cols[0:3] + cols[3:6], tcols, tmin,
                    jnp.where(active, best_t, tmin))
                tt = jnp.where(hit, t, 1e30)
                t_c = jnp.min(tt, axis=1, keepdims=True)
                better = t_c < best_t
                prim_c = t_c  # placeholder payload
                if variant != "fori_seq":
                    lanes = jax.lax.broadcasted_iota(jnp.int32, emin.shape, 1)
                    emin = jnp.where(lanes == lid, jnp.float32(1e30), emin)
                return (
                    emin,
                    jnp.where(better, t_c, best_t),
                    jnp.where(better, prim_c, prim),
                )

            if variant == "static_cond":
                def bodyc(j, carry):
                    emin, best_t, *_ = carry
                    todo = jnp.min(emin) < jnp.max(best_t)
                    return jax.lax.cond(todo, lambda c: body(j, c),
                                        lambda c: c, carry)

                _, best_t, prim = jax.lax.fori_loop(0, ROUNDS, bodyc, init)
            elif variant == "dyn_fori":
                n_cand = jnp.sum((emin < 1e30).astype(jnp.int32))
                _, best_t, prim = jax.lax.fori_loop(0, n_cand, body, init)
            elif variant == "while":
                def cond(carry):
                    emin, best_t, *_ = carry
                    return jnp.min(emin) < jnp.max(best_t)

                def bodyw(carry):
                    return body(0, carry)

                _, best_t, prim = jax.lax.while_loop(cond, bodyw, init)
            else:
                _, best_t, prim = jax.lax.fori_loop(
                    0, ROUNDS, body, init)
            out_ref[base:base + rt, 0:1] = best_t
            out_ref[base:base + rt, 1:2] = prim
            out_ref[base:base + rt, 2:4] = jnp.zeros((rt, 2), jnp.float32)

    return kernel


def main():
    scene = build_big_scene()
    waves = make_wavefronts(scene)
    o, d = waves["bounce_sorted"]
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    rt = 32
    tab = pw.build_walk_table(scene.geom, scene.num_faces, leaf=128)
    rays, r, r_pad = pw._pack(o, d, 1e-3, 1e4, rt)
    count = jnp.asarray(r, jnp.int32).reshape(1)

    for variant in ("no_boxentry", "static_cond", "dyn_fori"):
        kern = make_kernel(variant)

        @jax.jit
        def run(rays):
            def body(i, acc):
                out = pw._walk_call(kern, count,
                                    rays.at[0, 0].add(acc * 1e-30), tab, rt,
                                    False)
                return acc + jnp.sum(out[:, 0]) * 1e-30

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        try:
            res = run(rays)
            jax.block_until_ready(res)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(run(rays))
                best = min(best, (time.perf_counter() - t0) / REPS)
            print(f"  {variant:14s} {best * 1e3:9.3f} ms/call", flush=True)
        except Exception as e:
            print(f"  {variant:14s} FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
