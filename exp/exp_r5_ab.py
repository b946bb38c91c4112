"""Round-5 on-chip A/Bs, batched into ONE process (tunnel rule):

  tex:   textured town50 with RT3C_PRETEX 0/1 (in-kernel one-hot atlas
         fetch vs XLA-side pre-sampled texel rows)
  1M:    untextured 1M town with the 5-level DP table — inline shadow
         gate / x4 round unroll / K overrides (the n_levels<=4 gates
         were measured before DP dirs; re-measure at the new shape)

Usage: python exp/exp_r5_ab.py [tex|1M|both]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import bench as B
from bench import _bench_step, _town_scene

from rendertoy3c_tpu.film.film import film_create
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import make_render_fn
from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config


def run(name, scene, cam, cfg, env=None, timed=2):
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg_c = tune_config(scene, cfg, on_tpu=True)
        sc, tracer = choose_tracer(scene, cfg_c, on_tpu=True)
        step = make_render_fn(sc, cfg_c, tracer=tracer)
        cam.aspect_ratio = cfg_c.width / cfg_c.height
        t0 = time.perf_counter()
        best, med, _bt, _mt, stats = _bench_step(
            step, cam.params(),
            lambda: film_create(cfg_c.height, cfg_c.width), 1, timed)
        print(f"{name:28s}: best {best:6.2f} / med {med:6.2f} Mray/s "
              f"({time.perf_counter()-t0:.0f}s) env={env}", flush=True)
        return best
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=65536, integrator="pool",
                       pool_pixel_major=True, sort_rays=True)

    if which in ("tex", "both"):
        scene, cam = _town_scene(50000)
        run("textured PRETEX=0", scene, cam, cfg, {"RT3C_PRETEX": "0"})
        run("textured PRETEX=1", scene, cam, cfg, {"RT3C_PRETEX": "1"})
        scene, cam = _town_scene(50000, principled=True)
        cfg_p = dataclasses.replace(cfg, light_sampler="power")
        run("principled PRETEX=0", scene, cam, cfg_p, {"RT3C_PRETEX": "0"})
        run("principled PRETEX=1", scene, cam, cfg_p, {"RT3C_PRETEX": "1"})

    if which in ("1M", "both"):
        scene, cam = _town_scene(1000000, untextured=True)
        run("1M base (no gate/unroll)", scene, cam, cfg)
        run("1M gate", scene, cam, cfg, {"RT3C_INLINE_GATE": "1"})
        run("1M gate+unroll4", scene, cam, cfg,
            {"RT3C_INLINE_GATE": "1", "RT3C_ROUND_UNROLL": "4"})
        run("1M unroll4", scene, cam, cfg, {"RT3C_ROUND_UNROLL": "4"})
        cfg16 = dataclasses.replace(cfg, walk_phase_every=16)
        run("1M gate+unroll4 K=16", scene, cam, cfg16,
            {"RT3C_INLINE_GATE": "1", "RT3C_ROUND_UNROLL": "4"})
        cfg24 = dataclasses.replace(cfg, walk_phase_every=24)
        run("1M gate+unroll4 K=24", scene, cam, cfg24,
            {"RT3C_INLINE_GATE": "1", "RT3C_ROUND_UNROLL": "4"})


def attr_micro():
    """Boundary attr-gather variants at W=16384 over a 49k-face table:
    the current take_packed+transpose vs a lane-axis take of the
    transposed table vs the raw packed row gather (lower bound)."""
    import jax.numpy as jnp
    import numpy as np

    from rendertoy3c_tpu.trace.pallas_shade import pack_rows128, take_packed

    f, h, w = 49152, 16, 16384
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((f, h)).astype(np.float32))
    tab_t = jnp.asarray(np.ascontiguousarray(np.asarray(tab).T))
    packed = pack_rows128(tab)[0]
    idx = jnp.asarray(rng.integers(0, f, (w,)).astype(np.int32))

    reps = 256

    def timeit(name, fn):
        # on-device fori repetition (CLAUDE.md: never time single
        # dispatches over the tunnel); (idx + k) % f defeats hoisting
        def looped(i0):
            def body(k, acc):
                g = fn((i0 + k) % f)
                return acc + g.ravel()[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        r = jax.jit(looped)
        r(idx).block_until_ready()  # compile
        t0 = time.perf_counter()
        r(idx).block_until_ready()
        us = (time.perf_counter() - t0) / reps * 1e6
        print(f"  attr {name:24s}: {us:7.1f} us", flush=True)

    timeit("take_packed+T (cur)",
           lambda i: jnp.transpose(take_packed(packed, i, h), (1, 0)))
    timeit("take_packed only",
           lambda i: take_packed(packed, i, h))
    timeit("raw [W,128] gather",
           lambda i: jnp.take(packed, i // 8, axis=0))
    timeit("lane-axis take [16,F]",
           lambda i: jnp.take(tab_t, i, axis=1))
    timeit("narrow take [F,16]",
           lambda i: jnp.take(tab, i, axis=0))
    timeit("narrow take + T",
           lambda i: jnp.transpose(jnp.take(tab, i, axis=0), (1, 0)))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "attr":
        attr_micro()
    else:
        main()
