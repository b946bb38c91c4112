"""TPU bench: walk-pool integrator on the large-scene configs.

Usage: python exp/exp_walkpool.py [49|197] [spp] [K ...]
Prints Mray/s for the classic pool+hierwalk baseline and walkpool at each K.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_tracers import box_field


def bench_step(step, cam, film0, reps=3):
    from rendertoy3c_tpu.film.film import film_create

    film, stats = step(cam, film0)
    jax.block_until_ready(film.accum)
    n_rays = int(stats.radiance_rays) + int(stats.shadow_rays)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        film, stats = step(cam, film)
        jax.block_until_ready(film.accum)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    return n_rays / dt / 1e6, dt


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 49
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ks = [int(x) for x in sys.argv[3:]] or [4, 8, 12, 16]
    import dataclasses

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.integrate.walkpool import make_walkpool_pipeline
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import (
        HIER_LEAF, build_hier_table, make_hierwalk_tracer,
    )

    n_side = 64 if side == 49 else 128
    scene0 = box_field(n_side)
    # the bench large_scene camera (bench.py large_scene_49k record)
    cam = Camera(eye=(0.0, 20.0, 45.0), lookat=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fov_y=50.0, aspect_ratio=1.0)
    print(f"faces={scene0.num_faces} spp={spp}", flush=True)

    cfg = RenderConfig(width=768, height=768, samples_per_launch=spp,
                       max_depth=16, ray_block=16384, integrator="pool",
                       pool_pixel_major=True, sort_rays=True, flush_every=8)
    scene = split_order_scene(scene0, leaf=HIER_LEAF)

    # external-pipeline baseline (the previous auto pick at this scale)
    from rendertoy3c_tpu.trace.pallas_shade import make_external_pipeline

    tracer = make_hierwalk_tracer(scene)
    ext = make_external_pipeline(scene, cfg, tracer)
    step = make_render_fn(scene, cfg, tracer=ext)
    r, dt = bench_step(step, cam.params(), film_create(cfg.height, cfg.width))
    print(f"  classic external pipeline: {r:7.2f} Mray/s  ({dt*1e3:.0f} ms)",
          flush=True)

    for k in ks:
        for rb in (16384, 32768):
            cfg_w = dataclasses.replace(cfg, walk_phase_every=k,
                                        sort_rays=False, ray_block=rb)
            wp = make_walkpool_pipeline(scene, cfg_w)
            step = make_render_fn(scene, cfg_w, tracer=wp)
            r, dt = bench_step(step, cam.params(),
                               film_create(cfg.height, cfg.width))
            print(f"  walkpool K={k:2d} W={rb}: {r:7.2f} Mray/s  "
                  f"({dt*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
