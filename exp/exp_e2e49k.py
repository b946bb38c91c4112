"""End-to-end 49k-scene profile: where does subframe time go?

Runs the current bench large_scene_49k config (pool integrator + tracer
choice via argv) and prints the per-op cost table from a device trace.

Usage: python exp/exp_e2e49k.py [leafwalk|walk:rt,k,leaf]
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

from exp_trav import build_big_scene


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "leafwalk"
    import dataclasses

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.utils.profiling import profile_step

    scene = build_big_scene()
    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=32768, integrator="pool",
                       pool_pixel_major=True, sort_rays=True)
    if spec == "leafwalk":
        from rendertoy3c_tpu.trace.leafwalk import make_leafwalk_tracer

        tracer = make_leafwalk_tracer(scene)
    else:
        rt, k, leaf = (int(x) for x in spec.split(":")[1].split(","))
        from rendertoy3c_tpu.trace.pallas_walk import make_walk_tracer

        tracer = make_walk_tracer(scene, rt=rt, k_sched=k, leaf=leaf)
    step = make_render_fn(scene, cfg, tracer=tracer)
    cam = Camera(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0)
    cam.aspect_ratio = 1.0
    p = cam.params()

    film = film_create(cfg.height, cfg.width)
    t0 = time.perf_counter()
    film, stats = step(p, film)
    jax.block_until_ready(film.accum)
    print(f"warm+compile: {time.perf_counter() - t0:.1f}s", flush=True)
    for trial in range(2):
        film2 = film_create(cfg.height, cfg.width)
        t0 = time.perf_counter()
        film2, stats = step(p, film2)
        jax.block_until_ready(film2.accum)
        dt = time.perf_counter() - t0
        rays = int(stats.radiance_rays) + int(stats.shadow_rays)
        print(f"subframe {dt * 1e3:.1f} ms  rays={rays}  "
              f"{rays / dt / 1e6:.2f} Mray/s", flush=True)

    rows = profile_step(
        step, rearm=lambda: (p, film_create(cfg.height, cfg.width)))
    for name, ms, cnt in rows[:22]:
        print(f"  {ms:9.2f} ms  x{cnt:5d}  {name[:90]}", flush=True)


if __name__ == "__main__":
    main()
