"""Benchmark harness: Mrays/sec (radiance + shadow) on the flagship workload.

Measures the BASELINE.md north-star metric — rays traced per wall-clock
second through the full wavefront integrator (primary + bounce radiance rays
plus NEE shadow probes, the counting rule of BASELINE.md) — on the Cornell
box at the reference's default 768x768 / 8 spp workload shape
(src/wavefront.cpp:300,55).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so vs_baseline is the ratio
against our own recorded first-round figure kept in BENCH_TARGET below —
i.e. a regression/progress tracker rather than a cross-vendor comparison.
"""
from __future__ import annotations

import json
import sys
import time

# First recorded TPU number for this workload; update when the kernel gets
# materially faster so vs_baseline tracks progress across rounds.
BENCH_TARGET_MRAYS = 13.5  # round-1 recorded figure (Pallas MT + ray pool)


def main():
    import jax

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.pallas_mt import make_pallas_mt_tracer

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                           max_depth=16, ray_block=8192, integrator="pool")
        warmup, timed = 1, 3
    else:  # CI smoke mode
        cfg = RenderConfig(width=96, height=96, samples_per_launch=1,
                           max_depth=4, ray_block=4096, integrator="pool")
        warmup, timed = 1, 1

    meshes, camera = cornell_box()
    camera.aspect_ratio = cfg.width / cfg.height
    scene = build_scene(meshes)
    tracer = make_pallas_mt_tracer(scene) if on_tpu else None
    step = make_render_fn(scene, cfg, tracer=tracer)
    cam = camera.params()
    film = film_create(cfg.height, cfg.width)

    for _ in range(warmup):
        film, stats = step(cam, film)
    jax.block_until_ready(film.accum)

    rays = 0
    t0 = time.perf_counter()
    for _ in range(timed):
        film, stats = step(cam, film)
        rays += int(stats.radiance_rays) + int(stats.shadow_rays)
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0

    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "mrays_per_sec_cornell_768_8spp",
        "value": round(mrays, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / BENCH_TARGET_MRAYS, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
