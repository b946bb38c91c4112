"""Fast fused/megakernel-band e2e timing (the bench's small-scene
configs: Cornell 768^2, Cornell 1080p, baked TLAS, trace-time instanced).

Usage: python exp/exp_fused_e2e.py [configs] [W=32768]
  configs: comma-set of {lambert,1080p,tlas,tracetime} (default all)

The quick edit-measure probe for _render_pool_fused / external-pipeline
changes (bench.py is the recorded suite). A/B knobs: RT3C_POOL_STASH=0/1.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    names = (sys.argv[1] if len(sys.argv) > 1
             else "lambert,1080p,tlas,tracetime").split(",")
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.scene import Instance, build_scene
    from rendertoy3c_tpu.trace.auto import tune_config

    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=w, integrator="pool",
                       pool_pixel_major=True)

    def inst_parts():
        meshes, ccam = cornell_box(with_blocks=False)
        xs = []
        for gx in (-0.6, 0.0, 0.6):
            for gz in (-0.6, 0.0, 0.6):
                t = np.zeros((3, 4), np.float32)
                t[:, :3] = np.eye(3) * 0.25
                t[:, 3] = (gx, 0.2, gz)
                xs.append(t)
        inst = [Instance(mesh_index=i) for i in range(len(meshes))]
        inst += [Instance(mesh_index=0, transforms=t) for t in xs]
        return meshes, inst, ccam

    for name in names:
        cfg_c = cfg
        if name == "lambert":
            meshes, cam = cornell_box()
            scene = build_scene(meshes)
        elif name == "1080p":
            meshes, cam = cornell_box()
            scene = build_scene(meshes)
            cfg_c = dataclasses.replace(cfg, width=1920, height=1080)
        elif name == "tlas":
            meshes, inst, cam = inst_parts()
            scene = build_scene(meshes, instances=inst)
        elif name == "tracetime":
            meshes, inst, cam = inst_parts()
            scene = build_instanced_scene(meshes, inst)
        else:
            raise SystemExit(f"unknown config {name}")
        cam.aspect_ratio = cfg_c.width / cfg_c.height
        from bench import _auto_tracer

        cfg_c = tune_config(scene, cfg_c, on_tpu=True)
        scene, tracer = _auto_tracer(scene, cfg_c, True)
        step = make_render_fn(scene, cfg_c, tracer=tracer)
        p = cam.params()
        film = film_create(cfg_c.height, cfg_c.width)
        t0 = time.perf_counter()
        film, _ = step(p, film)
        jax.block_until_ready(film.accum)
        compile_s = time.perf_counter() - t0
        rates = []
        for _ in range(3):
            f2 = film_create(cfg_c.height, cfg_c.width)
            t0 = time.perf_counter()
            f2, stats = step(p, f2)
            jax.block_until_ready(f2.accum)
            dt = time.perf_counter() - t0
            rays = int(stats.radiance_rays) + int(stats.shadow_rays)
            rates.append(rays / dt / 1e6)
        rates.sort()
        print(f"{name:10s} best {rates[-1]:6.2f}  med {rates[1]:6.2f} "
              f"Mray/s  (compile+warm {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
