"""Fast walkpool e2e timing on the bench workloads (49k field / towns).

Usage: python exp/exp_wp_e2e.py [configs...] [K=auto] [W=32768] [P=auto]
  configs: comma-set of {49k,200k,1M,town50,inst} (default 49k,200k)

Prints one line per config: Mray/s best/median over 3 subframes — the
edit-measure loop for walkpool/hierwalk changes (bench.py is the full
recorded suite; this is the quick probe).
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

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def _town(faces):
    from rendertoy3c_tpu.io.genassets import generate_town
    from rendertoy3c_tpu.io.obj import load_obj
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.scene import build_scene

    paths, camkw = generate_town(ASSET_DIR, faces_target=faces)
    meshes, textures = load_obj(paths[:1])
    import dataclasses
    for m in meshes:
        m.material = dataclasses.replace(
            m.material, diffuse_texture_id=-1, emissive_texture_id=-1,
            roughness_texture_id=-1, normal_texture_id=-1)
    return build_scene(meshes), Camera(**camkw)


def main():
    names = (sys.argv[1] if len(sys.argv) > 1 else "49k,200k").split(",")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
    p_paths = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import exp_wp_prof  # noqa: F401  (path side effects)
    from bench_tracers import box_field

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.auto import choose_tracer

    cfg = RenderConfig(width=768, height=768, samples_per_launch=8,
                       max_depth=16, ray_block=w, integrator="pool",
                       pool_pixel_major=True, sort_rays=True,
                       walk_phase_every=k, pool_paths=p_paths)

    for name in names:
        if name == "49k":
            scene = box_field(64)
            cam = Camera(eye=(0, 20, 45), lookat=(0, 0, 0), fov_y=50.0)
        elif name in ("200k", "1M", "town50"):
            faces = {"200k": 200000, "1M": 1000000, "town50": 50000}[name]
            scene, cam = _town(faces)
        elif name == "inst":
            import bench as _b
            scene, cam = _b._instance_field_scene()
        else:
            raise SystemExit(f"unknown config {name}")
        cam.aspect_ratio = 1.0
        scene, tracer = choose_tracer(scene, cfg, on_tpu=True)
        step = make_render_fn(scene, cfg, tracer=tracer)
        p = cam.params()
        film = film_create(cfg.height, cfg.width)
        t0 = time.perf_counter()
        film, _ = step(p, film)
        jax.block_until_ready(film.accum)
        compile_s = time.perf_counter() - t0
        rates = []
        for _ in range(3):
            f2 = film_create(cfg.height, cfg.width)
            t0 = time.perf_counter()
            f2, stats = step(p, f2)
            jax.block_until_ready(f2.accum)
            dt = time.perf_counter() - t0
            rays = int(stats.radiance_rays) + int(stats.shadow_rays)
            rates.append(rays / dt / 1e6)
        rates.sort()
        print(f"{name:7s} best {rates[-1]:6.2f}  med {rates[1]:6.2f} "
              f"Mray/s  (compile+warm {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
