"""Does subdividing huge faces speed up the town walk? (timing-only hack)

Splits every face with AABB diag > THRESH into 4 (midpoint) recursively,
rebuilds the scene (normals copied flat — timing only), and benches the
walkpool on the 1080p static town config vs the unsplit scene.

Usage: python exp/exp_subdiv.py [faces=50000] [thresh=2.0]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ASSET_DIR = os.path.expanduser("~/.cache/rendertoy3c_assets")


def subdivide(v, f, thresh):
    """Midpoint-split faces with AABB diag > thresh (recursive)."""
    v = v.copy()
    tris = v[f]  # [F, 3, 3]
    out = []
    stack = list(tris)
    while stack:
        t = stack.pop()
        lo, hi = t.min(0), t.max(0)
        if np.linalg.norm(hi - lo) <= thresh:
            out.append(t)
            continue
        m01 = 0.5 * (t[0] + t[1])
        m12 = 0.5 * (t[1] + t[2])
        m02 = 0.5 * (t[0] + t[2])
        stack += [np.stack([t[0], m01, m02]), np.stack([m01, t[1], m12]),
                  np.stack([m02, m12, t[2]]), np.stack([m01, m12, m02])]
    tris = np.stack(out)
    nv = tris.reshape(-1, 3)
    nf = np.arange(nv.shape[0]).reshape(-1, 3)
    return nv, nf


def main():
    faces = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import make_render_fn
    from rendertoy3c_tpu.io.genassets import generate_town
    from rendertoy3c_tpu.io.obj import load_obj
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.auto import choose_tracer, tune_config

    paths, camkw = generate_town(ASSET_DIR, faces_target=faces)
    meshes, textures = load_obj(paths)
    cam = Camera(aspect_ratio=16 / 9, **camkw)

    def bench(ms, label, tex):
        scene = build_scene(ms, textures=tex or None)
        cfg = RenderConfig(width=1920, height=1080, samples_per_launch=8,
                           max_depth=16, ray_block=32768, integrator="pool",
                           pool_pixel_major=True)
        cfg = tune_config(scene, cfg, on_tpu=True)
        scene, tracer = choose_tracer(scene, cfg, on_tpu=True)
        step = make_render_fn(scene, cfg, tracer=tracer)
        film = film_create(cfg.height, cfg.width)
        film, stats = step(cam.params(), film)
        jax.block_until_ready(film.accum)
        rays = int(stats.radiance_rays) + int(stats.shadow_rays)
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            film, stats = step(cam.params(), film)
            jax.block_until_ready(film.accum)
            best = min(best, time.perf_counter() - t0)
        print(f"  {label}: faces={scene.num_faces} "
              f"{rays/best/1e6:6.2f} Mray/s ({best*1e3:.0f} ms)", flush=True)

    # untextured baseline (BASELINE config 1 shape): flat-grey materials
    grey = Material(diffuse=(0.73, 0.73, 0.73))
    flat = [Mesh(vertices=m.vertices, indices=m.indices,
                 material=(m.material if np.asarray(
                     m.material.emissive).max() > 0 else grey))
            for m in meshes]
    bench(flat, "unsplit   ", None)

    split = []
    for m in flat:
        emis = np.asarray(m.material.emissive).max() > 0
        if emis:
            split.append(m)
            continue
        nv, nf = subdivide(np.asarray(m.vertices[0]),
                           np.asarray(m.indices), thresh)
        split.append(Mesh(vertices=nv[None], indices=nf,
                          material=m.material))
    bench(split, f"split<{thresh}", None)


if __name__ == "__main__":
    main()
