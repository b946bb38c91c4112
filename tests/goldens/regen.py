"""Regenerate the golden images (CPU backend, deterministic schedules).

Run from the repo root AFTER verifying a semantic change is intentional:

    python tests/goldens/regen.py

Path-traced goldens use the wave integrator (the bit-reproducible,
reference-ordered schedule); the direct-renderer golden is deterministic by
construction (per-pixel seeding, no inter-pixel reductions).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from rendertoy3c_tpu.integrate.config import RenderConfig  # noqa: E402
from rendertoy3c_tpu.integrate.direct import render_direct  # noqa: E402
from rendertoy3c_tpu.integrate.path import render_frame  # noqa: E402
from rendertoy3c_tpu.scene.builtin import (  # noqa: E402
    cornell_box,
    instanced_cornell,
    textured_quad_scene,
)
from rendertoy3c_tpu.scene.instanced import build_instanced_scene  # noqa: E402
from rendertoy3c_tpu.scene.scene import build_scene  # noqa: E402
from rendertoy3c_tpu.trace.instanced import make_instanced_tracer  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
CFG = dict(width=24, height=24, samples_per_launch=2, max_depth=4,
           ray_block=576, integrator="wave")


def save(name, film):
    path = os.path.join(HERE, name)
    np.savez_compressed(path, accum=np.asarray(film.accum))
    print(f"wrote {path}")


def main():
    meshes, cam = cornell_box()
    film, _ = render_frame(build_scene(meshes), cam.params(),
                           RenderConfig(**CFG), subframes=2)
    save("cornell_24.npz", film)

    meshes, textures, cam = textured_quad_scene()
    film, _ = render_frame(build_scene(meshes, textures=textures),
                           cam.params(), RenderConfig(**CFG), subframes=2)
    save("textured_24.npz", film)

    meshes, instances, cam = instanced_cornell()
    scene = build_instanced_scene(meshes, instances)
    film, _ = render_frame(scene, cam.params(), RenderConfig(**CFG),
                           subframes=2, tracer=make_instanced_tracer(scene))
    save("instanced_24.npz", film)

    meshes, cam = cornell_box()
    film, _ = render_direct(build_scene(meshes), cam.params(),
                            RenderConfig(**CFG), subframes=2)
    save("direct_24.npz", film)


if __name__ == "__main__":
    main()
