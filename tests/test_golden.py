"""Golden-image regression tests (SURVEY.md S4 item 3): small deterministic
scenes at fixed seed/spp against stored goldens.

Goldens were rendered on the CPU backend with the wave integrator (the
bit-reproducible schedule); the suite always runs on CPU (conftest), so
comparison is tight. Regenerate with tests/goldens/README instructions when
an INTENTIONAL semantic change lands.
"""
import os

import numpy as np
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box, textured_quad_scene
from rendertoy3c_tpu.scene.scene import build_scene

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
_CFG = dict(width=24, height=24, samples_per_launch=2, max_depth=4,
            ray_block=576, integrator="wave")


def _check(name, scene, cam):
    golden = np.load(os.path.join(_GOLDEN_DIR, name))["accum"]
    film, _ = render_frame(scene, cam.params(), RenderConfig(**_CFG),
                           subframes=2)
    got = np.asarray(film.accum)
    # same platform + schedule: only fusion-order ulps may differ
    np.testing.assert_allclose(got, golden, rtol=5e-6, atol=5e-6)


def test_golden_cornell():
    meshes, cam = cornell_box()
    _check("cornell_24.npz", build_scene(meshes), cam)


def test_golden_textured():
    meshes, textures, cam = textured_quad_scene()
    _check("textured_24.npz", build_scene(meshes, textures=textures), cam)


def test_golden_instanced():
    from rendertoy3c_tpu.scene.builtin import instanced_cornell
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.trace.instanced import make_instanced_tracer

    meshes, instances, cam = instanced_cornell()
    scene = build_instanced_scene(meshes, instances)
    golden = np.load(os.path.join(_GOLDEN_DIR, "instanced_24.npz"))["accum"]
    film, _ = render_frame(scene, cam.params(), RenderConfig(**_CFG),
                           subframes=2, tracer=make_instanced_tracer(scene))
    np.testing.assert_allclose(np.asarray(film.accum), golden,
                               rtol=5e-6, atol=5e-6)


def test_golden_direct():
    from rendertoy3c_tpu.integrate.direct import render_direct

    meshes, cam = cornell_box()
    golden = np.load(os.path.join(_GOLDEN_DIR, "direct_24.npz"))["accum"]
    film, _ = render_direct(build_scene(meshes), cam.params(),
                            RenderConfig(**_CFG), subframes=2)
    np.testing.assert_allclose(np.asarray(film.accum), golden,
                               rtol=5e-6, atol=5e-6)
