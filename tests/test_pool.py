"""Pool integrator vs wave integrator: identical per-path arithmetic, sums
differ only by float addition order."""
import dataclasses

import numpy as np
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box, textured_quad_scene
from rendertoy3c_tpu.scene.scene import build_scene


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes), camera


def _render(scene, camera, integrator, **kw):
    base = dict(width=24, height=24, samples_per_launch=3, max_depth=4,
                ray_block=512, integrator=integrator)
    base.update(kw)
    cfg = RenderConfig(**base)
    film, stats = render_frame(scene, camera.params(), cfg, subframes=1)
    return np.asarray(film.accum), stats


def test_pool_matches_wave(cornell):
    scene, camera = cornell
    wave, s_wave = _render(scene, camera, "wave")
    pool, s_pool = _render(scene, camera, "pool")
    # identical paths, different sum order -> tight but not exact
    np.testing.assert_allclose(pool, wave, rtol=2e-5, atol=2e-5)
    # identical ray counts: the pool traces exactly the same path segments
    assert int(s_pool.radiance_rays) == int(s_wave.radiance_rays)
    assert int(s_pool.shadow_rays) == int(s_wave.shadow_rays)


def test_pool_small_pool_size(cornell):
    """Pool smaller than the work list forces many refill rounds."""
    scene, camera = cornell
    wave, _ = _render(scene, camera, "wave")
    pool, _ = _render(scene, camera, "pool", ray_block=128)
    np.testing.assert_allclose(pool, wave, rtol=2e-5, atol=2e-5)


def test_pool_textured(cornell):
    meshes, textures, camera = textured_quad_scene()
    scene = build_scene(meshes, textures=textures)
    wave, _ = _render(scene, camera, "wave")
    pool, _ = _render(scene, camera, "pool")
    np.testing.assert_allclose(pool, wave, rtol=2e-5, atol=2e-5)


def test_pool_spp1(cornell):
    scene, camera = cornell
    wave, _ = _render(scene, camera, "wave", samples_per_launch=1)
    pool, _ = _render(scene, camera, "pool", samples_per_launch=1)
    # spp=1: one contribution per pixel, same math per path — differences are
    # limited to XLA fusion/FMA reassociation (last-ulp).
    np.testing.assert_allclose(pool, wave, rtol=1e-6, atol=1e-6)


def test_pool_sorted_matches_unsorted(cornell):
    scene, camera = cornell
    base = dict(width=20, height=20, samples_per_launch=2, max_depth=4,
                ray_block=128, integrator="pool")
    cam = camera.params()
    from rendertoy3c_tpu.integrate.path import render_frame as rf

    f0, s0 = rf(scene, cam, RenderConfig(**base), subframes=1)
    f1, s1 = rf(scene, cam, RenderConfig(sort_rays=True, **base), subframes=1)
    np.testing.assert_allclose(np.asarray(f1.accum), np.asarray(f0.accum),
                               rtol=2e-5, atol=2e-5)
    assert int(s1.radiance_rays) == int(s0.radiance_rays)


def test_pool_pixel_major_matches_wave(cornell):
    scene, camera = cornell
    base = dict(width=20, height=20, samples_per_launch=3, max_depth=4,
                ray_block=128, integrator="pool")
    cam = camera.params()
    from rendertoy3c_tpu.integrate.path import render_frame as rf

    f_wave, s_wave = rf(scene, cam,
                        RenderConfig(**{**base, "integrator": "wave"}),
                        subframes=1)
    f_px, s_px = rf(scene, cam,
                    RenderConfig(pool_pixel_major=True, flush_every=3, **base),
                    subframes=1)
    np.testing.assert_allclose(np.asarray(f_px.accum),
                               np.asarray(f_wave.accum),
                               rtol=2e-5, atol=2e-5)
    assert int(s_px.radiance_rays) == int(s_wave.radiance_rays)
    assert int(s_px.shadow_rays) == int(s_wave.shadow_rays)
