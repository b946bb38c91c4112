"""Fused shade kernel pipeline vs the XLA pool path (interpret mode)."""
import numpy as np
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.material import Material, MaterialType
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.pallas_shade import (
    FusedPipeline,
    fused_shade_eligible,
    make_fused_pipeline,
)


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes), camera


def _cfg(**kw):
    base = dict(width=16, height=16, samples_per_launch=2, max_depth=4,
                ray_block=256, integrator="pool")
    base.update(kw)
    return RenderConfig(**base)


def test_eligibility_gates(cornell):
    scene, _ = cornell
    cfg = _cfg()
    assert fused_shade_eligible(scene, cfg)
    assert not fused_shade_eligible(
        scene, _cfg(light_sampler="power")
    )
    meshes, _ = cornell_box()
    meshes[0].material = Material(material_type=MaterialType.SPECULAR)
    assert not fused_shade_eligible(build_scene(meshes), cfg)
    with pytest.raises(ValueError):
        make_fused_pipeline(scene, _cfg(throughput_model="physical"),
                            interpret=True)


def test_fused_matches_pool(cornell):
    scene, camera = cornell
    cfg = _cfg()
    cam = camera.params()
    f_ref, s_ref = render_frame(scene, cam, cfg, subframes=1)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, s_fused = render_frame(scene, cam, cfg, subframes=1, tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_ref.accum),
        rtol=3e-5, atol=3e-5,
    )
    # identical paths -> identical ray counts
    assert int(s_fused.radiance_rays) == int(s_ref.radiance_rays)
    assert int(s_fused.shadow_rays) == int(s_ref.shadow_rays)


def test_fused_textured_matches_pool():
    """Diffuse-textured scenes ride the fused path (in-kernel bilinear)."""
    from rendertoy3c_tpu.scene.builtin import textured_quad_scene

    meshes, textures, camera = textured_quad_scene()
    scene = build_scene(meshes, textures=textures)
    cfg = _cfg(samples_per_launch=4)
    assert fused_shade_eligible(scene, cfg)
    cam = camera.params()
    f_ref, s_ref = render_frame(scene, cam, cfg, subframes=1)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, s_fused = render_frame(scene, cam, cfg, subframes=1, tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_ref.accum),
        rtol=3e-5, atol=3e-5,
    )
    assert int(s_fused.radiance_rays) == int(s_ref.radiance_rays)
    assert int(s_fused.shadow_rays) == int(s_ref.shadow_rays)


def test_fused_textured_wrap_modes():
    """CLAMP/MIRROR samplers shade identically in fused and XLA paths."""
    from rendertoy3c_tpu.scene.builtin import textured_quad_scene
    from rendertoy3c_tpu.scene.texture import (
        WRAP_CLAMP, WRAP_MIRROR, TextureImage,
    )

    meshes, textures, camera = textured_quad_scene()
    # stretch uvs outside [0,1] so address modes matter
    meshes[0].texcoords = meshes[0].texcoords * 2.5 - 0.75
    textures = [TextureImage(textures[0], WRAP_CLAMP, WRAP_MIRROR)]
    scene = build_scene(meshes, textures=textures)
    cfg = _cfg(samples_per_launch=2)
    cam = camera.params()
    f_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, _ = render_frame(scene, cam, cfg, subframes=1, tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_ref.accum),
        rtol=3e-5, atol=3e-5,
    )


def test_fused_matches_wave_multi_subframe(cornell):
    scene, camera = cornell
    cfg = _cfg(samples_per_launch=1, max_depth=3)
    cam = camera.params()
    f_wave, _ = render_frame(
        scene, cam, RenderConfig(**{**cfg.__dict__, "integrator": "wave"}),
        subframes=2,
    )
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, _ = render_frame(scene, cam, cfg, subframes=2, tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_wave.accum),
        rtol=3e-5, atol=3e-5,
    )
