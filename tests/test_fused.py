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
    # dispatch + power sampler are fused-supported now
    assert fused_shade_eligible(scene, _cfg(light_sampler="power"))
    meshes, _ = cornell_box()
    meshes[0].material = Material(material_type=MaterialType.SPECULAR)
    assert fused_shade_eligible(build_scene(meshes), cfg)
    with pytest.raises(ValueError):
        make_fused_pipeline(scene, _cfg(throughput_model="physical"),
                            interpret=True)


def _match(scene, camera, cfg, **render_kw):
    """XLA vs fused-kernel comparison robust to MC path divergence.

    XLA contracts a*b+c chains into FMAs that the interpret-mode kernel
    evaluates as discrete rounded ops, so per-lane float streams differ by
    ~1 ulp; paths whose RNG/lobe branch predicates sit exactly on such a
    boundary diverge entirely. Nearly all pixels must still match tightly,
    and the image statistics must agree."""
    cam = camera.params()
    f_ref, s_ref = render_frame(scene, cam, cfg, subframes=1, **render_kw)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, s_fused = render_frame(scene, cam, cfg, subframes=1,
                                    tracer=pipe, **render_kw)
    a = np.asarray(f_fused.accum)
    b = np.asarray(f_ref.accum)
    close = np.isclose(a, b, rtol=3e-5, atol=3e-5)
    assert close.mean() > 0.98, f"only {close.mean():.4f} matched"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=2e-3)
    # diverged paths may add/drop a few segments
    assert abs(int(s_fused.radiance_rays) - int(s_ref.radiance_rays)) \
        <= 0.01 * int(s_ref.radiance_rays) + 8
    assert abs(int(s_fused.shadow_rays) - int(s_ref.shadow_rays)) \
        <= 0.01 * int(s_ref.shadow_rays) + 8


def test_fused_dispatch_principled_power_matches_pool():
    """The principled+power bench workload rides the fused kernel."""
    meshes, camera = cornell_box()
    meshes[0].material = Material(
        material_type=MaterialType.PRINCIPLED, diffuse=(0.7, 0.6, 0.5),
        roughness=0.35, metallic=0.6,
    )
    scene = build_scene(meshes)
    assert not scene.all_diffuse
    _match(scene, camera, _cfg(light_sampler="power", samples_per_launch=4))


def test_fused_dispatch_delta_lobes_match_pool():
    """Mirror + glass (delta lobes: NEE skip, emission after delta chains)."""
    meshes, camera = cornell_box()
    meshes[3].material = Material(material_type=MaterialType.SPECULAR,
                                  diffuse=(0.9, 0.9, 0.9))
    meshes[6].material = Material(
        material_type=MaterialType.FRESNEL_TRANSMISSIVE, ior=1.5,
        transmittance=0.8, diffuse=(1.0, 1.0, 1.0),
    )
    scene = build_scene(meshes)
    _match(scene, camera, _cfg(samples_per_launch=4, max_depth=6))


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


def test_fused_motion_matches_pool():
    """2-key motion scenes ride the fused pipeline (lerped closest +
    lerped shadow sweep at the per-ray occlusion time)."""
    from rendertoy3c_tpu.scene.scene import Instance

    meshes, camera = cornell_box()
    two_key = np.zeros((2, 3, 4), np.float32)
    two_key[:, :, :3] = np.eye(3)
    two_key[1, 0, 3] = 0.25
    inst = [Instance(mesh_index=i) for i in range(len(meshes) - 1)]
    inst.append(Instance(mesh_index=len(meshes) - 1, transforms=two_key))
    scene = build_scene(meshes, instances=inst)
    assert scene.num_keys == 2
    _match(scene, camera, _cfg(samples_per_launch=4))


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


def test_fused_uv_transform_matches_pool():
    """KHR_texture_transform-style uv transforms shade in-kernel (attr rows
    23-28) identically to the XLA path's post-interpolation transform."""
    from rendertoy3c_tpu.scene.builtin import textured_quad_scene

    meshes, textures, camera = textured_quad_scene()
    meshes[0].material.tex_offset = (0.15, -0.1)
    meshes[0].material.tex_rotation = 0.35
    meshes[0].material.tex_scale = (1.5, 0.8)
    scene = build_scene(meshes, textures=textures)
    assert scene.any_uv_transform
    cfg = _cfg(samples_per_launch=2)
    assert fused_shade_eligible(scene, cfg)
    cam = camera.params()
    f_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, _ = render_frame(scene, cam, cfg, subframes=1, tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_ref.accum),
        rtol=3e-5, atol=3e-5,
    )


def test_fused_normal_map_matches_pool():
    """Tangent-space normal mapping runs in-kernel (baked per-face raw
    tangents + a second texture fetch) identically to path.py:116-148."""
    from rendertoy3c_tpu.scene.builtin import quad
    from rendertoy3c_tpu.scene.material import MaterialType
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.camera import Camera

    bumpy = np.zeros((8, 8, 4), np.uint8)
    bumpy[..., 0] = np.tile(np.linspace(40, 215, 8, dtype=np.uint8), (8, 1))
    bumpy[..., 1] = 128
    bumpy[..., 2] = 220
    bumpy[..., 3] = 255

    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    lv, lf = quad([-0.4, 2, -0.4], [-0.4, 2, 0.4], [0.4, 2, 0.4],
                  [0.4, 2, -0.4])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(12, 12, 12)))
    mat = Material(material_type=MaterialType.PRINCIPLED,
                   diffuse=(0.7, 0.7, 0.7), roughness=0.8,
                   normal_texture_id=0)
    floor = Mesh(vertices=v[None], indices=f, texcoords=uvs, material=mat)
    scene = build_scene([floor, lamp], textures=[bumpy])
    assert scene.any_normal_map
    cam = Camera(eye=(0, 1.5, 2.0), lookat=(0, 0, 0), fov_y=45.0)
    cfg = _cfg(samples_per_launch=4, max_depth=3)
    assert fused_shade_eligible(scene, cfg)
    f_ref, _ = render_frame(scene, cam.params(), cfg, subframes=2)
    pipe = make_fused_pipeline(scene, cfg, interpret=True)
    f_fused, _ = render_frame(scene, cam.params(), cfg, subframes=2,
                              tracer=pipe)
    np.testing.assert_allclose(
        np.asarray(f_fused.accum), np.asarray(f_ref.accum),
        rtol=3e-5, atol=3e-5,
    )


def test_fused_stashless_bitexact(cornell):
    """pool_stash=0 (completed lanes wait parked for the flush, the
    pre-r3 retire path at the tighter cadence) only reorders WHEN lanes
    free — per-pixel sums are bit-identical to the stash pool, and ray
    counts match exactly."""
    scene, camera = cornell
    cam = camera.params()
    pipe = make_fused_pipeline(scene, _cfg(), interpret=True)
    cfg_on = _cfg(pool_pixel_major=True, pool_stash=1)
    cfg_off = _cfg(pool_pixel_major=True, pool_stash=0)
    f_on, s_on = render_frame(scene, cam, cfg_on, subframes=1, tracer=pipe)
    f_off, s_off = render_frame(scene, cam, cfg_off, subframes=1,
                                tracer=pipe)
    assert int(s_on.radiance_rays) == int(s_off.radiance_rays)
    assert int(s_on.shadow_rays) == int(s_off.shadow_rays)
    np.testing.assert_allclose(np.asarray(f_on.accum),
                               np.asarray(f_off.accum),
                               rtol=1e-6, atol=1e-6)
