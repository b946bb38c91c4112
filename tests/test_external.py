"""External shade pipeline (any tracer + packed-state kernel) vs XLA pool.

The external pipeline decouples the Pallas shade/NEE/RR megakernel from the
in-kernel trace stage: closest/any-hit run through a caller-supplied tracer
(leafwalk, brute-force, tile-cull motion, ...) while the kernel keeps the
whole packed per-lane state. Per-path arithmetic and RNG streams match the
fused megakernel, so comparisons against the plain XLA pool reuse
test_fused.py's tolerance story (FMA contraction flips RNG-boundary paths).
"""
import numpy as np
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.material import Material, MaterialType
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer
from rendertoy3c_tpu.trace.leafwalk import make_leafwalk_tracer
from rendertoy3c_tpu.trace.pallas_shade import (
    MAX_ONEHOT_FACES,
    external_shade_eligible,
    fused_shade_eligible,
    make_external_pipeline,
)


def _cfg(**kw):
    base = dict(width=16, height=16, samples_per_launch=2, max_depth=4,
                ray_block=256, integrator="pool")
    base.update(kw)
    return RenderConfig(**base)


def _match(scene, camera, cfg, tracer, strict=False, **render_kw):
    """XLA pool vs external pipeline over the SAME tracer backend.

    strict=True when the tracer is the brute-force pair the XLA pool also
    uses, so per-lane hit inputs are bit-identical and only FMA contraction
    can diverge paths (see test_fused._match)."""
    cam = camera.params()
    f_ref, s_ref = render_frame(scene, cam, cfg, subframes=1, **render_kw)
    pipe = make_external_pipeline(scene, cfg, tracer, interpret=True)
    f_ext, s_ext = render_frame(scene, cam, cfg, subframes=1, tracer=pipe,
                                **render_kw)
    a = np.asarray(f_ext.accum)
    b = np.asarray(f_ref.accum)
    close = np.isclose(a, b, rtol=3e-5, atol=3e-5)
    frac = 0.98 if strict else 0.95
    assert close.mean() > frac, f"only {close.mean():.4f} matched"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=5e-3)
    assert abs(int(s_ext.radiance_rays) - int(s_ref.radiance_rays)) \
        <= 0.02 * int(s_ref.radiance_rays) + 16
    assert abs(int(s_ext.shadow_rays) - int(s_ref.shadow_rays)) \
        <= 0.02 * int(s_ref.shadow_rays) + 16


def test_eligibility_no_face_limit():
    """External eligibility drops the fused path's one-hot face budget."""
    meshes, _ = cornell_box()
    scene = build_scene(meshes)
    cfg = _cfg()
    assert external_shade_eligible(scene, cfg)
    assert scene.num_faces <= MAX_ONEHOT_FACES  # fused limit exists
    with pytest.raises(ValueError):
        make_external_pipeline(
            scene, _cfg(throughput_model="physical"),
            make_bruteforce_tracer(scene), interpret=True)


def test_external_bruteforce_matches_pool():
    """Same tracer on both sides: only kernel-vs-XLA FMA deltas remain."""
    meshes, camera = cornell_box()
    scene = build_scene(meshes)
    _match(scene, camera, _cfg(samples_per_launch=4),
           make_bruteforce_tracer(scene), strict=True)


def test_external_leafwalk_matches_pool():
    meshes, camera = cornell_box()
    scene = build_scene(meshes)
    _match(scene, camera, _cfg(samples_per_launch=4),
           make_leafwalk_tracer(scene))


def test_external_dispatch_power_matches_pool():
    """Principled dispatch + power light pick through the external kernel."""
    meshes, camera = cornell_box()
    meshes[0].material = Material(
        material_type=MaterialType.PRINCIPLED, diffuse=(0.7, 0.6, 0.5),
        roughness=0.35, metallic=0.6,
    )
    scene = build_scene(meshes)
    _match(scene, camera,
           _cfg(light_sampler="power", samples_per_launch=4),
           make_bruteforce_tracer(scene), strict=True)


def test_external_textured_matches_pool():
    """Diffuse textures shade in-kernel from pre-gathered uv attr rows."""
    from rendertoy3c_tpu.scene.builtin import textured_quad_scene

    meshes, textures, camera = textured_quad_scene()
    scene = build_scene(meshes, textures=textures)
    cfg = _cfg(samples_per_launch=4)
    _match(scene, camera, cfg, make_bruteforce_tracer(scene), strict=True)


def test_external_motion_matches_pool():
    """2-key motion: the kernel emits the occlusion-time peek in shadow
    column 8; closest/any lerp outside through the motion tracer."""
    from rendertoy3c_tpu.scene.scene import Instance

    meshes, camera = cornell_box()
    two_key = np.zeros((2, 3, 4), np.float32)
    two_key[:, :, :3] = np.eye(3)
    two_key[1, 0, 3] = 0.25
    inst = [Instance(mesh_index=i) for i in range(len(meshes) - 1)]
    inst.append(Instance(mesh_index=len(meshes) - 1, transforms=two_key))
    scene = build_scene(meshes, instances=inst)
    assert scene.num_keys == 2
    _match(scene, camera, _cfg(samples_per_launch=4),
           make_bruteforce_tracer(scene), strict=True)


def test_external_aov_matches_pool():
    """First-hit albedo/normal accumulators ride the widened misc blob."""
    meshes, camera = cornell_box()
    scene = build_scene(meshes)
    cfg = _cfg(samples_per_launch=4, aov=True)
    cam = camera.params()
    f_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    pipe = make_external_pipeline(scene, cfg, make_bruteforce_tracer(scene),
                                  interpret=True)
    f_ext, _ = render_frame(scene, cam, cfg, subframes=1, tracer=pipe)
    for field in ("accum", "albedo", "normal"):
        a = np.asarray(getattr(f_ext, field))
        b = np.asarray(getattr(f_ref, field))
        close = np.isclose(a, b, rtol=3e-5, atol=3e-5)
        assert close.mean() > 0.98, f"{field}: only {close.mean():.4f}"


def test_external_over_onehot_budget():
    """A scene past MAX_ONEHOT_FACES (fused-ineligible) renders through the
    external pipeline and matches the XLA pool."""
    from rendertoy3c_tpu.scene.builtin import box_mesh, quad
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.mesh import Mesh

    rng = np.random.default_rng(3)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(16):
        for gz in range(16):
            m = box_mesh([gx - 8, 0, gz - 8],
                         [gx - 7.3, rng.uniform(0.3, 1.5), gz - 7.3], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-3, 12, -3], [-3, 12, 3], [3, 12, 3], [3, 12, -3])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(30.0, 30.0, 30.0)))
    scene = build_scene([big, lamp])
    assert scene.num_faces > MAX_ONEHOT_FACES
    cfg = _cfg(samples_per_launch=2, max_depth=3, ray_block=512)
    assert not fused_shade_eligible(scene, cfg)
    assert external_shade_eligible(scene, cfg)
    camera = Camera(eye=(0, 8, 18), lookat=(0, 0, 0), fov_y=45.0)
    _match(scene, camera, cfg, make_leafwalk_tracer(scene))


def test_external_instanced_matches_pool():
    """Trace-time instanced scenes shade in-kernel: the 9 inverse-transpose
    attr rows transform the object-space normal (path.py:103-107 order)."""
    from rendertoy3c_tpu.scene.instanced import build_instanced_scene
    from rendertoy3c_tpu.scene.scene import Instance
    from rendertoy3c_tpu.trace.instanced import make_instanced_tracer

    meshes, camera = cornell_box(with_blocks=False)
    inst = [Instance(mesh_index=i) for i in range(len(meshes))]
    for k, (gx, gz) in enumerate(((-0.5, 0.0), (0.4, -0.3), (0.1, 0.5))):
        t = np.zeros((3, 4), np.float32)
        t[0, 0] = 0.3
        t[1, 1] = 0.2 + 0.1 * k
        t[2, 2] = 0.25
        # a little shear so the inverse-transpose is non-trivial
        t[0, 1] = 0.1
        t[:, 3] = (gx, 0.15, gz)
        inst.append(Instance(mesh_index=0, transforms=t))
    iscene = build_instanced_scene(meshes, inst)
    cfg = _cfg(samples_per_launch=2)
    tracer = make_instanced_tracer(iscene)
    cam = camera.params()
    f_ref, s_ref = render_frame(iscene, cam, cfg, subframes=1, tracer=tracer)
    pipe = make_external_pipeline(iscene, cfg, tracer, interpret=True)
    f_ext, s_ext = render_frame(iscene, cam, cfg, subframes=1, tracer=pipe)
    a = np.asarray(f_ext.accum)
    b = np.asarray(f_ref.accum)
    close = np.isclose(a, b, rtol=3e-5, atol=3e-5)
    assert close.mean() > 0.98, f"only {close.mean():.4f} matched"
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=5e-3)
    assert abs(int(s_ext.radiance_rays) - int(s_ref.radiance_rays)) \
        <= 0.02 * int(s_ref.radiance_rays) + 16
    assert abs(int(s_ext.shadow_rays) - int(s_ref.shadow_rays)) \
        <= 0.02 * int(s_ref.shadow_rays) + 16
