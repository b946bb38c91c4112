"""Alpha BLEND parity tests (whitted.cu:266-287 compositing and :113-137
fractional shadow attenuation)."""
import json

import numpy as np

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.direct import render_direct
from rendertoy3c_tpu.io.gltf import PointLight
from rendertoy3c_tpu.scene.builtin import quad
from rendertoy3c_tpu.scene.camera import Camera
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene


def _stack_scene(alpha=None, mode="BLEND", half=2.0):
    """Red quad at y=1 over a green floor at y=0; camera looks down."""
    meshes = []
    if alpha is not None:
        h = half
        v, f = quad([-h, 1, -h], [h, 1, -h], [h, 1, h], [-h, 1, h])
        meshes.append(Mesh(
            vertices=v[None], indices=f,
            material=Material(diffuse=(0.9, 0.1, 0.1), alpha_mode=mode,
                              alpha=alpha),
        ))
    fv, ff = quad([-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3])
    meshes.append(Mesh(vertices=fv[None], indices=ff,
                       material=Material(diffuse=(0.1, 0.9, 0.1))))
    return build_scene(meshes)


_CFG = RenderConfig(width=12, height=12, samples_per_launch=2, ray_block=144)
_CAM = Camera(eye=(0, 4.0, 0.01), lookat=(0, 0, 0), fov_y=50.0,
              aspect_ratio=1.0).params()


def _render(scene, ambient=(0.5, 0.5, 0.5), lights=()):
    film, _ = render_direct(scene, _CAM, _CFG, point_lights=list(lights),
                            ambient=ambient, subframes=1)
    return np.asarray(film.accum)


def test_blend_alpha_extremes_match_limits():
    """alpha=0 renders like the quad being absent; alpha=1 like OPAQUE."""
    img_a0 = _render(_stack_scene(alpha=0.0))
    img_none = _render(_stack_scene(alpha=None))
    np.testing.assert_allclose(img_a0, img_none, rtol=1e-5, atol=1e-6)

    img_a1 = _render(_stack_scene(alpha=1.0))
    img_opaque = _render(_stack_scene(alpha=1.0, mode="OPAQUE"))
    np.testing.assert_allclose(img_a1, img_opaque, rtol=1e-5, atol=1e-6)


def test_blend_composites_linearly_under_ambient():
    """Ambient-only shading has no shadow coupling, so the composite is
    exactly alpha * front + (1 - alpha) * behind."""
    a = 0.3
    img = _render(_stack_scene(alpha=a))
    img_front = _render(_stack_scene(alpha=1.0, mode="OPAQUE"))
    img_back = _render(_stack_scene(alpha=None))
    expect = a * img_front + (1.0 - a) * img_back
    np.testing.assert_allclose(img, expect, rtol=1e-4, atol=1e-5)


def test_blend_shadow_attenuation():
    """A BLEND occluder scales the floor's point-light term by (1-alpha):
    the reference occlusion-anyhit attenuation product."""
    import dataclasses

    light = PointLight(position=(0, 6, 0), intensity=40.0)
    # camera grazes under the quad: floor pixels seen directly, light path
    # crosses the quad
    cam = Camera(eye=(0, 0.5, 2.9), lookat=(0, 0, 0), fov_y=40.0,
                 aspect_ratio=1.0).params()
    cfg = dataclasses.replace(_CFG, bg_radiance=(0.0, 0.0, 0.0))

    def lum_img(alpha):
        # oversized occluder: every visible floor point's light path crosses
        # the quad interior (no jitter-averaged edge pixels)
        scene = _stack_scene(alpha=alpha, half=2.8)
        film, _ = render_direct(scene, cam, cfg, point_lights=[light],
                                ambient=(0, 0, 0), subframes=1)
        return np.asarray(film.accum).mean(axis=-1)

    base = lum_img(None)
    floor = base > 1e-4  # fixed pixel set: directly lit floor
    assert floor.sum() > 10
    for a in (0.25, 0.75):
        got = lum_img(a)
        np.testing.assert_allclose(got[floor], (1.0 - a) * base[floor],
                                   rtol=1e-4)
    # alpha = 1: fully blocked
    assert lum_img(1.0)[floor].max() < 1e-6


def test_gltf_blend_mode_parsed(tmp_path):
    from tests.test_gltf import _quad_gltf
    from rendertoy3c_tpu.io.gltf import load_gltf

    path = _quad_gltf(tmp_path)
    j = json.loads(open(path).read())
    j["materials"][0]["alphaMode"] = "BLEND"
    j["materials"][0]["alphaCutoff"] = 0.4  # must be ignored outside MASK
    open(path, "w").write(json.dumps(j))
    meshes, _, _, _ = load_gltf(path)
    assert meshes[0].material.alpha_mode == "BLEND"
    assert meshes[0].material.alpha_cutoff == 0.0
