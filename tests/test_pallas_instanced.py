"""Pallas two-level kernel vs the jnp instanced tracer (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box, quad
from rendertoy3c_tpu.scene.instanced import build_instanced_scene
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import Instance
from rendertoy3c_tpu.trace.instanced import make_instanced_tracer
from rendertoy3c_tpu.trace.pallas_instanced import make_pallas_instanced_tracer


def _xform(translate=(0, 0, 0), scale=1.0):
    t = np.zeros((3, 4), np.float32)
    t[:, :3] = np.eye(3) * scale
    t[:, 3] = translate
    return t


@pytest.fixture(scope="module")
def scene():
    white = Material(diffuse=(0.7, 0.7, 0.7))
    light = Material(emissive=(12.0, 12.0, 12.0))
    box = box_mesh([-0.3, 0.0, -0.3], [0.3, 0.6, 0.3], white)
    lv, lf = quad([-0.4, 2.0, -0.4], [-0.4, 2.0, 0.4], [0.4, 2.0, 0.4],
                  [0.4, 2.0, -0.4])
    lamp = Mesh(vertices=lv[None], indices=lf, material=light)
    instances = [
        Instance(mesh_index=0, transforms=_xform((-0.7, 0, 0))),
        Instance(mesh_index=0, transforms=_xform((0.7, 0, 0), scale=0.5)),
        Instance(mesh_index=1),
    ]
    return build_instanced_scene([box, lamp], instances)


def _rand_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-1.5, 0.1, -1.5], [1.5, 1.8, 1.5], (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_closest_matches_jnp(scene):
    o, d = _rand_rays(300)
    time = jnp.zeros((300,))
    ref_c, ref_a = make_instanced_tracer(scene)
    pal_c, pal_a = make_pallas_instanced_tracer(scene, interpret=True)
    h_ref = ref_c(o, d, 0.01, 1e16, time)
    h_pal = pal_c(o, d, 0.01, 1e16, time)
    np.testing.assert_array_equal(np.asarray(h_pal.prim), np.asarray(h_ref.prim))
    np.testing.assert_array_equal(np.asarray(h_pal.inst), np.asarray(h_ref.inst))
    np.testing.assert_allclose(np.asarray(h_pal.t), np.asarray(h_ref.t),
                               rtol=1e-5, atol=1e-5)


def test_any_matches_jnp(scene):
    o, d = _rand_rays(300, seed=1)
    time = jnp.zeros((300,))
    _, ref_a = make_instanced_tracer(scene)
    _, pal_a = make_pallas_instanced_tracer(scene, interpret=True)
    m_ref = ref_a(o, d, 0.001, 2.0, time)
    m_pal = pal_a(o, d, 0.001, 2.0, time)
    np.testing.assert_array_equal(np.asarray(m_pal), np.asarray(m_ref))


def test_render_matches(scene):
    from rendertoy3c_tpu.scene.camera import Camera

    camera = Camera(eye=(0, 1.5, 4.0), lookat=(0, 0.5, 0), fov_y=45.0)
    cfg = RenderConfig(width=20, height=20, samples_per_launch=1,
                       max_depth=3, ray_block=512)
    f_ref, _ = render_frame(scene, camera.params(), cfg, subframes=1,
                            tracer=make_instanced_tracer(scene))
    f_pal, _ = render_frame(scene, camera.params(), cfg, subframes=1,
                            tracer=make_pallas_instanced_tracer(scene, interpret=True))
    np.testing.assert_allclose(np.asarray(f_pal.accum), np.asarray(f_ref.accum),
                               rtol=1e-4, atol=1e-4)
