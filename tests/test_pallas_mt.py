"""Fused Pallas MT kernel vs the jnp brute-force oracle (interpret mode on
CPU; the same kernels compile for TPU unchanged)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.intersect import (
    trace_any_bruteforce,
    trace_closest_bruteforce,
)
from rendertoy3c_tpu.trace.pallas_mt import (
    make_pallas_mt_tracer,
    trace_any_mt,
    trace_closest_mt,
    build_tri_soup,
    TriSoup,
)


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes), camera


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-0.9, 0.05, -0.9], [0.9, 1.9, 0.9], (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_closest_matches_bruteforce(cornell):
    scene, _ = cornell
    o, d = _random_rays(300)
    time = jnp.zeros((300,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    soup = build_tri_soup(scene.geom)
    soup = soup._replace(num_faces=scene.num_faces)
    got = trace_closest_mt(soup, o, d, 0.01, 1e16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(
        np.asarray(got.t), np.asarray(ref.t), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.u), np.asarray(ref.u), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.v), np.asarray(ref.v), rtol=1e-4, atol=1e-5
    )


def test_any_matches_bruteforce(cornell):
    scene, _ = cornell
    o, d = _random_rays(300, seed=1)
    time = jnp.zeros((300,))
    ref = trace_any_bruteforce(
        scene.geom, o, d, 0.001, 1.5, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    soup = build_tri_soup(scene.geom)
    soup = soup._replace(num_faces=scene.num_faces)
    got = trace_any_mt(soup, o, d, 0.001, 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_render_with_pallas_tracer_matches_bruteforce(cornell):
    scene, camera = cornell
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame

    cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                       max_depth=3, ray_block=256)
    cam = camera.params()
    film_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    tracer = make_pallas_mt_tracer(scene, interpret=True)
    film_mt, _ = render_frame(scene, cam, cfg, subframes=1, tracer=tracer)
    np.testing.assert_allclose(
        np.asarray(film_mt.accum), np.asarray(film_ref.accum),
        rtol=1e-4, atol=1e-4,
    )


def test_nonaligned_ray_count(cornell):
    scene, _ = cornell
    o, d = _random_rays(77, seed=2)
    soup = build_tri_soup(scene.geom)
    soup = soup._replace(num_faces=scene.num_faces)
    hit = trace_closest_mt(soup, o, d, 0.01, 1e16, interpret=True)
    assert hit.t.shape == (77,)
    time = jnp.zeros((77,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))


def test_motion_matches_bruteforce():
    """2-key motion kernel vs the jnp lerped brute force."""
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.material import Material

    v_k0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                     [2, 0, 0], [3, 0, 0], [2, 1, 0]], np.float32)
    v_k1 = v_k0 + np.array([0.5, 0.25, 0.0], np.float32)
    mesh = Mesh(vertices=np.stack([v_k0, v_k1]),
                indices=[[0, 1, 2], [3, 4, 5]],
                material=Material())
    scene = build_scene([mesh])
    assert scene.num_keys == 2

    rng = np.random.default_rng(5)
    n = 200
    o = jnp.asarray(
        rng.uniform([-1, -1, 0.5], [4, 2, 2.0], (n, 3)), jnp.float32
    )
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    time = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)

    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.001, 100.0, time,
        num_keys=2, num_faces=scene.num_faces, chunk=512,
    )
    closest, any_hit = make_pallas_mt_tracer(scene, interpret=True)
    got = closest(o, d, 0.001, 100.0, time)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)

    ref_a = trace_any_bruteforce(
        scene.geom, o, d, 0.001, 100.0, time,
        num_keys=2, num_faces=scene.num_faces, chunk=512,
    )
    got_a = any_hit(o, d, 0.001, 100.0, time)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))


def test_motion_render_matches_bruteforce():
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import Instance, build_scene as bs
    import numpy as _np

    meshes, camera = cornell_box(with_blocks=False)
    # animate the light quad sideways with 2-key instance motion
    two_key = _np.zeros((2, 3, 4), _np.float32)
    two_key[:, :, :3] = _np.eye(3)
    two_key[1, 0, 3] = 0.4
    instances = [Instance(mesh_index=i) for i in range(len(meshes) - 1)]
    instances.append(Instance(mesh_index=len(meshes) - 1, transforms=two_key))
    scene = bs(meshes, instances=instances)
    assert scene.num_keys == 2

    cfg = RenderConfig(width=16, height=16, samples_per_launch=2,
                       max_depth=3, ray_block=256)
    cam = camera.params()
    f_ref, _ = render_frame(scene, cam, cfg, subframes=1)
    tracer = make_pallas_mt_tracer(scene, interpret=True)
    f_mt, _ = render_frame(scene, cam, cfg, subframes=1, tracer=tracer)
    np.testing.assert_allclose(np.asarray(f_mt.accum), np.asarray(f_ref.accum),
                               rtol=1e-4, atol=1e-4)


def test_tile_cull_with_morton_order():
    """Tile-AABB culling + Morton face order must not change results."""
    from rendertoy3c_tpu.accel.lbvh import morton_order_scene
    from rendertoy3c_tpu.scene.builtin import box_mesh
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh

    rng = np.random.default_rng(7)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all = [], []
    off = 0
    for gx in range(8):
        for gz in range(8):
            m = box_mesh([gx, 0, gz], [gx + 0.8, rng.uniform(0.3, 2.0),
                                       gz + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    scene = morton_order_scene(build_scene([big]))
    assert scene.geom.mat_id.shape[0] > 512  # multiple tri tiles

    n = 300
    o = jnp.asarray(rng.uniform([0, 3, 0], [8, 6, 8], (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    time = jnp.zeros((n,))

    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    soup = build_tri_soup(scene.geom)._replace(num_faces=scene.num_faces)
    got = trace_closest_mt(soup, o, d, 0.01, 1e16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    # no-cull soup agrees too
    got2 = trace_closest_mt(soup._replace(aabb=None), o, d, 0.01, 1e16,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got2.prim), np.asarray(ref.prim))
