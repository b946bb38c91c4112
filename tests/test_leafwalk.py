"""Per-ray leaf-walk tracer vs the jnp brute-force oracle (pure jnp: runs
natively on CPU; identical code compiles for TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.accel.lbvh import morton_order_scene
from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box, quad
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.intersect import (
    trace_any_bruteforce,
    trace_closest_bruteforce,
)
from rendertoy3c_tpu.trace.leafwalk import (
    build_leaf_table,
    make_leafwalk_tracer,
    trace_any_leafwalk,
    trace_closest_leafwalk,
)


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes), camera


@pytest.fixture(scope="module")
def box_field():
    """8x8 box grid (768 faces -> 12 leaves): exercises multi-leaf walks."""
    rng = np.random.default_rng(3)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(8):
        for gz in range(8):
            m = box_mesh([gx, 0, gz], [gx + 0.8, rng.uniform(0.3, 2.0),
                                       gz + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    mesh = Mesh(vertices=np.concatenate(v_all)[None],
                indices=np.concatenate(f_all), material=white)
    return morton_order_scene(build_scene([mesh]))


def _random_rays(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(lo, hi, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _assert_hits_match(got, ref):
    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(ref.prim))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(ref.v),
                               rtol=1e-4, atol=1e-5)


def test_closest_matches_bruteforce_cornell(cornell):
    scene, _ = cornell
    o, d = _random_rays(300, [-0.9, 0.05, -0.9], [0.9, 1.9, 0.9])
    time = jnp.zeros((300,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    tab = build_leaf_table(scene.geom)
    tab = tab._replace(num_faces=scene.num_faces)
    got = trace_closest_leafwalk(tab, o, d, 0.01, 1e16)
    _assert_hits_match(got, ref)


def test_closest_matches_bruteforce_box_field(box_field):
    scene = box_field
    o, d = _random_rays(500, [-1, 0.1, -1], [9, 2.5, 9], seed=5)
    time = jnp.zeros((500,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    tab = build_leaf_table(scene.geom)
    tab = tab._replace(num_faces=scene.num_faces)
    got = trace_closest_leafwalk(tab, o, d, 0.01, 1e16)
    _assert_hits_match(got, ref)


def test_small_k_wave_forces_multiple_waves(box_field):
    """k_wave=2 on a 12-leaf scene: correctness must survive re-top_k."""
    scene = box_field
    # grazing rays along the grid plane overlap many leaf boxes
    rng = np.random.default_rng(11)
    o = rng.uniform([-2, 0.05, 0], [-1, 0.4, 8], (200, 3))
    d = rng.normal([1.0, 0.0, 0.0], [0.05, 0.02, 0.3], (200, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    time = jnp.zeros((200,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    tab = build_leaf_table(scene.geom)
    tab = tab._replace(num_faces=scene.num_faces)
    got = trace_closest_leafwalk(tab, o, d, 0.01, 1e16, k_wave=2)
    _assert_hits_match(got, ref)


def test_any_matches_bruteforce(box_field):
    scene = box_field
    o, d = _random_rays(400, [-1, 0.1, -1], [9, 2.5, 9], seed=7)
    time = jnp.zeros((400,))
    for tmax in (0.5, 3.0, 1e16):
        ref = trace_any_bruteforce(
            scene.geom, o, d, 0.001, tmax, time,
            num_keys=1, num_faces=scene.num_faces, chunk=512,
        )
        tab = build_leaf_table(scene.geom)
        tab = tab._replace(num_faces=scene.num_faces)
        got = trace_any_leafwalk(tab, o, d, 0.001, tmax)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_count_gates_live_rays(cornell):
    scene, _ = cornell
    o, d = _random_rays(64, [-0.9, 0.05, -0.9], [0.9, 1.9, 0.9], seed=9)
    tab = build_leaf_table(scene.geom)
    tab = tab._replace(num_faces=scene.num_faces)
    got = trace_closest_leafwalk(tab, o, d, 0.01, 1e16, count=10)
    prim = np.asarray(got.prim)
    assert (prim[10:] == -1).all()
    full = trace_closest_leafwalk(tab, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim[:10], np.asarray(full.prim)[:10])
    occ = trace_any_leafwalk(tab, o, d, 0.001, 1e16, count=10)
    assert not np.asarray(occ)[10:].any()


def test_tmin_tmax_respected(box_field):
    scene = box_field
    tab = build_leaf_table(scene.geom)
    tab = tab._replace(num_faces=scene.num_faces)
    o = jnp.asarray([[-1.0, 0.2, 0.4]] * 2, jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 2, jnp.float32)
    far = trace_closest_leafwalk(tab, o, d, 0.01, 0.5)
    assert (np.asarray(far.prim) == -1).all()  # first box is >= 1.0 away
    hit = trace_closest_leafwalk(tab, o, d, 0.01, 1e16)
    assert (np.asarray(hit.prim) >= 0).all()


def test_render_with_leafwalk_tracer_matches_bruteforce(cornell):
    scene, camera = cornell
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame

    cfg = RenderConfig(width=16, height=16, samples_per_launch=1,
                       max_depth=3, ray_block=256)
    cam = camera.params()
    ref_film, _ = render_frame(scene, cam, cfg, subframes=1)
    tracer = make_leafwalk_tracer(scene)
    got_film, _ = render_frame(scene, cam, cfg, subframes=1, tracer=tracer)
    np.testing.assert_allclose(np.asarray(got_film.accum),
                               np.asarray(ref_film.accum),
                               rtol=1e-4, atol=1e-4)


def test_pool_render_with_leafwalk(box_field):
    """Pool integrator + leafwalk on a multi-leaf scene renders sanely."""
    import dataclasses

    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.camera import Camera

    scene = box_field
    # add a lamp so the pool's NEE has a target
    lv, lf = quad([0, 6, 0], [0, 6, 8], [8, 6, 8], [8, 6, 0])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(20.0, 20.0, 20.0)))
    rng = np.random.default_rng(3)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(8):
        for gz in range(8):
            m = box_mesh([gx, 0, gz], [gx + 0.8, rng.uniform(0.3, 2.0),
                                       gz + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    mesh = Mesh(vertices=np.concatenate(v_all)[None],
                indices=np.concatenate(f_all), material=white)
    scene = morton_order_scene(build_scene([mesh, lamp]))

    cam = Camera(eye=(4, 5, 14), lookat=(4, 0.5, 4), fov_y=45.0,
                 aspect_ratio=1.0).params()
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=1152, integrator="pool",
                       pool_pixel_major=True, flush_every=4)
    tracer = make_leafwalk_tracer(scene)
    film, _ = render_frame(scene, cam, cfg, subframes=1, tracer=tracer)
    img = np.asarray(film.accum)
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # lamp + lit boxes

    cfg_wave = dataclasses.replace(cfg, integrator="wave")
    film_w, _ = render_frame(scene, cam, cfg_wave, subframes=1,
                             tracer=tracer)
    # pool and wave share per-path arithmetic; means agree statistically
    assert abs(np.asarray(film_w.accum).mean() - img.mean()) < 0.05


def test_split_order_scene_matches_bruteforce(box_field):
    """Median-split face order is a permutation: leafwalk hits map back to
    the same geometry as brute force on the reordered scene."""
    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.scene.builtin import box_mesh as _bm

    scene = split_order_scene(box_field, leaf=64)
    assert scene.num_faces == box_field.num_faces
    o, d = _random_rays(400, [-1, 0.1, -1], [9, 2.5, 9], seed=13)
    time = jnp.zeros((400,))
    ref = trace_closest_bruteforce(
        scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )
    tab = build_leaf_table(scene.geom, leaf=64)
    tab = tab._replace(num_faces=scene.num_faces)
    got = trace_closest_leafwalk(tab, o, d, 0.01, 1e16)
    _assert_hits_match(got, ref)
    # and the hit DISTANCES equal the original-order scene's (geometry is
    # the same set of triangles)
    ref0 = trace_closest_bruteforce(
        box_field.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=box_field.num_faces, chunk=512,
    )
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref0.t),
                               rtol=1e-5, atol=1e-5)
