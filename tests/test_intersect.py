"""Ray-triangle intersection + brute-force tracer vs a numpy oracle."""
import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.scene import Scene, build_scene, Mesh
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.trace import (
    ray_triangle, trace_closest_bruteforce, trace_any_bruteforce,
    make_bruteforce_tracer,
)
import oracle


def test_ray_triangle_basic():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v, hit = ray_triangle(o, d, v0, e1, e2, 0.0, 10.0)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.25, rtol=1e-6)


def test_ray_triangle_two_sided():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # hits the back face
    _, _, _, hit = ray_triangle(o, d, v0, e1, e2, 0.0, 10.0)
    assert bool(hit[0])


def test_ray_triangle_tmin_tmax():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, _, hit = ray_triangle(o, d, v0, e1, e2, 1.5, 10.0)
    assert not bool(hit[0])
    _, _, _, hit = ray_triangle(o, d, v0, e1, e2, 0.0, 0.5)
    assert not bool(hit[0])


def _random_scene(n_tris=100, seed=0):
    r = np.random.default_rng(seed)
    v0 = r.normal(size=(n_tris, 3)).astype(np.float32)
    v1 = v0 + r.normal(scale=0.7, size=(n_tris, 3)).astype(np.float32)
    v2 = v0 + r.normal(scale=0.7, size=(n_tris, 3)).astype(np.float32)
    verts = np.stack([v0, v1, v2], 1).reshape(-1, 3)
    idx = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return Mesh(vertices=verts[None], indices=idx)


def test_bruteforce_closest_matches_oracle():
    mesh = _random_scene(97)
    scene = build_scene([mesh])
    r = np.random.default_rng(1)
    n_rays = 256
    o = r.normal(scale=3.0, size=(n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = trace_closest_bruteforce(
        scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16,
        jnp.zeros(n_rays), num_keys=1, num_faces=scene.num_faces, chunk=64,
    )
    v0 = np.asarray(scene.geom.v0[0])[: scene.num_faces]
    e1 = np.asarray(scene.geom.e1[0])[: scene.num_faces]
    e2 = np.asarray(scene.geom.e2[0])[: scene.num_faces]
    n_mismatch = 0
    for i in range(n_rays):
        ref = oracle._intersect_all(o[i].astype(np.float64), d[i].astype(np.float64),
                                    v0, e1, e2, 0.0, 1e16)
        if ref is None:
            if int(hit.prim[i]) != -1:
                n_mismatch += 1
        else:
            prim, t, u, v = ref
            if int(hit.prim[i]) != prim or abs(float(hit.t[i]) - t) > 1e-3:
                n_mismatch += 1
    # float32 vs float64 may flip razor-edge hits on random sliver triangles
    assert n_mismatch <= 2, f"{n_mismatch} mismatches"


def test_bruteforce_any_matches_closest():
    mesh = _random_scene(50, seed=3)
    scene = build_scene([mesh])
    r = np.random.default_rng(4)
    n_rays = 128
    o = r.normal(scale=3.0, size=(n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = trace_closest_bruteforce(
        scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16,
        jnp.zeros(n_rays), num_keys=1, num_faces=scene.num_faces,
    )
    occ = trace_any_bruteforce(
        scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16,
        jnp.zeros(n_rays), num_keys=1, num_faces=scene.num_faces,
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit.mask))


def test_motion_lerp():
    # One triangle sliding +2x from key 0 to key 1; a fixed ray hits it only
    # at the time where the triangle is under the ray.
    v_k0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    v_k1 = v_k0 + np.array([2.0, 0, 0], np.float32)
    mesh = Mesh(vertices=np.stack([v_k0, v_k1]), indices=[[0, 1, 2]])
    scene = build_scene([mesh])
    assert scene.num_keys == 2
    o = jnp.asarray([[2.25, 0.25, 1.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    times = jnp.asarray([0.0, 0.5, 1.0])
    hit = trace_closest_bruteforce(
        scene.geom, o, d, 0.0, 10.0, times,
        num_keys=2, num_faces=scene.num_faces,
    )
    # at t=0 tri spans x in [0,1]: miss; t=0.5 spans [1,2]: miss (x=2.25);
    # at t=1 spans [2,3]: hit at u=0.25
    assert int(hit.prim[0]) == -1
    assert int(hit.prim[1]) == -1
    assert int(hit.prim[2]) == 0
    np.testing.assert_allclose(float(hit.u[2]), 0.25, atol=1e-6)


def test_motion_lerp_midpoint():
    v_k0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    v_k1 = v_k0 + np.array([1.0, 0, 0], np.float32)
    mesh = Mesh(vertices=np.stack([v_k0, v_k1]), indices=[[0, 1, 2]])
    scene = build_scene([mesh])
    o = jnp.asarray([[0.75, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = trace_closest_bruteforce(
        scene.geom, o, d, 0.0, 10.0, jnp.asarray([0.5]),
        num_keys=2, num_faces=scene.num_faces,
    )
    # at t=0.5 v0 = (0.5,0,0): hit point local u = 0.25
    assert int(hit.prim[0]) == 0
    np.testing.assert_allclose(float(hit.u[0]), 0.25, atol=1e-5)


def test_cornell_primary_rays_hit():
    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    closest, _ = make_bruteforce_tracer(scene)
    p = cam.params()
    # center ray must hit the back wall at z=-1
    o = p.eye[None, :]
    import jax

    d = (p.w / jnp.linalg.norm(p.w))[None, :]
    hit = closest(o, d, 0.01, 1e16, jnp.zeros(1))
    assert bool(hit.mask[0])
    z_hit = float(o[0, 2] + hit.t[0] * d[0, 2])
    # hits the tall block front face (z in [-0.55, 0]) or the back wall (z=-1)
    assert -1.0 - 1e-4 <= z_hit <= 0.01
