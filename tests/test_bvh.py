"""LBVH build invariants + traversal parity vs brute force (SURVEY.md S4
item 2)."""
import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.accel import build_bvh8, ENC_EMPTY
from rendertoy3c_tpu.accel.lbvh import decode_leaf, MAX_LEAF
from rendertoy3c_tpu.scene import build_scene, Mesh
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.trace import trace_closest_bruteforce, trace_any_bruteforce
from rendertoy3c_tpu.trace.bvh_traverse import build_scene_bvh, trace_bvh


def _random_mesh(n_tris, seed=0, scale=0.4):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    v1 = v0 + r.normal(scale=scale, size=(n_tris, 3)).astype(np.float32)
    v2 = v0 + r.normal(scale=scale, size=(n_tris, 3)).astype(np.float32)
    verts = np.stack([v0, v1, v2], 1).reshape(-1, 3)
    idx = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return Mesh(vertices=verts[None], indices=idx)


def test_build_invariants():
    scene = build_scene([_random_mesh(333)])
    perm, bvh = build_bvh8(
        np.asarray(scene.geom.v0), np.asarray(scene.geom.e1),
        np.asarray(scene.geom.e2), scene.num_faces, max_leaf=8,
    )
    assert sorted(perm.tolist()) == list(range(333))
    child = np.asarray(bvh.child)
    lo = np.asarray(bvh.child_lo)
    hi = np.asarray(bvh.child_hi)
    n = child.shape[0]

    # every leaf range is within bounds, non-overlapping, covering all faces
    leaves = child[child <= -2]
    raw = -leaves - 2
    starts = raw >> 5
    counts = raw & MAX_LEAF
    covered = np.zeros(333, np.int32)
    for s, c in zip(starts, counts):
        assert c >= 1 and c <= 8
        covered[s : s + c] += 1
    np.testing.assert_array_equal(covered, 1)

    # child AABBs contain their triangles (leaf children)
    v0s = np.asarray(scene.geom.v0[0])[perm]
    e1s = np.asarray(scene.geom.e1[0])[perm]
    e2s = np.asarray(scene.geom.e2[0])[perm]
    for w in range(n):
        for j in range(8):
            c = child[w, j]
            if c <= -2:
                r = -c - 2
                s, cnt = r >> 5, r & MAX_LEAF
                pts = np.concatenate(
                    [v0s[s:s+cnt], v0s[s:s+cnt] + e1s[s:s+cnt],
                     v0s[s:s+cnt] + e2s[s:s+cnt]]
                )
                assert (pts >= lo[w, j] - 1e-4).all()
                assert (pts <= hi[w, j] + 1e-4).all()

    # internal child references are valid node ids, acyclic (forward check
    # via reachability from root)
    internal = child[(child >= 0)]
    assert (internal < n).all()


def _compare_tracers(scene, bvh_scene, bvh, n_rays=512, seed=5, max_leaf=8):
    r = np.random.default_rng(seed)
    o = r.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    time = jnp.zeros(n_rays)

    brute = trace_closest_bruteforce(
        scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16, time,
        num_keys=scene.num_keys, num_faces=scene.num_faces,
    )
    bv = trace_bvh(
        bvh, bvh_scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16, time,
        num_keys=bvh_scene.num_keys, max_leaf=max_leaf,
    )
    np.testing.assert_array_equal(np.asarray(bv.mask), np.asarray(brute.mask))
    m = np.asarray(brute.mask)
    np.testing.assert_allclose(
        np.asarray(bv.t)[m], np.asarray(brute.t)[m], rtol=1e-5, atol=1e-5
    )

    occ_b = trace_any_bruteforce(
        scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16, time,
        num_keys=scene.num_keys, num_faces=scene.num_faces,
    )
    occ_v = trace_bvh(
        bvh, bvh_scene.geom, jnp.asarray(o), jnp.asarray(d), 0.0, 1e16, time,
        num_keys=bvh_scene.num_keys, max_leaf=max_leaf, any_hit=True,
    )
    np.testing.assert_array_equal(np.asarray(occ_v), np.asarray(occ_b))


def test_traversal_matches_bruteforce_random():
    scene = build_scene([_random_mesh(777, seed=1)])
    bvh_scene, bvh, _ = build_scene_bvh(scene)
    _compare_tracers(scene, bvh_scene, bvh)


def test_traversal_matches_bruteforce_cornell():
    meshes, _ = cornell_box()
    scene = build_scene(meshes)
    bvh_scene, bvh, _ = build_scene_bvh(scene)
    _compare_tracers(scene, bvh_scene, bvh, seed=9)


def test_traversal_tiny_scene():
    scene = build_scene([_random_mesh(3, seed=2)])
    bvh_scene, bvh, _ = build_scene_bvh(scene)
    _compare_tracers(scene, bvh_scene, bvh, n_rays=64)


def test_traversal_motion():
    v_k0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    v_k1 = v_k0 + np.array([2.0, 0, 0], np.float32)
    mesh = Mesh(vertices=np.stack([v_k0, v_k1]), indices=[[0, 1, 2]])
    scene = build_scene([mesh])
    bvh_scene, bvh, _ = build_scene_bvh(scene)
    o = jnp.asarray([[2.25, 0.25, 1.0]] * 3)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    times = jnp.asarray([0.0, 0.5, 1.0])
    hit = trace_bvh(bvh, bvh_scene.geom, o, d, 0.0, 10.0, times,
                    num_keys=2)
    assert int(hit.prim[0]) == -1
    assert int(hit.prim[1]) == -1
    assert int(hit.prim[2]) == 0


def test_render_with_bvh_matches_bruteforce():
    from rendertoy3c_tpu.integrate import RenderConfig, render_frame
    from rendertoy3c_tpu.trace.bvh_traverse import make_bvh_tracer

    meshes, cam = cornell_box()
    scene = build_scene(meshes)
    cfg = RenderConfig(width=16, height=16, samples_per_launch=2, max_depth=8)
    film_b, _ = render_frame(scene, cam.params(), cfg, subframes=1)

    bvh_scene, bvh, _ = build_scene_bvh(scene)
    tracer = make_bvh_tracer(bvh_scene, bvh)
    film_v, _ = render_frame(bvh_scene, cam.params(), cfg, subframes=1,
                             tracer=tracer)
    a = np.asarray(film_b.accum)
    b = np.asarray(film_v.accum)
    # identical hits -> identical RNG paths -> identical images, except
    # rays that strike a shared quad diagonal exactly, where the two
    # tracers may tie-break to different (equivalent) triangles
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4)
    assert close.mean() > 0.99, f"{(~close).sum()} mismatched components"
