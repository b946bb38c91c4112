"""Native (C++) runtime components vs their Python oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from rendertoy3c_tpu.native import get_lib, native_build_bvh8, native_parse_obj

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no C++ toolchain)"
)


@needs_native
def test_native_bvh_traversal_matches_bruteforce():
    """A native-built BVH must produce identical hits to brute force."""
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.bvh_traverse import build_scene_bvh, trace_bvh
    from rendertoy3c_tpu.trace.intersect import trace_closest_bruteforce

    meshes, _ = cornell_box()
    scene = build_scene(meshes)
    bvh_scene, bvh, perm = build_scene_bvh(scene)

    rng = np.random.default_rng(0)
    n = 256
    o = jnp.asarray(rng.uniform([-0.9, 0.05, -0.9], [0.9, 1.9, 0.9], (n, 3)),
                    jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    time = jnp.zeros((n,))

    hit_bvh = trace_bvh(bvh, bvh_scene.geom, o, d, 0.01, 1e16, time,
                        num_keys=1)
    hit_ref = trace_closest_bruteforce(
        bvh_scene.geom, o, d, 0.01, 1e16, time,
        num_keys=1, num_faces=bvh_scene.num_faces, chunk=512,
    )
    np.testing.assert_array_equal(np.asarray(hit_bvh.prim),
                                  np.asarray(hit_ref.prim))
    np.testing.assert_allclose(np.asarray(hit_bvh.t), np.asarray(hit_ref.t),
                               rtol=1e-5, atol=1e-5)


@needs_native
def test_native_bvh_invariants_random():
    rng = np.random.default_rng(1)
    n = 20_000
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    ext = rng.uniform(0.01, 0.3, (n, 3)).astype(np.float32)
    lo, hi = c - ext, c + ext
    perm, child_lo, child_hi, child = native_build_bvh8(lo, hi, 8)

    assert sorted(perm.tolist()) == list(range(n))
    lo_s, hi_s = lo[perm], hi[perm]

    # every face appears in exactly one leaf; leaf AABBs contain their faces
    covered = np.zeros(n, bool)
    for w in range(child.shape[0]):
        for j in range(8):
            cc = child[w, j]
            if cc <= -2:
                raw = -cc - 2
                start, count = raw >> 5, raw & 31
                assert 0 < count <= 8
                assert not covered[start:start + count].any()
                covered[start:start + count] = True
                np.testing.assert_array_less(
                    child_lo[w, j] - 1e-4, lo_s[start:start + count].min(0)
                )
                np.testing.assert_array_less(
                    hi_s[start:start + count].max(0), child_hi[w, j] + 1e-4
                )
            elif cc >= 0:
                assert cc < child.shape[0]
    assert covered.all()


@needs_native
def test_native_obj_matches_python(tmp_path):
    obj = """
o thing
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
usemtl a
f 1/1/1 2/2/1 3/3/1 4/1/1
f -4 -3 -2
"""
    p = tmp_path / "x.obj"
    p.write_text(obj)
    nd = native_parse_obj(str(p))
    assert nd is not None
    assert nd["v"].shape == (4, 3)
    assert nd["vn"].shape == (1, 3)
    assert nd["vt"].shape == (3, 2)
    # quad fan -> 2 tris, plus 1 tri
    assert nd["face_idx"].shape == (3, 3, 3)
    assert nd["mat_names"] == ["a"]
    # negative indices resolve
    np.testing.assert_array_equal(nd["face_idx"][2, :, 0], [0, 1, 2])
    # corner with explicit v/t/n
    np.testing.assert_array_equal(nd["face_idx"][0, 0], [0, 0, 0])


@needs_native
def test_native_bvh_speed_smoke():
    """Native build of 200k boxes should complete quickly (no Python loops)."""
    import time as _time

    rng = np.random.default_rng(2)
    n = 200_000
    c = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    lo, hi = c - 0.1, c + 0.1
    t0 = _time.perf_counter()
    out = native_build_bvh8(lo, hi, 8)
    dt = _time.perf_counter() - t0
    assert out is not None
    assert dt < 5.0, f"native build too slow: {dt:.2f}s"


@needs_native
def test_native_sah_split_perm_bit_exact():
    """native/sah.cc must reproduce the pure-numpy sah_split_perm
    EXACTLY (same stable sorts, first-min ties, banker's-rounding snap,
    f32 binning arithmetic) on random, clustered, and degenerate
    inputs, snapped and variable."""
    from rendertoy3c_tpu.accel.lbvh import _sah_split_perm_py
    from rendertoy3c_tpu.native import native_sah_split_perm

    rng = np.random.default_rng(7)
    cases = []
    c = rng.uniform(-10, 10, (20_000, 3)).astype(np.float32)
    e = rng.uniform(0.01, 0.5, (20_000, 3)).astype(np.float32)
    cases.append((c - e, c + e))
    cc = rng.uniform(-20, 20, (1024, 1, 3)).astype(np.float32)
    off = rng.uniform(-0.4, 0.4, (1024, 12, 3)).astype(np.float32)
    c2 = (cc + off).reshape(-1, 3)
    cases.append((c2 - 0.05, c2 + 0.05))
    z = np.zeros((100, 3), np.float32)
    cases.append((z, z))  # identical centroids -> median fallback
    cases.append((c[:5] - e[:5], c[:5] + e[:5]))  # below-leaf tiny input
    for lo, hi in cases:
        for leaf in (14, 7):
            for variable in (False, True):
                py = _sah_split_perm_py(lo, hi, leaf, variable)
                nat = native_sah_split_perm(lo, hi, leaf, variable)
                assert nat is not None
                np.testing.assert_array_equal(py, nat)
