"""Scheduled block-walk tracer (pallas_walk) vs the jnp brute-force oracle.

Runs in Pallas interpret mode on CPU; the identical kernels compile for TPU
(bench.py exercises them there)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.accel.lbvh import split_order_scene
from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.intersect import (
    trace_any_bruteforce,
    trace_closest_bruteforce,
)
from rendertoy3c_tpu.trace.pallas_walk import (
    build_walk_table,
    make_walk_tracer,
    trace_any_walk,
    trace_closest_walk,
)


@pytest.fixture(scope="module")
def cornell():
    meshes, camera = cornell_box()
    return build_scene(meshes)


@pytest.fixture(scope="module")
def box_field():
    """8x8 box grid: small leaves force multi-leaf walks + residual passes."""
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
    return split_order_scene(build_scene([mesh]))


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


def _ref_closest(scene, o, d, tmin=0.01, tmax=1e16):
    time = jnp.zeros((o.shape[0],))
    return trace_closest_bruteforce(
        scene.geom, o, d, tmin, tmax, time,
        num_keys=1, num_faces=scene.num_faces, chunk=512,
    )


def test_closest_cornell(cornell):
    o, d = _random_rays(256, [-0.9, 0.05, -0.9], [0.9, 1.9, 0.9])
    ref = _ref_closest(cornell, o, d)
    tab = build_walk_table(cornell.geom, cornell.num_faces)
    got = trace_closest_walk(tab, o, d, 0.01, 1e16, interpret=True)
    _assert_hits_match(got, ref)


def test_closest_box_field_small_leaf(box_field):
    """LEAF=32/k=2: a 24-leaf scene forces many residual passes."""
    o, d = _random_rays(192, [-1, 0.1, -1], [9, 2.5, 9], seed=5)
    ref = _ref_closest(box_field, o, d)
    tab = build_walk_table(box_field.geom, box_field.num_faces, leaf=32)
    got = trace_closest_walk(tab, o, d, 0.01, 1e16, rt=16,
                             interpret=True)
    _assert_hits_match(got, ref)


def test_closest_grazing_rays(box_field):
    """Grazing rays overlap many leaves: residual-pass exactness."""
    rng = np.random.default_rng(11)
    o = rng.uniform([-2, 0.05, 0], [-1, 0.4, 8], (128, 3))
    d = rng.normal([1.0, 0.0, 0.0], [0.05, 0.02, 0.3], (128, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    ref = _ref_closest(box_field, o, d)
    tab = build_walk_table(box_field.geom, box_field.num_faces, leaf=64)
    got = trace_closest_walk(tab, o, d, 0.01, 1e16, rt=8,
                             interpret=True)
    _assert_hits_match(got, ref)


def test_any_box_field(box_field):
    o, d = _random_rays(256, [-1, 0.1, -1], [9, 2.5, 9], seed=7)
    tab = build_walk_table(box_field.geom, box_field.num_faces, leaf=64)
    for tmax in (0.5, 3.0, 1e16):
        time = jnp.zeros((o.shape[0],))
        ref = trace_any_bruteforce(
            box_field.geom, o, d, 0.001, tmax, time,
            num_keys=1, num_faces=box_field.num_faces, chunk=512,
        )
        got = trace_any_walk(tab, o, d, 0.001, tmax, rt=16,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_count_gates_live_rays(cornell):
    o, d = _random_rays(64, [-0.9, 0.05, -0.9], [0.9, 1.9, 0.9], seed=9)
    tab = build_walk_table(cornell.geom, cornell.num_faces)
    got = trace_closest_walk(tab, o, d, 0.01, 1e16, count=10, rt=8,
                             interpret=True)
    prim = np.asarray(got.prim)
    assert (prim[10:] == -1).all()
    full = trace_closest_walk(tab, o, d, 0.01, 1e16, rt=8, interpret=True)
    np.testing.assert_array_equal(prim[:10], np.asarray(full.prim)[:10])
    occ = trace_any_walk(tab, o, d, 0.001, 1e16, count=10, rt=8,
                         interpret=True)
    occ = np.asarray(occ)
    assert not occ[10:].any()
    occ_full = np.asarray(
        trace_any_walk(tab, o, d, 0.001, 1e16, rt=8, interpret=True))
    np.testing.assert_array_equal(occ[:10], occ_full[:10])


def test_make_walk_tracer_contract(box_field):
    closest, any_hit = make_walk_tracer(box_field, interpret=True)
    o, d = _random_rays(96, [-1, 0.1, -1], [9, 2.5, 9], seed=13)
    ref = _ref_closest(box_field, o, d)
    got = closest(o, d, 0.01, 1e16, 0.0)
    _assert_hits_match(got, ref)
    time = jnp.zeros((96,))
    ref_a = trace_any_bruteforce(
        box_field.geom, o, d, 0.001, 2.0, time,
        num_keys=1, num_faces=box_field.num_faces, chunk=512,
    )
    np.testing.assert_array_equal(
        np.asarray(any_hit(o, d, 0.001, 2.0, 0.0)), np.asarray(ref_a))
