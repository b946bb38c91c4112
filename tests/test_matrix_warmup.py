"""Matrix/quaternion/AABB math + parallel warmup tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from rendertoy3c_tpu.math.matrix import (
    Aabb,
    affine_3x4,
    parse_dimensions,
    quat_from_axis_angle,
    quat_mul,
    quat_rotate,
    quat_to_matrix,
    rotate,
    scale,
    transform_normal,
    transform_point,
    translate,
)
from rendertoy3c_tpu.utils.warmup import warmup_parallel


def test_transform_composition():
    m = translate([1, 2, 3]) @ rotate(math.pi / 2, [0, 0, 1]) @ scale(2.0)
    p = transform_point(m, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(p, [1.0, 4.0, 3.0], atol=1e-6)


def test_normal_transform_under_scale():
    m = scale([4.0, 1.0, 1.0])
    n = transform_normal(m, [[1.0, 1.0, 0.0]])
    # normals shear opposite to scale: x component shrinks
    assert abs(n[0, 0]) < abs(n[0, 1])
    np.testing.assert_allclose(np.linalg.norm(n[0]), 1.0, atol=1e-6)


def test_quaternion_rotation_matches_matrix():
    q = quat_from_axis_angle([0, 1, 0], math.pi / 2)
    v = quat_rotate(q, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-6)
    q2 = quat_mul(q, q)  # 180 degrees
    v2 = transform_point(quat_to_matrix(q2), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(v2, [-1.0, 0.0, 0.0], atol=1e-6)


def test_aabb_ops():
    box = Aabb().include([[0, 0, 0], [1, 2, 3]])
    assert box.valid()
    np.testing.assert_allclose(box.center(), [0.5, 1.0, 1.5])
    assert box.contains([0.5, 0.5, 0.5])
    assert not box.contains([2, 0, 0])
    assert box.area() == 2 * (1 * 2 + 2 * 3 + 1 * 3)
    moved = box.transform(translate([10, 0, 0]))
    assert moved.contains([10.5, 1.0, 1.5])
    assert not Aabb().valid()


def test_parse_dimensions():
    assert parse_dimensions("768x512") == (768, 512)


def test_affine_3x4():
    assert affine_3x4(translate([1, 2, 3])).shape == (3, 4)


def test_warmup_parallel_compiles():
    def f(x):
        return x * 2.0

    def g(x, y):
        return jnp.dot(x, y)

    x = jnp.ones((8,))
    a = jnp.ones((4, 4))
    execs = warmup_parallel([(f, (x,)), (g, (a, a))], max_workers=2)
    assert len(execs) == 2
    np.testing.assert_allclose(np.asarray(execs[0](x)), np.full(8, 2.0))
