"""Analytic primitives + curve evaluators + image readers."""
import numpy as np
import jax.numpy as jnp
import pytest

from rendertoy3c_tpu.math.curves import curve_eval, curve_surface_normal
from rendertoy3c_tpu.trace.primitives import (
    SHELL_INSIDE_FROM_INSIDE,
    SHELL_OUTSIDE_FROM_OUTSIDE,
    intersect_parallelogram,
    intersect_sphere,
    intersect_sphere_shell,
)


def test_sphere_basic():
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    c = jnp.asarray([0.0, 0.0, 0.0])
    t, n, hit = intersect_sphere(o, d, c, 1.0, 0.0, 100.0)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)


def test_sphere_from_inside():
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t, n, hit = intersect_sphere(o, d, jnp.zeros(3), 2.0, 0.0, 100.0)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_sphere_miss():
    o = jnp.asarray([[0.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, hit = intersect_sphere(o, d, jnp.zeros(3), 1.0, 0.0, 100.0)
    assert not bool(hit[0])


def test_sphere_shell_classification():
    c = jnp.zeros(3)
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, n, hit, kind = intersect_sphere_shell(o, d, c, 1.0, 2.0, 0.0, 100.0)
    assert bool(hit[0]) and bool(hit[1])
    # from outside: first crossing is the outer surface at t=3
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)
    assert int(kind[0]) == SHELL_OUTSIDE_FROM_OUTSIDE
    # from the hollow core: first crossing is the inner surface at t=1,
    # approached from its inside
    np.testing.assert_allclose(float(t[1]), 1.0, rtol=1e-6)
    assert int(kind[1]) == SHELL_INSIDE_FROM_INSIDE
    # inner-surface normal points toward the center
    np.testing.assert_allclose(np.asarray(n[1]), [0, 0, -1], atol=1e-6)


def test_parallelogram():
    o = jnp.asarray([[0.25, 1.0, 0.25], [2.0, 1.0, 2.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    anchor = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 0.0, 1.0])
    t, n, hit, (a, b) = intersect_parallelogram(o, d, anchor, v1, v2, 0.0, 100.0)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose([float(a[0]), float(b[0])], [0.25, 0.25],
                               rtol=1e-5)


@pytest.mark.parametrize("kind,n", [
    ("linear", 2), ("quadratic_bspline", 3),
    ("cubic_bspline", 4), ("catmull_rom", 4),
])
def test_curve_partition_of_unity(kind, n):
    """Basis weights sum to 1 (position interpolates translations)."""
    rng = np.random.default_rng(0)
    ctrl = jnp.asarray(rng.normal(size=(16, n, 3)), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.1, 0.5, (16, n)), jnp.float32)
    u = jnp.asarray(rng.uniform(0, 1, 16), jnp.float32)
    pos, vel, rad, _ = curve_eval(kind, ctrl, radii, u)
    shift = jnp.asarray([1.0, 2.0, 3.0])
    pos2, vel2, _, _ = curve_eval(kind, ctrl + shift, radii, u)
    np.testing.assert_allclose(np.asarray(pos2 - pos),
                               np.tile(shift, (16, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vel2), np.asarray(vel), atol=1e-5)


def test_curve_velocity_is_derivative():
    rng = np.random.default_rng(1)
    ctrl = jnp.asarray(rng.normal(size=(1, 4, 3)), jnp.float32)
    radii = jnp.ones((1, 4), jnp.float32)
    u = jnp.asarray([0.4], jnp.float32)
    eps = 1e-3
    p0, vel, _, _ = curve_eval("cubic_bspline", ctrl, radii, u - eps)
    p1, _, _, _ = curve_eval("cubic_bspline", ctrl, radii, u + eps)
    fd = np.asarray(p1 - p0) / (2 * eps)
    np.testing.assert_allclose(fd, np.asarray(vel), rtol=1e-2, atol=1e-3)


def test_curve_normal_unit():
    ctrl = jnp.asarray([[[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]],
                       jnp.float32)
    radii = jnp.asarray([[0.2, 0.2, 0.2, 0.2]], jnp.float32)
    u = jnp.asarray([0.5], jnp.float32)
    pos, _, rad, _ = curve_eval("cubic_bspline", ctrl, radii, u)
    hit_p = pos + jnp.asarray([[0.0, float(rad[0]), 0.0]])
    n = curve_surface_normal("cubic_bspline", ctrl, radii, u, hit_p)
    np.testing.assert_allclose(np.asarray(n[0]), [0, 1, 0], atol=1e-5)


def test_image_readers_roundtrip(tmp_path):
    from rendertoy3c_tpu.film.image import (
        load_image, read_exr, read_png, write_exr, write_png, write_ppm,
        read_ppm,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (9, 7, 3), dtype=np.uint8)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p)[..., :3], img)

    f = rng.uniform(0, 5, (5, 6, 3)).astype(np.float32)
    e = str(tmp_path / "t.exr")
    write_exr(e, f)
    np.testing.assert_allclose(read_exr(e), f)

    pp = str(tmp_path / "t.ppm")
    write_ppm(pp, img)
    np.testing.assert_array_equal(read_ppm(pp), img)
    assert load_image(e).shape == (5, 6, 3)
    assert load_image(p).shape == (9, 7, 4)


def test_capsule_intersection():
    from rendertoy3c_tpu.trace.primitives import intersect_capsule

    o = jnp.asarray([[0.0, 0.0, 5.0], [3.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    p0 = jnp.asarray([-1.0, 0.0, 0.0])
    p1 = jnp.asarray([1.0, 0.0, 0.0])
    t, n, hit, s = intersect_capsule(o, d, p0, p1, 0.5, 0.5, 0.0, 100.0)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(float(t[0]), 4.5, rtol=1e-4)
    np.testing.assert_allclose(float(s[0]), 0.5, atol=1e-3)


def test_curve_intersection():
    from rendertoy3c_tpu.trace.primitives import intersect_curve

    # straight cubic-bspline "hair" along x at y=0,z=0, radius 0.3
    ctrl = jnp.asarray(
        [[[-3, 0, 0], [-1, 0, 0], [1, 0, 0], [3, 0, 0]]], jnp.float32
    )
    radii = jnp.asarray([[0.3, 0.3, 0.3, 0.3]], jnp.float32)
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, n, hit, u = intersect_curve("cubic_bspline", ctrl, radii, o, d,
                                   0.0, 100.0)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.7, rtol=2e-2)
    # normal points back toward the ray
    assert float(n[0, 2]) > 0.9


def test_curve_intersection_miss():
    from rendertoy3c_tpu.trace.primitives import intersect_curve

    ctrl = jnp.asarray(
        [[[-3, 0, 0], [-1, 0, 0], [1, 0, 0], [3, 0, 0]]], jnp.float32
    )
    radii = jnp.asarray([[0.1, 0.1, 0.1, 0.1]], jnp.float32)
    o = jnp.asarray([[0.0, 2.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, hit, _ = intersect_curve("cubic_bspline", ctrl, radii, o, d,
                                   0.0, 100.0)
    assert not bool(hit[0])
