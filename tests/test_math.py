"""Sampling / ONB / vec math parity with the closed-form reference code."""
import math

import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.math import (
    onb_from_normal, onb_local_to_world, sample_cosine_hemisphere,
    sample_uniform_disk_concentric, sample_uniform_triangle, power_heuristic,
    faceforward, luminance, normalize, cross, dot,
)
from rendertoy3c_tpu.math.sampling import cosine_hemisphere_pdf


def test_onb_orthonormal():
    rngs = np.random.default_rng(0)
    n = rngs.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b, nn = onb_from_normal(jnp.asarray(n))
    t, b, nn = np.asarray(t), np.asarray(b), np.asarray(nn)
    assert np.abs(np.sum(t * b, -1)).max() < 1e-5
    assert np.abs(np.sum(t * nn, -1)).max() < 1e-5
    assert np.abs(np.sum(b * nn, -1)).max() < 1e-5
    assert np.abs(np.linalg.norm(t, axis=-1) - 1).max() < 1e-5


def test_onb_matches_reference_branches():
    # |n.x| > |n.z| branch: binormal = normalize(-n.y, n.x, 0)
    n = np.array([[0.8, 0.6, 0.0]], np.float32)
    _, b, _ = onb_from_normal(jnp.asarray(n))
    expected = np.array([-0.6, 0.8, 0.0])
    np.testing.assert_allclose(np.asarray(b)[0], expected, atol=1e-6)
    # else branch: binormal = normalize(0, -n.z, n.y)
    n = np.array([[0.0, 0.6, 0.8]], np.float32)
    _, b, _ = onb_from_normal(jnp.asarray(n))
    expected = np.array([0.0, -0.8, 0.6])
    np.testing.assert_allclose(np.asarray(b)[0], expected, atol=1e-6)


def test_onb_local_to_world_z_is_normal():
    n = np.array([[0.0, 1.0, 0.0], [1 / np.sqrt(2), 0, 1 / np.sqrt(2)]], np.float32)
    p = jnp.asarray(np.array([[0.0, 0.0, 1.0]] * 2, np.float32))
    out = np.asarray(onb_local_to_world(p, jnp.asarray(n)))
    np.testing.assert_allclose(out, n, atol=1e-6)


def test_cosine_hemisphere_statistics():
    rngs = np.random.default_rng(1)
    u1 = jnp.asarray(rngs.random(200_000, dtype=np.float32))
    u2 = jnp.asarray(rngs.random(200_000, dtype=np.float32))
    d = np.asarray(sample_cosine_hemisphere(u1, u2))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)
    # E[cos theta] = 2/3 under cosine-weighted sampling
    assert abs(d[:, 2].mean() - 2 / 3) < 0.01


def test_cosine_hemisphere_formula_exact():
    # r = sqrt(u1), phi = 2 pi u2 (src/util/sampling.h:28-37)
    u1, u2 = 0.25, 0.125
    d = np.asarray(sample_cosine_hemisphere(jnp.float32(u1), jnp.float32(u2)))
    r = math.sqrt(u1)
    phi = 2 * math.pi * u2
    np.testing.assert_allclose(
        d, [r * math.cos(phi), r * math.sin(phi),
            math.sqrt(1 - u1)], rtol=1e-6)


def test_concentric_disk():
    rngs = np.random.default_rng(2)
    u1 = jnp.asarray(rngs.random(10_000, dtype=np.float32))
    u2 = jnp.asarray(rngs.random(10_000, dtype=np.float32))
    p = np.asarray(sample_uniform_disk_concentric(u1, u2))
    assert (np.linalg.norm(p, axis=-1) <= 1 + 1e-6).all()
    # degenerate center maps to origin
    p0 = np.asarray(sample_uniform_disk_concentric(jnp.float32(0.5), jnp.float32(0.5)))
    np.testing.assert_allclose(p0, 0.0, atol=1e-7)


def test_uniform_triangle_weights():
    b0, b1, b2 = sample_uniform_triangle(jnp.float32(0.36), jnp.float32(0.5))
    su0 = math.sqrt(0.36)
    np.testing.assert_allclose(float(b0), 1 - su0, rtol=1e-6)
    np.testing.assert_allclose(float(b1), 0.5 * su0, rtol=1e-6)
    np.testing.assert_allclose(float(b0) + float(b1) + float(b2), 1.0, rtol=1e-6)


def test_power_heuristic():
    assert abs(float(power_heuristic(jnp.float32(1.0), jnp.float32(1.0))) - 0.5) < 1e-7
    assert abs(float(power_heuristic(jnp.float32(2.0), jnp.float32(1.0))) - 0.8) < 1e-7


def test_faceforward():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    i_toward = jnp.asarray([[0.0, 0.0, 1.0]])
    i_away = jnp.asarray([[0.0, 0.0, -1.0]])
    np.testing.assert_allclose(np.asarray(faceforward(n, i_toward, n))[0, 2], 1.0)
    np.testing.assert_allclose(np.asarray(faceforward(n, i_away, n))[0, 2], -1.0)


def test_luminance():
    assert abs(float(luminance(jnp.asarray([1.0, 1.0, 1.0]))) - 1.0) < 1e-6
    assert abs(float(luminance(jnp.asarray([0.0, 1.0, 0.0]))) - 0.59) < 1e-6


def test_pdf():
    assert abs(float(cosine_hemisphere_pdf(jnp.float32(1.0))) - 1 / math.pi) < 1e-7
