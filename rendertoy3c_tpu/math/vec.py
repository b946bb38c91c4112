"""Vector math over jnp arrays with a trailing component axis.

The reference carries a hand-written float3 operator library
(sutil/vec_math.h); on TPU this is all native jnp — vectors are [..., 3]
arrays and every op below is batched over arbitrary leading axes, so one call
processes an entire wavefront of rays on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis. Returns [...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3D cross product (explicit formula; jnp.cross lowers poorly)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Normalize over the trailing axis.

    eps=0 reproduces reference semantics (sutil/vec_math.h normalize uses
    rsqrt with no guard); pass a small eps to guard degenerate vectors.
    """
    d = jnp.sum(a * a, axis=-1, keepdims=True)
    if eps:
        d = jnp.maximum(d, eps)
    return a * jax_rsqrt(d)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax

    return jax.lax.rsqrt(x)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """NTSC luminance, matching cuda/helpers.h:68-72 (0.30/0.59/0.11)."""
    w = jnp.asarray([0.30, 0.59, 0.11], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def faceforward(n: jnp.ndarray, i: jnp.ndarray, nref: jnp.ndarray) -> jnp.ndarray:
    """Flip n to lie in the hemisphere of i w.r.t. nref.

    Matches sutil/vec_math.h faceforward: n * copysign(1, dot(i, nref)).
    """
    s = jnp.where(dot(i, nref) >= 0.0, 1.0, -1.0)
    return n * s[..., None]


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection of direction i about normal n (i points *into* the
    surface, as in sutil/vec_math.h reflect)."""
    return i - 2.0 * dot(i, n)[..., None] * n


def refract(i: jnp.ndarray, n: jnp.ndarray, eta):
    """Snell refraction; returns (dir, total_internal_reflection_mask)."""
    cos_i = -dot(i, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d = eta * i + (eta * cos_i - cos_t)[..., None] * n
    return d, tir


def lerp(a, b, t):
    return a + (b - a) * t
