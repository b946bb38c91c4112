"""Orthonormal basis construction, matching src/shader/shader_common.h:15-48.

The reference builds a tangent frame per hit point to rotate cosine-hemisphere
samples into world space. Here the construction is batched: normals of shape
[..., 3] in, a (tangent, binormal, normal) triple of the same shape out, with
the branch on |n.x| vs |n.z| expressed as a lane select.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import cross, normalize


def onb_from_normal(n: jnp.ndarray):
    """Returns (tangent, binormal, normal) frames for normals n [..., 3]."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(nz)
    # if |n.x| > |n.z|: b = (-n.y, n.x, 0) else b = (0, -n.z, n.y)
    b = jnp.stack(
        [
            jnp.where(use_x, -ny, jnp.zeros_like(nx)),
            jnp.where(use_x, nx, -nz),
            jnp.where(use_x, jnp.zeros_like(nx), ny),
        ],
        axis=-1,
    )
    b = normalize(b)
    t = cross(b, n)
    return t, b, n


def onb_local_to_world(p_local: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Onb::inverse_transform — rotate a local-frame vector into world space:
    p.x * tangent + p.y * binormal + p.z * normal."""
    t, b, nn = onb_from_normal(n)
    return (
        p_local[..., 0:1] * t + p_local[..., 1:2] * b + p_local[..., 2:3] * nn
    )


def onb_world_to_local(p_world: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Project a world vector into the (tangent, binormal, normal) frame."""
    t, b, nn = onb_from_normal(n)
    return jnp.stack(
        [
            jnp.sum(p_world * t, axis=-1),
            jnp.sum(p_world * b, axis=-1),
            jnp.sum(p_world * nn, axis=-1),
        ],
        axis=-1,
    )


class Onb:
    """Object-style wrapper mirroring the reference API shape."""

    def __init__(self, normal: jnp.ndarray):
        self.tangent, self.binormal, self.normal = onb_from_normal(normal)

    def inverse_transform(self, p: jnp.ndarray) -> jnp.ndarray:
        return (
            p[..., 0:1] * self.tangent
            + p[..., 1:2] * self.binormal
            + p[..., 2:3] * self.normal
        )
