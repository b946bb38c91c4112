"""Monte-Carlo sampling primitives (src/util/sampling.h, src/light.h:36-40).

All routines are pure, batched over leading axes, and take uniforms as
explicit arguments so the caller owns the RNG stream ordering — this is what
lets the wavefront integrator reproduce the reference's exact draw sequence.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

M_PI = math.pi


def safe_sqrt(x):
    """src/util/math.h:21-23 — sqrt of max(0, x)."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def sample_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere direction in the local +z frame
    (src/util/sampling.h:28-37). Returns [..., 3]."""
    r = jnp.sqrt(u1)
    phi = 2.0 * M_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - x * x - y * y)
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    """src/util/sampling.h:40-42."""
    return cos_theta * (1.0 / M_PI)


def sample_uniform_disk_concentric(u1, u2):
    """Concentric disk mapping (src/util/sampling.h:9-25). Returns [..., 2]."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    # Guard the 0/0 at the origin; that lane is zeroed below anyway.
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    theta = jnp.where(
        use_x,
        (M_PI / 4.0) * (oy / safe_ox),
        (M_PI / 2.0) - (M_PI / 4.0) * (ox / safe_oy),
    )
    p = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    degenerate = (ox == 0.0) & (oy == 0.0)
    return jnp.where(degenerate[..., None], 0.0, p)


def sample_uniform_triangle(u, v):
    """Uniform barycentric point on a triangle via the sqrt warp used by
    Light::Sample (src/light.h:36-40). Returns (b0, b1, b2) weights on
    (v0, v1, v2)."""
    su0 = jnp.sqrt(u)
    b0 = 1.0 - su0
    b1 = v * su0
    return b0, b1, 1.0 - b0 - b1


def power_heuristic(p1, p2):
    """MIS power heuristic (beta=2), src/shader/shader_common.h:137-145."""
    p1_2 = p1 * p1
    p2_2 = p2 * p2
    return p1_2 / (p1_2 + p2_2)
