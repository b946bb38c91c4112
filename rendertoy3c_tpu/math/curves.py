"""Curve primitive evaluators: linear / quadratic B-spline / cubic B-spline /
Catmull-Rom position, velocity (derivative), radius, and surface normals.

Parity with the reference's curve library (cuda/curve.h:38-443, used by the
whitted stack's curve primitives, GeometryData.h:106-135). Control points are
[..., N, 3] with per-point radii [..., N]; u is the curve parameter in
[0, 1]. All evaluators are batched jnp ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from .vec import dot, normalize


# --- basis evaluation: each returns (weights, dweights/du) of shape
# [..., n_ctrl] for the given u [...] -------------------------------------

def _linear_basis(u):
    return (
        jnp.stack([1.0 - u, u], axis=-1),
        jnp.stack([-jnp.ones_like(u), jnp.ones_like(u)], axis=-1),
    )


def _quadratic_bspline_basis(u):
    # curve.h QuadraticBSplineSegment (3 control points)
    w0 = 0.5 * (1.0 - u) * (1.0 - u)
    w1 = 0.5 + u * (1.0 - u)
    w2 = 0.5 * u * u
    d0 = u - 1.0
    d1 = 1.0 - 2.0 * u
    d2 = u
    return jnp.stack([w0, w1, w2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def _cubic_bspline_basis(u):
    # curve.h CubicBSplineSegment (4 control points)
    u2 = u * u
    u3 = u2 * u
    w0 = (1.0 - 3.0 * u + 3.0 * u2 - u3) / 6.0
    w1 = (4.0 - 6.0 * u2 + 3.0 * u3) / 6.0
    w2 = (1.0 + 3.0 * u + 3.0 * u2 - 3.0 * u3) / 6.0
    w3 = u3 / 6.0
    d0 = (-3.0 + 6.0 * u - 3.0 * u2) / 6.0
    d1 = (-12.0 * u + 9.0 * u2) / 6.0
    d2 = (3.0 + 6.0 * u - 9.0 * u2) / 6.0
    d3 = 3.0 * u2 / 6.0
    return (
        jnp.stack([w0, w1, w2, w3], axis=-1),
        jnp.stack([d0, d1, d2, d3], axis=-1),
    )


def _catmull_rom_basis(u):
    # curve.h CatmullRomSegment (4 control points, tension 0.5)
    u2 = u * u
    u3 = u2 * u
    w0 = -0.5 * u3 + u2 - 0.5 * u
    w1 = 1.5 * u3 - 2.5 * u2 + 1.0
    w2 = -1.5 * u3 + 2.0 * u2 + 0.5 * u
    w3 = 0.5 * u3 - 0.5 * u2
    d0 = -1.5 * u2 + 2.0 * u - 0.5
    d1 = 4.5 * u2 - 5.0 * u
    d2 = -4.5 * u2 + 4.0 * u + 0.5
    d3 = 1.5 * u2 - u
    return (
        jnp.stack([w0, w1, w2, w3], axis=-1),
        jnp.stack([d0, d1, d2, d3], axis=-1),
    )


_BASES = {
    "linear": (_linear_basis, 2),
    "quadratic_bspline": (_quadratic_bspline_basis, 3),
    "cubic_bspline": (_cubic_bspline_basis, 4),
    "catmull_rom": (_catmull_rom_basis, 4),
}


def curve_eval(kind: str, ctrl, radii, u):
    """Evaluate (position [..,3], velocity [..,3], radius [..],
    dradius/du [..]) at u for a curve segment.

    ctrl [..., n, 3], radii [..., n], u [...]; n must match the basis
    (linear 2, quadratic 3, cubic/catrom 4) — curve.h's per-degree
    position/velocity/radius evaluators.
    """
    basis, n = _BASES[kind]
    w, dw = basis(u)
    assert ctrl.shape[-2] == n, f"{kind} needs {n} control points"
    pos = jnp.sum(w[..., None] * ctrl, axis=-2)
    vel = jnp.sum(dw[..., None] * ctrl, axis=-2)
    rad = jnp.sum(w * radii, axis=-1)
    drad = jnp.sum(dw * radii, axis=-1)
    return pos, vel, rad, drad


def curve_surface_normal(kind: str, ctrl, radii, u, hit_p):
    """Normal of the swept-sphere curve surface at hit point hit_p
    (curve.h surfaceNormal: the normal accounts for the varying radius by
    tilting along the tangent)."""
    pos, vel, rad, drad = curve_eval(kind, ctrl, radii, u)
    tang = normalize(vel, eps=1e-20)
    n_raw = hit_p - pos
    # remove the tangential component scaled by the radius slope
    n = n_raw - (drad[..., None]) * tang * (
        rad[..., None] / jnp.maximum(
            jnp.sqrt(jnp.maximum(dot(vel, vel), 1e-20))[..., None], 1e-20
        )
    )
    return normalize(n, eps=1e-20)
