"""Local-geometry surface derivatives (cuda/LocalGeometry.h:40-176).

The reference's LocalGeometry carries, per texcoord set, the positional and
normal derivatives with respect to the UV parameterization — dpdu/dpdv and
dndu/dndv (LocalGeometry.h:125-162) — solved from the triangle's UV deltas:

    dp1 = P0 - P2, dp2 = P1 - P2, dn1 = N0 - N2, dn2 = N1 - N2
    det = du1 * dv2 - dv1 * du2
    dpdu = ( dv2 * dp1 - dv1 * dp2) / det
    dpdv = (-du2 * dp1 + du1 * dp2) / det      (and the same for dn)

with the no-texcoord fallback UV = barycentrics, dpdu = -dp1,
dpdv = -dp1 + dp2 (LocalGeometry.h:155-162). The reference divides by det
unguarded; here a degenerate UV parameterization (|det| < eps, which the
unguarded reference turns into infs) takes the same fallback branch.

Batched over hits: every output is [R, 3]. Geometry edges come from the
shared SoA (e1 = P1 - P0, e2 = P2 - P0, scene/scene.py GeometrySoA), so
dp1 = -e2 and dp2 = e1 - e2.
"""
from __future__ import annotations

import jax.numpy as jnp

_DET_EPS = 1e-12


def local_geometry_derivs(geom, prim, key: int = 0, uv_set: int = 0):
    """(dpdu, dpdv, dndu, dndv) at each hit primitive, each [R, 3] f32.

    geom: GeometrySoA; prim: [R] int32 face indices (callers clamp to >= 0);
    key: motion key for the positional slab (normals/UVs are key-invariant,
    matching the shading-attribute convention); uv_set: which texcoord set
    parameterizes the derivatives (LocalGeometry.h:132-139 computes them
    per set, j < num_texcoords=2; set 1 without a second UV set takes the
    barycentric fallback like the reference's missing-texcoord branch)."""
    e1 = geom.e1[key, prim]
    e2 = geom.e2[key, prim]
    dp1 = -e2                # P0 - P2
    dp2 = e1 - e2            # P1 - P2
    n0 = geom.n0[key, prim]
    n1 = geom.n1[key, prim]
    n2 = geom.n2[key, prim]
    dn1 = n0 - n2
    dn2 = n1 - n2

    if uv_set == 1 and geom.uv0b is not None:
        uv0 = geom.uv0b[prim]
        uv1 = geom.uv1b[prim]
        uv2 = geom.uv2b[prim]
    elif uv_set == 1:
        # no second set: zero UVs -> degenerate det -> barycentric fallback
        uv0 = uv1 = uv2 = jnp.zeros_like(geom.uv0[prim])
    else:
        uv0 = geom.uv0[prim]
        uv1 = geom.uv1[prim]
        uv2 = geom.uv2[prim]
    du1 = uv0[:, 0] - uv2[:, 0]
    du2 = uv1[:, 0] - uv2[:, 0]
    dv1 = uv0[:, 1] - uv2[:, 1]
    dv2 = uv1[:, 1] - uv2[:, 1]
    det = du1 * dv2 - dv1 * du2
    ok = jnp.abs(det) > _DET_EPS
    invdet = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)[:, None]

    dpdu = (dv2[:, None] * dp1 - dv1[:, None] * dp2) * invdet
    dpdv = (-du2[:, None] * dp1 + du1[:, None] * dp2) * invdet
    dndu = (dv2[:, None] * dn1 - dv1[:, None] * dn2) * invdet
    dndv = (-du2[:, None] * dn1 + du1[:, None] * dn2) * invdet

    okc = ok[:, None]
    return (
        jnp.where(okc, dpdu, -dp1),
        jnp.where(okc, dpdv, -dp1 + dp2),
        jnp.where(okc, dndu, -dn1),
        jnp.where(okc, dndv, -dn1 + dn2),
    )
