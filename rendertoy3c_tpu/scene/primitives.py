"""Scene-level analytic primitives (non-triangle geometry).

Parity with the legacy whitted pipeline's custom-primitive path: the
reference registers sphere / sphere-shell / parallelogram intersection
programs (cuda/geometry.cu:38-144, cuda/sphere.cu:37-96) and swept-sphere
curves (cuda/curve.h) into the whitted SBT (sutil/Scene.cpp:1214-1452)
with schemas in cuda/GeometryData.h:55-135. Here each primitive kind is a
dense SoA slab on the Scene — the TPU dispatch is a static per-kind sweep
(every ray tests every primitive of a kind in one vectorized pass; custom
primitives are few per scene, exactly like the reference's hand-built
whitted scenes), not a per-primitive program table.

Shading: analytic hits carry their own normal/uv/material and flow through
the same GGX direct-lighting shade as triangles (integrate/direct.py),
mirroring how the reference shades customs through whitted-stack programs.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .material import Material

# user-facing primitive descriptions ---------------------------------------


@dataclass
class Sphere:
    """GeometryData.h:69-73 Sphere{center, radius}."""

    center: tuple
    radius: float
    material: Material = field(default_factory=Material)


@dataclass
class SphereShell:
    """GeometryData.h:75-86 SphereShell{center, radius1, radius2}."""

    center: tuple
    r_inner: float
    r_outer: float
    material: Material = field(default_factory=Material)


@dataclass
class Parallelogram:
    """GeometryData.h:55-67 Parallelogram{v1, v2, anchor} (uv = plane
    coordinates, like the reference's plane-equation intersector)."""

    anchor: tuple
    v1: tuple
    v2: tuple
    material: Material = field(default_factory=Material)


@dataclass
class Curve:
    """One swept-sphere curve segment (cuda/curve.h evaluators;
    GeometryData.h:88-135 curve arrays). kind in {linear,
    quadratic_bspline, cubic_bspline, catmull_rom}; ctrl [n,3], radii [n]
    with n = 2/3/4/4."""

    kind: str
    ctrl: np.ndarray
    radii: np.ndarray
    material: Material = field(default_factory=Material)


# device SoA ----------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class CurveSoA:
    ctrl: jnp.ndarray   # [C, n, 3]
    radii: jnp.ndarray  # [C, n]
    mat_id: jnp.ndarray  # [C] int32
    kind: str = field(metadata=dict(static=True), default="linear")


@jax.tree_util.register_dataclass
@dataclass
class PrimSoA:
    """Dense per-kind primitive slabs; zero-length arrays mean "none of
    this kind" (the python-level gates are static on shapes)."""

    sph_center: jnp.ndarray   # [S, 3]
    sph_radius: jnp.ndarray   # [S]
    sph_mat: jnp.ndarray      # [S] int32
    shell_center: jnp.ndarray  # [H, 3]
    shell_radii: jnp.ndarray   # [H, 2] (inner, outer)
    shell_mat: jnp.ndarray     # [H] int32
    par_anchor: jnp.ndarray   # [Q, 3]
    par_v1: jnp.ndarray       # [Q, 3]
    par_v2: jnp.ndarray       # [Q, 3]
    par_mat: jnp.ndarray      # [Q] int32
    curves: tuple = ()        # tuple[CurveSoA, ...], one per basis present


def build_prim_soa(prims: Sequence, material_index) -> Optional[PrimSoA]:
    """Pack user primitives into per-kind SoA slabs.

    material_index(mat) -> int appends/uniquifies into the scene's
    material list (primitives share the mesh material table)."""
    if not prims:
        return None
    sph, shell, par = [], [], []
    curves: dict[str, list] = {}
    for p in prims:
        mid = material_index(p.material)
        if isinstance(p, Sphere):
            sph.append((p.center, p.radius, mid))
        elif isinstance(p, SphereShell):
            shell.append((p.center, (p.r_inner, p.r_outer), mid))
        elif isinstance(p, Parallelogram):
            par.append((p.anchor, p.v1, p.v2, mid))
        elif isinstance(p, Curve):
            curves.setdefault(p.kind, []).append(
                (np.asarray(p.ctrl, np.float32),
                 np.asarray(p.radii, np.float32), mid))
        else:
            raise TypeError(f"unknown primitive {type(p).__name__}")

    def arr(xs, pick, shape_tail, dtype=np.float32):
        if not xs:
            return jnp.zeros((0,) + shape_tail, dtype)
        return jnp.asarray(np.asarray([pick(x) for x in xs], dtype))

    curve_soas = []
    for kind, items in sorted(curves.items()):
        curve_soas.append(CurveSoA(
            ctrl=jnp.asarray(np.stack([c for c, _r, _m in items])),
            radii=jnp.asarray(np.stack([r for _c, r, _m in items])),
            mat_id=jnp.asarray(
                np.asarray([m for _c, _r, m in items], np.int32)),
            kind=kind,
        ))

    return PrimSoA(
        sph_center=arr(sph, lambda x: x[0], (3,)),
        sph_radius=arr(sph, lambda x: x[1], ()),
        sph_mat=arr(sph, lambda x: x[2], (), np.int32),
        shell_center=arr(shell, lambda x: x[0], (3,)),
        shell_radii=arr(shell, lambda x: x[1], (2,)),
        shell_mat=arr(shell, lambda x: x[2], (), np.int32),
        par_anchor=arr(par, lambda x: x[0], (3,)),
        par_v1=arr(par, lambda x: x[1], (3,)),
        par_v2=arr(par, lambda x: x[2], (3,)),
        par_mat=arr(par, lambda x: x[3], (), np.int32),
        curves=tuple(curve_soas),
    )
