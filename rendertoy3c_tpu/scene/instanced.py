"""Two-level acceleration structure: trace-time instancing.

The reference's IAS wraps per-mesh GAS handles in OptixInstance records with
per-instance transforms (src/cuda/cuda_accel.h:75-150), optionally through a
2-key matrix motion transform (cuda_accel.h:38-73); traversal transforms rays
into object space per instance. `build_scene` (scene.py) instead BAKES
instances into world-space triangles — exact, but it duplicates geometry per
instance. This module is the true two-level path: geometry is stored once in
object space, and instances are resolved at trace time by transforming rays
with the inverse instance matrix (t values stay world-parametric because the
transformed direction is left unnormalized).

Shading reads object-space attributes and transforms normals by the
instance's inverse-transpose; emissive-triangle lights are instantiated to
world space at build time (matching buildLightSampler's world-space scan,
src/wavefront.cpp:257-275).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .light import build_light_table
from .material import Material, build_material_table
from .mesh import Mesh
from .scene import GeometrySoA, Instance, _apply_affine

INST_FACE_ALIGN = 128  # per-mesh face padding on the instanced path
from .texture import build_texture_atlas, _empty_atlas


class InstanceTable(NamedTuple):
    """Device SoA over instances (<= 2 motion keys, key 1 == key 0 when
    static, like OptixMatrixMotionTransform's two keys)."""

    mesh_id: jnp.ndarray   # [I] i32
    m: jnp.ndarray         # [I, 2, 3, 4] object -> world
    minv: jnp.ndarray      # [I, 2, 3, 4] world -> object
    inv_t: jnp.ndarray     # [I, 2, 3, 3] inverse-transpose (normals)
    aabb_lo: jnp.ndarray   # [I, 3] world AABB over all keys
    aabb_hi: jnp.ndarray   # [I, 3]


@jax.tree_util.register_dataclass
@dataclass
class InstancedScene:
    geom: GeometrySoA  # OBJECT-space, all meshes concatenated on the face axis
    instances: InstanceTable
    materials: object
    lights: object
    atlas: object
    # (start, padded_count) per mesh on the concatenated face axis
    mesh_ranges: tuple = field(metadata=dict(static=True), default=())
    num_keys: int = field(metadata=dict(static=True), default=1)
    num_faces: int = field(metadata=dict(static=True), default=0)
    num_instances: int = field(metadata=dict(static=True), default=0)
    num_lights: int = field(metadata=dict(static=True), default=0)
    num_materials: int = field(metadata=dict(static=True), default=0)
    all_diffuse: bool = field(metadata=dict(static=True), default=True)
    any_uv_transform: bool = field(metadata=dict(static=True), default=False)
    any_normal_map: bool = field(metadata=dict(static=True), default=False)
    # instance mesh ids as a static tuple (kernel unrolls over instances)
    instance_mesh: tuple = field(metadata=dict(static=True), default=())


def _affine_inverse(m: np.ndarray) -> np.ndarray:
    """[3,4] affine inverse."""
    lin = np.linalg.inv(m[:, :3])
    out = np.zeros((3, 4), np.float32)
    out[:, :3] = lin
    out[:, 3] = -lin @ m[:, 3]
    return out


def build_instanced_scene(
    meshes: Sequence[Mesh],
    instances: Sequence[Instance],
    textures: Optional[Sequence[np.ndarray]] = None,
    emissive_threshold: float = 1e-5,
) -> InstancedScene:
    """Object-space meshes + an instance table (two-level AS).

    Static meshes only for now (vertex motion inside a BLAS still goes
    through the baked path); instance MATRIX motion (2 keys) is supported.
    """
    meshes = [m.with_computed_normals() for m in meshes]
    for m in meshes:
        if m.num_keys != 1:
            raise ValueError(
                "instanced path supports static meshes; bake vertex-keyed "
                "meshes with build_scene"
            )

    # concatenate object-space geometry, each mesh padded to
    # INST_FACE_ALIGN (128 = one vector width: small instanced meshes
    # would waste ~4x their sweep cost at the baked path's 512 alignment)
    slabs = {k: [] for k in ("v0", "e1", "e2", "n0", "n1", "n2")}
    uv0s, uv1s, uv2s, mat_ids = [], [], [], []
    any_uv2 = any(m.texcoords1 is not None for m in meshes)
    any_vcolor = any(m.colors is not None for m in meshes)
    uvb0s, uvb1s, uvb2s = [], [], []
    c0s, c1s, c2s = [], [], []
    materials: list[Material] = []
    mesh_ranges: list[Tuple[int, int]] = []
    cursor = 0
    for mi, mesh in enumerate(meshes):
        mat_index = len(materials)
        materials.append(mesh.material)
        f = mesh.indices
        v = mesh.vertices[0]
        n = mesh.normals[0]
        nf = mesh.num_faces
        padded = -(-max(nf, 1) // INST_FACE_ALIGN) * INST_FACE_ALIGN

        def padf(a):
            return np.pad(
                a.astype(np.float32), ((0, padded - nf), (0, 0))
            )

        slabs["v0"].append(padf(v[f[:, 0]]))
        slabs["e1"].append(padf(v[f[:, 1]] - v[f[:, 0]]))
        slabs["e2"].append(padf(v[f[:, 2]] - v[f[:, 0]]))
        slabs["n0"].append(padf(n[f[:, 0]]))
        slabs["n1"].append(padf(n[f[:, 1]]))
        slabs["n2"].append(padf(n[f[:, 2]]))
        uvs = (
            mesh.texcoords
            if mesh.texcoords is not None
            else np.zeros((v.shape[0], 2), np.float32)
        )
        uv0s.append(np.pad(uvs[f[:, 0]], ((0, padded - nf), (0, 0))))
        uv1s.append(np.pad(uvs[f[:, 1]], ((0, padded - nf), (0, 0))))
        uv2s.append(np.pad(uvs[f[:, 2]], ((0, padded - nf), (0, 0))))
        if any_uv2:
            uvb = (mesh.texcoords1 if mesh.texcoords1 is not None
                   else np.zeros((v.shape[0], 2), np.float32))
            uvb0s.append(np.pad(uvb[f[:, 0]], ((0, padded - nf), (0, 0))))
            uvb1s.append(np.pad(uvb[f[:, 1]], ((0, padded - nf), (0, 0))))
            uvb2s.append(np.pad(uvb[f[:, 2]], ((0, padded - nf), (0, 0))))
        if any_vcolor:
            cols = (mesh.colors if mesh.colors is not None
                    else np.ones((v.shape[0], 4), np.float32))
            c0s.append(np.pad(cols[f[:, 0]], ((0, padded - nf), (0, 0))))
            c1s.append(np.pad(cols[f[:, 1]], ((0, padded - nf), (0, 0))))
            c2s.append(np.pad(cols[f[:, 2]], ((0, padded - nf), (0, 0))))
        mat_ids.append(
            np.pad(np.full(nf, mat_index, np.int32), (0, padded - nf))
        )
        mesh_ranges.append((cursor, padded))
        cursor += padded

    geom = GeometrySoA(
        v0=jnp.asarray(np.concatenate(slabs["v0"])[None]),
        e1=jnp.asarray(np.concatenate(slabs["e1"])[None]),
        e2=jnp.asarray(np.concatenate(slabs["e2"])[None]),
        n0=jnp.asarray(np.concatenate(slabs["n0"])[None]),
        n1=jnp.asarray(np.concatenate(slabs["n1"])[None]),
        n2=jnp.asarray(np.concatenate(slabs["n2"])[None]),
        uv0=jnp.asarray(np.concatenate(uv0s)),
        uv1=jnp.asarray(np.concatenate(uv1s)),
        uv2=jnp.asarray(np.concatenate(uv2s)),
        mat_id=jnp.asarray(np.concatenate(mat_ids)),
        uv0b=jnp.asarray(np.concatenate(uvb0s)) if any_uv2 else None,
        uv1b=jnp.asarray(np.concatenate(uvb1s)) if any_uv2 else None,
        uv2b=jnp.asarray(np.concatenate(uvb2s)) if any_uv2 else None,
        c0=jnp.asarray(np.concatenate(c0s)) if any_vcolor else None,
        c1=jnp.asarray(np.concatenate(c1s)) if any_vcolor else None,
        c2=jnp.asarray(np.concatenate(c2s)) if any_vcolor else None,
    )

    # instance table + world AABBs + world-space light triangles
    n_inst = len(instances)
    mids = np.zeros(n_inst, np.int32)
    m_arr = np.zeros((n_inst, 2, 3, 4), np.float32)
    minv_arr = np.zeros((n_inst, 2, 3, 4), np.float32)
    invt_arr = np.zeros((n_inst, 2, 3, 3), np.float32)
    lo_arr = np.zeros((n_inst, 3), np.float32)
    hi_arr = np.zeros((n_inst, 3), np.float32)
    light_v0, light_v1, light_v2, light_e = [], [], [], []
    num_keys = 1
    for i, inst in enumerate(instances):
        mesh = meshes[inst.mesh_index]
        mids[i] = inst.mesh_index
        kt = inst.transforms.shape[0]
        num_keys = max(num_keys, kt)
        for key in range(2):
            t = inst.transforms[min(key, kt - 1)]
            m_arr[i, key] = t
            minv_arr[i, key] = _affine_inverse(t)
            invt_arr[i, key] = np.linalg.inv(t[:, :3]).T
        # world AABB over both keys
        v = mesh.vertices[0]
        pts = np.concatenate([
            _apply_affine(m_arr[i, 0], v), _apply_affine(m_arr[i, 1], v)
        ])
        lo_arr[i] = pts.min(axis=0)
        hi_arr[i] = pts.max(axis=0)
        emissive = np.asarray(mesh.material.emissive, np.float32)
        if np.linalg.norm(emissive) >= emissive_threshold:
            f = mesh.indices
            vw0 = _apply_affine(inst.transforms[0], v)
            light_v0.append(vw0[f[:, 0]])
            light_v1.append(vw0[f[:, 1]])
            light_v2.append(vw0[f[:, 2]])
            light_e.append(np.broadcast_to(emissive, (len(f), 3)))

    num_lights = sum(len(x) for x in light_v0)
    lights = build_light_table(
        np.concatenate(light_v0) if light_v0 else np.zeros((0, 3)),
        np.concatenate(light_v1) if light_v1 else np.zeros((0, 3)),
        np.concatenate(light_v2) if light_v2 else np.zeros((0, 3)),
        np.concatenate(light_e) if light_e else np.zeros((0, 3)),
    )
    atlas = build_texture_atlas(textures) if textures else _empty_atlas()

    from .material import MaterialType

    return InstancedScene(
        geom=geom,
        instances=InstanceTable(
            mesh_id=jnp.asarray(mids),
            m=jnp.asarray(m_arr),
            minv=jnp.asarray(minv_arr),
            inv_t=jnp.asarray(invt_arr),
            aabb_lo=jnp.asarray(lo_arr),
            aabb_hi=jnp.asarray(hi_arr),
        ),
        materials=build_material_table(materials),
        lights=lights,
        atlas=atlas,
        mesh_ranges=tuple(mesh_ranges),
        num_keys=num_keys,
        num_faces=cursor,
        num_instances=n_inst,
        num_lights=int(num_lights),
        num_materials=len(materials),
        all_diffuse=all(
            m.material_type == MaterialType.DIFFUSE for m in materials
        ),
        any_uv_transform=any(m.has_uv_transform() for m in materials),
        any_normal_map=any(m.normal_texture_id >= 0 for m in materials),
        instance_mesh=tuple(int(x) for x in mids),
    )
