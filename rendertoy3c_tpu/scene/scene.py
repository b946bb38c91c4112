"""Device scene: the TPU-native equivalent of CUDAScene + the SBT
(src/cuda/cuda_scene.h:12-185).

Where the reference uploads per-mesh buffers and wires raw device pointers
into per-instance SBT hitgroup records, the TPU design is one flat
structure-of-arrays pytree:

  * per-face intersection data (v0/e1/e2) and shading data (corner normals,
    corner UVs, material id) — gather-dispatched by primitive index, which is
    what the SBT record lookup becomes under XLA;
  * a material table (material.py) and emissive-triangle light table
    (light.py);
  * one texture atlas (texture.py).

Geometry is stored per motion key; motion blur interpolates linearly in t,
which is exact under the reference's matrix-motion semantics because
((1-t)*M0 + t*M1) @ v == (1-t)*(M0 @ v) + t*(M1 @ v)
(src/cuda/cuda_accel.h:38-73 uploads element-wise-lerped matrix keys).
Instance flattening therefore bakes world-space keyframes ahead of time with
no loss of fidelity for single-level motion (GAS vertex keys under a static
instance, or static GAS under matrix motion — the two configurations the
reference supports, src/cuda/cuda_mesh.h:85-88, cuda_accel.h:38-73).

Scene is a registered dataclass-pytree: array leaves flow through jit; counts
are static metadata so kernels specialize on them.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .light import LightTable, build_light_table
from .material import Material, MaterialTable, build_material_table
from .mesh import Mesh
from .texture import TextureAtlas, build_texture_atlas, _empty_atlas

# Face-axis alignment of the device SoA; tracer chunk sizes must divide this.
FACE_ALIGN = 512


class GeometrySoA(NamedTuple):
    """Per-face world-space SoA, one slab per motion key.

    v0/e1/e2 feed ray-triangle intersection; n0..n2 / uv0..uv2 / mat_id feed
    shading. Edges may be lerped across keys directly (linear in vertices).
    """

    v0: jnp.ndarray  # [K, F, 3]
    e1: jnp.ndarray  # [K, F, 3]  (v1 - v0)
    e2: jnp.ndarray  # [K, F, 3]  (v2 - v0)
    n0: jnp.ndarray  # [K, F, 3]
    n1: jnp.ndarray  # [K, F, 3]
    n2: jnp.ndarray  # [K, F, 3]
    uv0: jnp.ndarray  # [F, 2]
    uv1: jnp.ndarray  # [F, 2]
    uv2: jnp.ndarray  # [F, 2]
    mat_id: jnp.ndarray  # [F] int32
    # second texcoord set (glTF TEXCOORD_1; cuda/GeometryData.h:71-79
    # num_texcoords=2) — present only when some mesh carries one (None
    # otherwise, so scenes without it pay no memory)
    uv0b: Optional[jnp.ndarray] = None  # [F, 2]
    uv1b: Optional[jnp.ndarray] = None  # [F, 2]
    uv2b: Optional[jnp.ndarray] = None  # [F, 2]
    # per-corner RGBA vertex color (glTF COLOR_0, cuda/GeometryData.h:80;
    # LocalGeometry.h:97-104 interpolates it, whitted.cu:157 folds it into
    # base color) — None when no mesh carries COLOR_0
    c0: Optional[jnp.ndarray] = None  # [F, 4]
    c1: Optional[jnp.ndarray] = None  # [F, 4]
    c2: Optional[jnp.ndarray] = None  # [F, 4]


@dataclass
class Instance:
    """One placement of a mesh, optionally with matrix motion keys.

    transforms: [KT, 3, 4] row-major affine (KT=1 static, KT=2 matrix motion,
    matching OptixMatrixMotionTransform's two keys, cuda_accel.h:38-73).
    """

    mesh_index: int
    transforms: np.ndarray = None

    def __post_init__(self):
        if self.transforms is None:
            t = np.zeros((1, 3, 4), np.float32)
            t[0, :, :3] = np.eye(3)
            self.transforms = t
        else:
            self.transforms = np.asarray(self.transforms, np.float32)
            if self.transforms.ndim == 2:
                self.transforms = self.transforms[None]


@jax.tree_util.register_dataclass
@dataclass
class Scene:
    geom: GeometrySoA
    materials: MaterialTable
    lights: LightTable
    atlas: TextureAtlas
    # optional lat-long environment map consumed by the miss program
    # (the reference's background direct-callable slot, miss.cu:30)
    env: Optional[object] = None
    num_keys: int = field(metadata=dict(static=True), default=1)
    num_faces: int = field(metadata=dict(static=True), default=0)
    num_lights: int = field(metadata=dict(static=True), default=0)
    num_materials: int = field(metadata=dict(static=True), default=0)
    # True when every material is plain DIFFUSE — lets the integrator keep
    # the reference-exact Lambertian fast path with zero dispatch overhead.
    all_diffuse: bool = field(metadata=dict(static=True), default=True)
    # True when any material carries a texture-coordinate transform
    any_uv_transform: bool = field(metadata=dict(static=True), default=False)
    # True when any material carries a (tangent-space) normal map
    any_normal_map: bool = field(metadata=dict(static=True), default=False)
    # optional analytic-primitive slabs (scene/primitives.py PrimSoA) —
    # the whitted custom-primitive path (cuda/GeometryData.h:55-135);
    # consumed by the direct renderer's combined tracer
    prims: Optional[object] = None
    # True after a VARIABLE-leaf SAH reorder (accel/lbvh.py: interior
    # zero-face padding, num_faces includes it) — tunes the walk-pool
    # phase cadence for the shorter walks such orderings produce
    variable_ordered: bool = field(metadata=dict(static=True),
                                   default=False)


def _apply_affine(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """[3,4] affine applied to [N,3] points."""
    return pts @ m[:, :3].T + m[:, 3]


def _apply_normal(m: np.ndarray, nrm: np.ndarray) -> np.ndarray:
    """Normals transform by inverse-transpose of the linear part."""
    lin = m[:, :3]
    nt = nrm @ np.linalg.inv(lin)
    lens = np.linalg.norm(nt, axis=-1, keepdims=True)
    return nt / np.maximum(lens, 1e-20)


def build_scene(
    meshes: Sequence[Mesh],
    instances: Optional[Sequence[Instance]] = None,
    textures: Optional[Sequence[np.ndarray]] = None,
    emissive_threshold: float = 1e-5,
    env_map=None,
    prims: Optional[Sequence] = None,
) -> Scene:
    """Flatten meshes/instances into a world-space device scene.

    Default instancing matches the reference app: one identity-transform
    instance per mesh (src/wavefront.cpp:141-147 via cuda_scene.h:141-147).
    """
    meshes = [m.with_computed_normals() for m in meshes]
    if instances is None:
        instances = [Instance(mesh_index=i) for i in range(len(meshes))]

    num_keys = 1
    for inst in instances:
        mesh = meshes[inst.mesh_index]
        kt = inst.transforms.shape[0]
        if kt > 1 and mesh.num_keys > 1:
            raise ValueError(
                "combined vertex-motion + matrix-motion on one instance is "
                "not linear in t; bake one of them instead"
            )
        num_keys = max(num_keys, kt, mesh.num_keys)

    slabs = {k: [] for k in ("v0", "e1", "e2", "n0", "n1", "n2")}
    uv0s, uv1s, uv2s, mat_ids = [], [], [], []
    # second UV set / vertex colors: only materialized when some mesh has
    # them (reference defaults: missing TEXCOORD_1 -> UV 0, missing COLOR_0
    # -> white, LocalGeometry.h:105-107/132-139)
    any_uv2 = any(meshes[i.mesh_index].texcoords1 is not None
                  for i in instances)
    any_vcolor = any(meshes[i.mesh_index].colors is not None
                     for i in instances)
    uvb0s, uvb1s, uvb2s = [], [], []
    c0s, c1s, c2s = [], [], []
    materials: list[Material] = []
    light_v0, light_v1, light_v2, light_e = [], [], [], []

    for inst in instances:
        mesh = meshes[inst.mesh_index]
        mat_index = len(materials)
        materials.append(mesh.material)
        f = mesh.indices

        per_key = {k: [] for k in slabs}
        for key in range(num_keys):
            # Sample both the vertex track and the transform track at this
            # key (clamped when a track is shorter — static tracks replicate).
            vk = mesh.vertices[min(key, mesh.num_keys - 1)]
            nk = mesh.normals[min(key, mesh.num_keys - 1)]
            tk = inst.transforms[min(key, inst.transforms.shape[0] - 1)]
            vw = _apply_affine(tk, vk)
            nw = _apply_normal(tk, nk)
            per_key["v0"].append(vw[f[:, 0]])
            per_key["e1"].append(vw[f[:, 1]] - vw[f[:, 0]])
            per_key["e2"].append(vw[f[:, 2]] - vw[f[:, 0]])
            per_key["n0"].append(nw[f[:, 0]])
            per_key["n1"].append(nw[f[:, 1]])
            per_key["n2"].append(nw[f[:, 2]])
        for k in slabs:
            slabs[k].append(np.stack(per_key[k], axis=0))

        uvs = (
            mesh.texcoords
            if mesh.texcoords is not None
            else np.zeros((mesh.vertices.shape[1], 2), np.float32)
        )
        uv0s.append(uvs[f[:, 0]])
        uv1s.append(uvs[f[:, 1]])
        uv2s.append(uvs[f[:, 2]])
        if any_uv2:
            uvb = (mesh.texcoords1 if mesh.texcoords1 is not None
                   else np.zeros((mesh.vertices.shape[1], 2), np.float32))
            uvb0s.append(uvb[f[:, 0]])
            uvb1s.append(uvb[f[:, 1]])
            uvb2s.append(uvb[f[:, 2]])
        if any_vcolor:
            cols = (mesh.colors if mesh.colors is not None
                    else np.ones((mesh.vertices.shape[1], 4), np.float32))
            c0s.append(cols[f[:, 0]])
            c1s.append(cols[f[:, 1]])
            c2s.append(cols[f[:, 2]])
        mat_ids.append(np.full(mesh.num_faces, mat_index, np.int32))

        # Light table entries from key-0 world vertices of emissive meshes
        # (src/wavefront.cpp:257-275).
        emissive = np.asarray(mesh.material.emissive, np.float32)
        if np.linalg.norm(emissive) >= emissive_threshold:
            vw0 = _apply_affine(
                inst.transforms[0], mesh.vertices[0]
            )
            light_v0.append(vw0[f[:, 0]])
            light_v1.append(vw0[f[:, 1]])
            light_v2.append(vw0[f[:, 2]])
            light_e.append(np.broadcast_to(emissive, (len(f), 3)))

    # Pad the face axis to FACE_ALIGN so chunked tracers can slice uniform
    # blocks without end-of-array clamping; padding faces are degenerate
    # (v0 = e1 = e2 = 0 -> zero determinant -> never hit).
    num_faces_real = int(sum(len(x) for x in mat_ids))
    padded = -(-max(num_faces_real, 1) // FACE_ALIGN) * FACE_ALIGN

    def cat(xs, per_key: bool):
        a = np.concatenate(xs, axis=1 if per_key else 0).astype(np.float32)
        pad_n = padded - num_faces_real
        if pad_n:
            width = ((0, 0), (0, pad_n), (0, 0)) if per_key else ((0, pad_n), (0, 0))
            a = np.pad(a, width)
        return jnp.asarray(a)

    mat_cat = np.concatenate(mat_ids)
    mat_cat = np.pad(mat_cat, (0, padded - num_faces_real))
    geom = GeometrySoA(
        v0=cat(slabs["v0"], True),
        e1=cat(slabs["e1"], True),
        e2=cat(slabs["e2"], True),
        n0=cat(slabs["n0"], True),
        n1=cat(slabs["n1"], True),
        n2=cat(slabs["n2"], True),
        uv0=cat(uv0s, False),
        uv1=cat(uv1s, False),
        uv2=cat(uv2s, False),
        mat_id=jnp.asarray(mat_cat.astype(np.int32)),
        uv0b=cat(uvb0s, False) if any_uv2 else None,
        uv1b=cat(uvb1s, False) if any_uv2 else None,
        uv2b=cat(uvb2s, False) if any_uv2 else None,
        c0=cat(c0s, False) if any_vcolor else None,
        c1=cat(c1s, False) if any_vcolor else None,
        c2=cat(c2s, False) if any_vcolor else None,
    )

    num_lights = sum(len(x) for x in light_v0)
    lights = build_light_table(
        np.concatenate(light_v0) if light_v0 else np.zeros((0, 3)),
        np.concatenate(light_v1) if light_v1 else np.zeros((0, 3)),
        np.concatenate(light_v2) if light_v2 else np.zeros((0, 3)),
        np.concatenate(light_e) if light_e else np.zeros((0, 3)),
    )

    atlas = build_texture_atlas(textures) if textures else _empty_atlas()

    from .material import MaterialType

    prim_soa = None
    if prims:
        from .primitives import build_prim_soa

        def material_index(mat):
            materials.append(mat)
            return len(materials) - 1

        prim_soa = build_prim_soa(prims, material_index)

    return Scene(
        geom=geom,
        materials=build_material_table(materials),
        lights=lights,
        atlas=atlas,
        env=env_map,
        num_keys=num_keys,
        num_faces=num_faces_real,
        num_lights=int(num_lights),
        num_materials=len(materials),
        all_diffuse=all(
            m.material_type == MaterialType.DIFFUSE for m in materials
        ),
        any_uv_transform=any(m.has_uv_transform() for m in materials),
        any_normal_map=any(m.normal_texture_id >= 0 for m in materials),
        prims=prim_soa,
    )
