"""Host-side mesh container (src/mesh.h:12-22).

A Mesh holds one topology with N motion keyframes of vertex/normal data —
the reference encodes motion blur as "N obj files = N keyframes of one
topology" (src/mesh.cpp:39-55). Arrays are numpy; device upload happens in
scene.build_scene.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .material import Material


@dataclass
class Mesh:
    vertices: np.ndarray  # [K, V, 3] float32 — K motion keys
    indices: np.ndarray  # [F, 3] int32
    normals: Optional[np.ndarray] = None  # [K, V, 3] float32
    texcoords: Optional[np.ndarray] = None  # [V, 2] float32
    # second texture-coordinate set (glTF TEXCOORD_1; the reference carries
    # num_texcoords=2 sets per mesh, cuda/GeometryData.h:71-79)
    texcoords1: Optional[np.ndarray] = None  # [V, 2] float32
    # per-vertex RGBA color (glTF COLOR_0, cuda/GeometryData.h:80;
    # interpolated into base color by the whitted shade, whitted.cu:157)
    colors: Optional[np.ndarray] = None  # [V, 4] float32
    material: Material = field(default_factory=Material)

    def __post_init__(self):
        self.vertices = np.asarray(self.vertices, np.float32)
        if self.vertices.ndim == 2:
            self.vertices = self.vertices[None]
        self.indices = np.asarray(self.indices, np.int32).reshape(-1, 3)
        if self.normals is not None:
            self.normals = np.asarray(self.normals, np.float32)
            if self.normals.ndim == 2:
                self.normals = self.normals[None]
        if self.texcoords is not None:
            self.texcoords = np.asarray(self.texcoords, np.float32).reshape(-1, 2)
        if self.texcoords1 is not None:
            self.texcoords1 = np.asarray(
                self.texcoords1, np.float32).reshape(-1, 2)
        if self.colors is not None:
            c = np.asarray(self.colors, np.float32)
            if c.shape[-1] == 3:  # VEC3 COLOR_0: opaque (spec default w=1)
                c = np.concatenate(
                    [c, np.ones((*c.shape[:-1], 1), np.float32)], axis=-1)
            self.colors = c.reshape(-1, 4)

    @property
    def num_keys(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_faces(self) -> int:
        return self.indices.shape[0]

    def with_computed_normals(self) -> "Mesh":
        """Fill missing normals with area-weighted smooth vertex normals."""
        if self.normals is not None:
            return self
        k, nv, _ = self.vertices.shape
        normals = np.zeros_like(self.vertices)
        for ki in range(k):
            v = self.vertices[ki]
            f = self.indices
            fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
            for c in range(3):
                np.add.at(normals[ki], f[:, c], fn)
            lens = np.linalg.norm(normals[ki], axis=-1, keepdims=True)
            normals[ki] /= np.maximum(lens, 1e-20)
        return Mesh(
            vertices=self.vertices,
            indices=self.indices,
            normals=normals,
            texcoords=self.texcoords,
            texcoords1=self.texcoords1,
            colors=self.colors,
            material=self.material,
        )
