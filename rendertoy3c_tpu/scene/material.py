"""Material model (src/material.h:7-38).

Host side: a `Material` dataclass mirroring the reference's per-mesh material.
Device side: a `MaterialTable` SoA pytree — the TPU-native replacement for the
reference's per-mesh SBT hitgroup records (src/cuda/cuda_scene.h:60-88): where
OptiX dispatches shading through per-instance SBT records, we gather from flat
material arrays by per-face material id inside one fused shading kernel.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class MaterialType(enum.IntEnum):
    DIFFUSE = 0
    SPECULAR = 1
    FRESNEL_TRANSMISSIVE = 2
    PRINCIPLED = 3


@dataclass
class Material:
    """Host-side material description (defaults match src/material.h:15-38)."""

    material_type: MaterialType = MaterialType.DIFFUSE
    diffuse: tuple = (1.0, 1.0, 1.0)
    diffuse_texture_id: int = -1
    emissive: tuple = (0.0, 0.0, 0.0)
    emissive_texture_id: int = -1
    roughness: float = 0.5
    roughness_texture_id: int = -1
    anisotropy: float = 0.0
    ior: float = 1.333
    transmittance: float = 0.0
    # Glass shadow attenuation (cuda/MaterialData.h:107 float3
    # shadow_attenuation; scalar grey here like `transmittance`). Shadow
    # probes through FRESNEL_TRANSMISSIVE surfaces multiply visibility by
    # 1 - fresnel_schlick(|N.D|, 5, 1 - shadow_attenuation, 1)
    # (cuda/shading.cu:340). The reference ships no host initializer for
    # the whitted glass records; 0.4 is the classic OptiX sample value.
    shadow_attenuation: float = 0.4
    normal_texture_id: int = -1
    # Principled-BSDF extras (reference roadmap item, README.md:17)
    metallic: float = 0.0
    specular_tint: float = 0.0
    sheen: float = 0.0
    clearcoat: float = 0.0
    # alpha handling (cuda/MaterialData.h alpha modes / glTF alphaMode):
    # 'OPAQUE', 'MASK' (cutout by base-color-texture alpha * alpha factor)
    # or 'BLEND' (alpha-composited continuation rays + fractional shadow
    # attenuation, whitted.cu:266-287 / 121-133)
    alpha_mode: str = "OPAQUE"
    alpha_cutoff: float = 0.5
    alpha: float = 1.0
    # texture-coordinate transform (cuda/MaterialData.h texture desc
    # offset/rotation/scale; glTF KHR_texture_transform):
    # uv' = offset + R(rotation) @ (scale * uv)
    tex_offset: tuple = (0.0, 0.0)
    tex_rotation: float = 0.0
    tex_scale: tuple = (1.0, 1.0)
    # procedural checker (cuda/MaterialData.h:86-94 CheckerPhong /
    # cuda/shading.cu:169-205 __closesthit__checker_radiance): setting
    # checker_color2 enables the pattern — the shaded base color flips
    # between `diffuse` (check 1) and `checker_color2` (check 0) by the
    # parity of floor(uv * checker_inv_size); checker_roughness2, when set,
    # flips roughness too (the Ks/phong_exp pair's role under GGX).
    checker_color2: tuple | None = None
    checker_roughness2: float | None = None
    checker_inv_size: tuple = (1.0, 1.0)
    # per-texture texcoord-set index (cuda/MaterialData.h:68 Texture.texcoord
    # selecting among GeometryData's num_texcoords=2 sets; indices >= 2 clamp
    # to 0 like sutil/Scene.cpp:254-257). Order: diffuse (base color),
    # metallic-roughness, emissive, normal.
    diffuse_tex_uv: int = 0
    roughness_tex_uv: int = 0
    emissive_tex_uv: int = 0
    normal_tex_uv: int = 0

    def tex_uv_row(self):
        """Clamped (diffuse, roughness, emissive, normal) UV-set indices."""
        def clamp(i):
            return i if i in (0, 1) else 0
        return (clamp(self.diffuse_tex_uv), clamp(self.roughness_tex_uv),
                clamp(self.emissive_tex_uv), clamp(self.normal_tex_uv))

    def uv_transform_row(self):
        """Packed (m00, m01, m10, m11, ox, oy) row for the device table."""
        import math as _m

        c, sn = _m.cos(self.tex_rotation), _m.sin(self.tex_rotation)
        sx, sy = self.tex_scale
        return (c * sx, -sn * sy, sn * sx, c * sy,
                self.tex_offset[0], self.tex_offset[1])

    def has_uv_transform(self) -> bool:
        return (self.tex_offset != (0.0, 0.0) or self.tex_rotation != 0.0
                or self.tex_scale != (1.0, 1.0))


class MaterialTable(NamedTuple):
    """Device SoA: one row per material, gathered by face material id."""

    mtype: jnp.ndarray  # [M] int32
    diffuse: jnp.ndarray  # [M, 3] f32
    emission: jnp.ndarray  # [M, 3] f32
    roughness: jnp.ndarray  # [M] f32
    metallic: jnp.ndarray  # [M] f32
    ior: jnp.ndarray  # [M] f32
    transmittance: jnp.ndarray  # [M] f32
    shadow_att: jnp.ndarray  # [M] f32 glass shadow attenuation
    anisotropy: jnp.ndarray  # [M] f32
    sheen: jnp.ndarray  # [M] f32
    clearcoat: jnp.ndarray  # [M] f32
    diffuse_tex: jnp.ndarray  # [M] int32, -1 = none
    emissive_tex: jnp.ndarray  # [M] int32
    roughness_tex: jnp.ndarray  # [M] int32
    normal_tex: jnp.ndarray  # [M] int32
    uv_xform: jnp.ndarray  # [M, 6] f32 (m00 m01 m10 m11 ox oy)
    alpha_mask: jnp.ndarray  # [M] bool (alpha_mode == MASK)
    alpha_blend: jnp.ndarray  # [M] bool (alpha_mode == BLEND)
    alpha_cutoff: jnp.ndarray  # [M] f32
    alpha: jnp.ndarray  # [M] f32 alpha factor
    checker: jnp.ndarray  # [M] bool (procedural checker enabled)
    checker_color2: jnp.ndarray  # [M, 3] f32 (check-0 diffuse)
    checker_rough2: jnp.ndarray  # [M] f32 (check-0 roughness)
    checker_inv: jnp.ndarray  # [M, 2] f32 inv_checker_size
    # [M, 4] i32 per-texture UV-set index (diffuse, roughness, emissive,
    # normal) — 0 or 1 into the geometry's two texcoord sets
    tex_uv: jnp.ndarray


def build_material_table(materials: Sequence[Material]) -> MaterialTable:
    if not materials:
        materials = [Material()]
    f32 = lambda xs: jnp.asarray(np.asarray(xs, np.float32))
    i32 = lambda xs: jnp.asarray(np.asarray(xs, np.int32))
    return MaterialTable(
        mtype=i32([int(m.material_type) for m in materials]),
        diffuse=f32([m.diffuse for m in materials]),
        emission=f32([m.emissive for m in materials]),
        roughness=f32([m.roughness for m in materials]),
        metallic=f32([m.metallic for m in materials]),
        ior=f32([m.ior for m in materials]),
        transmittance=f32([m.transmittance for m in materials]),
        shadow_att=f32([m.shadow_attenuation for m in materials]),
        anisotropy=f32([m.anisotropy for m in materials]),
        sheen=f32([m.sheen for m in materials]),
        clearcoat=f32([m.clearcoat for m in materials]),
        diffuse_tex=i32([m.diffuse_texture_id for m in materials]),
        emissive_tex=i32([m.emissive_texture_id for m in materials]),
        roughness_tex=i32([m.roughness_texture_id for m in materials]),
        normal_tex=i32([m.normal_texture_id for m in materials]),
        uv_xform=f32([m.uv_transform_row() for m in materials]),
        alpha_mask=jnp.asarray(
            np.asarray([m.alpha_mode == "MASK" for m in materials], bool)
        ),
        alpha_blend=jnp.asarray(
            np.asarray([m.alpha_mode == "BLEND" for m in materials], bool)
        ),
        alpha_cutoff=f32([m.alpha_cutoff for m in materials]),
        alpha=f32([m.alpha for m in materials]),
        checker=jnp.asarray(
            np.asarray([m.checker_color2 is not None for m in materials],
                       bool)
        ),
        checker_color2=f32([
            m.checker_color2 if m.checker_color2 is not None else m.diffuse
            for m in materials
        ]),
        checker_rough2=f32([
            m.checker_roughness2 if m.checker_roughness2 is not None
            else m.roughness for m in materials
        ]),
        checker_inv=f32([m.checker_inv_size for m in materials]),
        tex_uv=i32([m.tex_uv_row() for m in materials]),
    )


def any_uv_transform(materials) -> bool:
    return any(m.has_uv_transform() for m in materials)
