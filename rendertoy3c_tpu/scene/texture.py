"""Texture atlas + batched bilinear sampling.

The reference binds one CUDA texture object per image with wrap addressing,
linear filtering, and normalized-float reads (src/cuda/cuda_texture.h:16-74).
TPUs have no texture units, so the TPU-native design packs every image into a
single RGBA8 atlas in HBM and implements wrap-mode bilinear filtering as four
batched gathers — one fused, vectorized fetch for an entire wavefront of hits
instead of per-thread texture instructions.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    data: jnp.ndarray  # [AH, AW, 4] uint8 (RGBA, rows already v-flipped at load)
    meta: jnp.ndarray  # [T, 4] int32: (y0, x0, height, width) per texture
    # Optional single-gather bilinear table: for each atlas texel, the RGB of
    # its 2x2 wrap-mode footprint (c00 c01 c10 c11), f32/255. TPU gathers pay
    # per-row costs, so one [N,12] gather beats four [N,3] gathers ~4x.
    quad: jnp.ndarray = None


def _empty_atlas() -> TextureAtlas:
    return TextureAtlas(
        data=jnp.zeros((1, 1, 4), jnp.uint8),
        meta=jnp.zeros((1, 4), jnp.int32).at[0, 2:].set(1),
    )


# build the quad table only while it stays under ~48 MB
_QUAD_TABLE_MAX_TEXELS = 1 << 20


def build_texture_atlas(images: Sequence[np.ndarray]) -> TextureAtlas:
    """Shelf-pack RGBA8 images into one atlas.

    images: list of [h, w, 4] uint8 arrays (already vertically flipped to
    match the reference's stbi load convention, src/mesh.cpp:150-160).
    """
    if not images:
        return _empty_atlas()
    for im in images:
        assert im.dtype == np.uint8 and im.ndim == 3 and im.shape[2] == 4

    # Shelf packing: sort by height, fill rows up to a power-of-two width.
    total_area = sum(im.shape[0] * im.shape[1] for im in images)
    max_w = max(im.shape[1] for im in images)
    atlas_w = 1
    while atlas_w < max(max_w, int(np.ceil(np.sqrt(total_area)))):
        atlas_w *= 2

    order = sorted(range(len(images)), key=lambda i: -images[i].shape[0])
    meta = np.zeros((len(images), 4), np.int32)
    x = y = shelf_h = 0
    for idx in order:
        h, w = images[idx].shape[:2]
        if x + w > atlas_w:
            y += shelf_h
            x = 0
            shelf_h = 0
        meta[idx] = (y, x, h, w)
        x += w
        shelf_h = max(shelf_h, h)
    atlas_h = y + shelf_h

    data = np.zeros((atlas_h, atlas_w, 4), np.uint8)
    for idx, im in enumerate(images):
        y0, x0, h, w = meta[idx]
        data[y0 : y0 + h, x0 : x0 + w] = im

    quad = None
    if atlas_h * atlas_w <= _QUAD_TABLE_MAX_TEXELS:
        # per-texel 2x2 wrap-mode footprint, respecting texture regions
        rgbf = data[..., :3].astype(np.float32) * (1.0 / 255.0)
        c01 = rgbf.copy()
        c10 = rgbf.copy()
        c11 = rgbf.copy()
        for idx, im in enumerate(images):
            y0, x0, h, w = meta[idx]
            sub = rgbf[y0:y0 + h, x0:x0 + w]
            right = np.roll(sub, -1, axis=1)
            down = np.roll(sub, -1, axis=0)
            diag = np.roll(right, -1, axis=0)
            c01[y0:y0 + h, x0:x0 + w] = right
            c10[y0:y0 + h, x0:x0 + w] = down
            c11[y0:y0 + h, x0:x0 + w] = diag
        quad = np.concatenate([rgbf, c01, c10, c11], axis=-1)
        quad = quad.reshape(atlas_h * atlas_w, 12)
    return TextureAtlas(
        data=jnp.asarray(data), meta=jnp.asarray(meta),
        quad=None if quad is None else jnp.asarray(quad),
    )


def sample_texture_bilinear(
    atlas: TextureAtlas, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Wrap-mode bilinear fetch, normalized coordinates -> linear RGB [..., 3].

    Semantics of cudaAddressModeWrap + cudaFilterModeLinear +
    cudaReadModeNormalizedFloat with normalizedCoords=1
    (src/cuda/cuda_texture.h:62-74): texel centers at (i + 0.5) / size, both
    footprint texels wrap modulo the texture extent, u8 values scaled by 1/255.

    tex_id may be any int array (values < 0 return black); u, v broadcast with
    it. Four gathers feed one fused lerp across the whole batch.
    """
    tid = jnp.maximum(tex_id, 0)
    m = atlas.meta[tid]  # [..., 4]
    y0, x0 = m[..., 0], m[..., 1]
    th, tw = m[..., 2], m[..., 3]

    fh = th.astype(jnp.float32)
    fw = tw.astype(jnp.float32)
    # Wrap normalized coords to [0, 1), then shift by half a texel.
    uu = (u - jnp.floor(u)) * fw - 0.5
    vv = (v - jnp.floor(v)) * fh - 0.5
    iu0 = jnp.floor(uu)
    iv0 = jnp.floor(vv)
    fu = uu - iu0
    fv = vv - iv0
    iu0 = jnp.mod(iu0.astype(jnp.int32), tw)
    iv0 = jnp.mod(iv0.astype(jnp.int32), th)
    iu1 = jnp.mod(iu0 + 1, tw)
    iv1 = jnp.mod(iv0 + 1, th)

    fu = fu[..., None]
    fv = fv[..., None]
    if atlas.quad is not None:
        # single-gather path: the 2x2 footprint rides in one table row
        aw = atlas.data.shape[1]
        flat = (y0 + iv0) * aw + (x0 + iu0)
        q = atlas.quad[flat]  # [..., 12]
        rgb = (
            q[..., 0:3] * (1 - fu) * (1 - fv)
            + q[..., 3:6] * fu * (1 - fv)
            + q[..., 6:9] * (1 - fu) * fv
            + q[..., 9:12] * fu * fv
        )
        return jnp.where((tex_id >= 0)[..., None], rgb, 0.0)

    def fetch(iy, ix):
        texel = atlas.data[y0 + iy, x0 + ix, :3].astype(jnp.float32)
        return texel * (1.0 / 255.0)

    c00 = fetch(iv0, iu0)
    c01 = fetch(iv0, iu1)
    c10 = fetch(iv1, iu0)
    c11 = fetch(iv1, iu1)
    rgb = (
        c00 * (1 - fu) * (1 - fv)
        + c01 * fu * (1 - fv)
        + c10 * (1 - fu) * fv
        + c11 * fu * fv
    )
    return jnp.where((tex_id >= 0)[..., None], rgb, 0.0)


def sample_texture_alpha(
    atlas: TextureAtlas, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-sample the alpha channel (cutout masks use point sampling).

    Returns alpha in [0, 1]; lanes with tex_id < 0 return 1 (opaque).
    """
    tid = jnp.maximum(tex_id, 0)
    m = atlas.meta[tid]
    y0, x0 = m[..., 0], m[..., 1]
    th, tw = m[..., 2], m[..., 3]
    uu = (u - jnp.floor(u)) * tw.astype(jnp.float32)
    vv = (v - jnp.floor(v)) * th.astype(jnp.float32)
    iu = jnp.mod(jnp.floor(uu).astype(jnp.int32), tw)
    iv = jnp.mod(jnp.floor(vv).astype(jnp.int32), th)
    a = atlas.data[y0 + iv, x0 + iu, 3].astype(jnp.float32) * (1.0 / 255.0)
    return jnp.where(tex_id >= 0, a, 1.0)
