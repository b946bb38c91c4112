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


# Address modes (cudaTextureAddressMode, src/cuda/cuda_texture.h:63-64, and
# glTF sampler wrapS/wrapT). The reference hardcodes Wrap for OBJ textures;
# glTF samplers choose per texture.
WRAP_REPEAT = 0
WRAP_CLAMP = 1
WRAP_MIRROR = 2

_GL_WRAP = {10497: WRAP_REPEAT, 33071: WRAP_CLAMP, 33648: WRAP_MIRROR,
            # CLAMP_TO_BORDER/legacy CLAMP: closest supported behavior
            33069: WRAP_CLAMP, 10496: WRAP_CLAMP}


def wrap_from_gl(gl_enum: int) -> int:
    """Map a GL/glTF sampler wrap enum to a WRAP_* mode (default REPEAT)."""
    return _GL_WRAP.get(gl_enum, WRAP_REPEAT)


class TextureImage(NamedTuple):
    """An atlas input with sampler state (plain ndarrays mean REPEAT)."""

    data: np.ndarray  # [h, w, 4] uint8
    wrap_s: int = WRAP_REPEAT
    wrap_t: int = WRAP_REPEAT


class TextureAtlas(NamedTuple):
    data: jnp.ndarray  # [AH, AW, 4] uint8 (RGBA, rows already v-flipped at load)
    meta: jnp.ndarray  # [T, 6] int32: (y0, x0, height, width, wrap_s, wrap_t)
    # Optional single-gather bilinear table: for each atlas texel, the RGB of
    # its 2x2 wrap-mode footprint (c00 c01 c10 c11), f32/255. TPU gathers pay
    # per-row costs, so one [N,12] gather beats four [N,3] gathers ~4x.
    quad: jnp.ndarray = None


def _empty_atlas() -> TextureAtlas:
    return TextureAtlas(
        data=jnp.zeros((1, 1, 4), jnp.uint8),
        meta=jnp.zeros((1, 6), jnp.int32).at[0, 2:4].set(1),
    )


# build the quad table only while it stays under ~48 MB
_QUAD_TABLE_MAX_TEXELS = 1 << 20


def build_texture_atlas(images: Sequence) -> TextureAtlas:
    """Shelf-pack RGBA8 images into one atlas.

    images: list of [h, w, 4] uint8 arrays (already vertically flipped to
    match the reference's stbi load convention, src/mesh.cpp:150-160), or
    TextureImage entries carrying per-texture wrap modes.
    """
    if not images:
        return _empty_atlas()
    entries = [im if isinstance(im, TextureImage) else TextureImage(im)
               for im in images]
    images = [e.data for e in entries]
    for im in images:
        assert im.dtype == np.uint8 and im.ndim == 3 and im.shape[2] == 4

    # Shelf packing: sort by height, fill rows up to a power-of-two width.
    total_area = sum(im.shape[0] * im.shape[1] for im in images)
    max_w = max(im.shape[1] for im in images)
    atlas_w = 1
    while atlas_w < max(max_w, int(np.ceil(np.sqrt(total_area)))):
        atlas_w *= 2

    order = sorted(range(len(images)), key=lambda i: -images[i].shape[0])
    meta = np.zeros((len(images), 6), np.int32)
    x = y = shelf_h = 0
    for idx in order:
        h, w = images[idx].shape[:2]
        if x + w > atlas_w:
            y += shelf_h
            x = 0
            shelf_h = 0
        meta[idx] = (y, x, h, w, entries[idx].wrap_s, entries[idx].wrap_t)
        x += w
        shelf_h = max(shelf_h, h)
    atlas_h = y + shelf_h

    data = np.zeros((atlas_h, atlas_w, 4), np.uint8)
    for idx, im in enumerate(images):
        y0, x0, h, w = meta[idx, :4]
        data[y0 : y0 + h, x0 : x0 + w] = im

    quad = None
    if atlas_h * atlas_w <= _QUAD_TABLE_MAX_TEXELS:
        # per-texel 2x2 wrap-mode footprint, respecting texture regions
        rgbf = data[..., :3].astype(np.float32) * (1.0 / 255.0)
        c01 = rgbf.copy()
        c10 = rgbf.copy()
        c11 = rgbf.copy()
        for idx, im in enumerate(images):
            y0, x0, h, w, ws, wt = meta[idx]
            sub = rgbf[y0:y0 + h, x0:x0 + w]
            # +1 neighbor index per address mode; at the far edge both CLAMP
            # and MIRROR resolve to the edge texel itself
            nx = ((np.arange(w) + 1) % w if ws == WRAP_REPEAT
                  else np.minimum(np.arange(w) + 1, w - 1))
            ny = ((np.arange(h) + 1) % h if wt == WRAP_REPEAT
                  else np.minimum(np.arange(h) + 1, h - 1))
            right = sub[:, nx]
            down = sub[ny, :]
            diag = sub[ny][:, nx]
            c01[y0:y0 + h, x0:x0 + w] = right
            c10[y0:y0 + h, x0:x0 + w] = down
            c11[y0:y0 + h, x0:x0 + w] = diag
        quad = np.concatenate([rgbf, c01, c10, c11], axis=-1)
        quad = quad.reshape(atlas_h * atlas_w, 12)
    return TextureAtlas(
        data=jnp.asarray(data), meta=jnp.asarray(meta),
        quad=None if quad is None else jnp.asarray(quad),
    )


def _wrap_footprint(c, size_i, mode):
    """Bilinear footprint along one axis under a per-lane address mode.

    c: normalized coordinate; size_i: int texture extent; mode: WRAP_* int.
    Returns (i0, i1, frac) with texel centers at (i + 0.5) / size (the CUDA
    normalized-coords convention, src/cuda/cuda_texture.h:62-74).
    """
    size_f = size_i.astype(jnp.float32)
    # MIRRORED_REPEAT folds the coordinate into [0, 1] with period 2; its
    # edge footprint then equals CLAMP's (the mirrored neighbor of an edge
    # texel is itself).
    cm = jnp.where(mode == WRAP_MIRROR,
                   1.0 - jnp.abs(jnp.mod(c, 2.0) - 1.0), c)
    repeat = mode == WRAP_REPEAT
    cc = jnp.where(repeat, cm - jnp.floor(cm), cm)
    sc = cc * size_f - 0.5
    # CLAMP_TO_EDGE pins the texel-space coordinate to [0, N-1], so the
    # footprint (and frac) degenerate smoothly onto the edge texel — this
    # also keeps the single-gather quad table consistent (its +1 neighbors
    # are baked in-range).
    sc = jnp.where(repeat, sc, jnp.clip(sc, 0.0, size_f - 1.0))
    i0f = jnp.floor(sc)
    frac = sc - i0f
    i0 = i0f.astype(jnp.int32)
    i0w = jnp.where(repeat, jnp.mod(i0, size_i), i0)
    i1w = jnp.where(repeat, jnp.mod(i0w + 1, size_i),
                    jnp.minimum(i0 + 1, size_i - 1))
    return i0w, i1w, frac


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
    m = atlas.meta[tid]  # [..., 6]
    y0, x0 = m[..., 0], m[..., 1]
    th, tw = m[..., 2], m[..., 3]
    ws, wt = m[..., 4], m[..., 5]

    iu0, iu1, fu = _wrap_footprint(u, tw, ws)
    iv0, iv1, fv = _wrap_footprint(v, th, wt)

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


def _wrap_nearest(c, size_i, mode):
    """Nearest-sample texel index along one axis under an address mode."""
    size_f = size_i.astype(jnp.float32)
    cm = jnp.where(mode == WRAP_MIRROR,
                   1.0 - jnp.abs(jnp.mod(c, 2.0) - 1.0), c)
    repeat = mode == WRAP_REPEAT
    cc = jnp.where(repeat, cm - jnp.floor(cm), cm)
    i = jnp.floor(cc * size_f).astype(jnp.int32)
    return jnp.where(repeat, jnp.mod(i, size_i),
                     jnp.clip(i, 0, size_i - 1))


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
    iu = _wrap_nearest(u, tw, m[..., 4])
    iv = _wrap_nearest(v, th, m[..., 5])
    a = atlas.data[y0 + iv, x0 + iu, 3].astype(jnp.float32) * (1.0 / 255.0)
    return jnp.where(tex_id >= 0, a, 1.0)
