"""Environment-map background.

The reference's miss program delegates background radiance to direct
callable #0, which ships as a constant-grey stub (src/shader/miss.cu:30,
src/shader/test.cu:3-6) — the callable slot exists precisely so a real
environment shader can be swapped in. This is that shader: a lat-long
(equirectangular) radiance map sampled by ray direction with bilinear
filtering (wrap in azimuth, clamp in polar), evaluated for every miss lane
in one batched fetch.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class EnvMap(NamedTuple):
    data: jnp.ndarray  # [H, W, 3] f32 linear radiance


def build_env_map(image: np.ndarray, scale: float = 1.0) -> EnvMap:
    """From an [H, W, 3|4] float or uint8 lat-long image."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = (img.astype(np.float32) / 255.0) ** 2.2  # sRGB-ish decode
    img = img[..., :3].astype(np.float32) * scale
    return EnvMap(data=jnp.asarray(img))


def sample_env_map(env: EnvMap, direction: jnp.ndarray) -> jnp.ndarray:
    """direction [..., 3] (unit) -> radiance [..., 3]."""
    h, w = env.data.shape[:2]
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    u = (jnp.arctan2(x, -z) / (2.0 * math.pi) + 0.5) * w - 0.5
    v = (jnp.arccos(jnp.clip(y, -1.0, 1.0)) / math.pi) * h - 0.5

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def tap(ui, vi):
        ui = jnp.mod(ui.astype(jnp.int32), w)  # wrap azimuth
        vi = jnp.clip(vi.astype(jnp.int32), 0, h - 1)  # clamp polar
        return env.data[vi, ui]

    c00 = tap(u0, v0)
    c10 = tap(u0 + 1, v0)
    c01 = tap(u0, v0 + 1)
    c11 = tap(u0 + 1, v0 + 1)
    return (
        c00 * (1 - fu) * (1 - fv)
        + c10 * fu * (1 - fv)
        + c01 * (1 - fu) * fv
        + c11 * fu * fv
    )
