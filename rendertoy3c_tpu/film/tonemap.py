"""Tonemapping and quantization (cuda/helpers.h:35-66, src/gui/display.cpp ACES).

In the reference the ACES curve lives in a GLSL fragment shader and the
sRGB+quantize path in device helpers; here both are jit-able jnp ops applied
to the whole framebuffer at once (fused by XLA into the accumulation step).
"""
from __future__ import annotations

import jax.numpy as jnp


def aces_tonemap(x: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz 2015 ACES filmic curve (src/gui/display.cpp fragment shader)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB transfer, matching cuda/helpers.h:35-43."""
    powed = jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.4)
    return jnp.where(c < 0.0031308, 12.92 * c, 1.055 * powed - 0.055)


def quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """clamp to [0,1] then min(uint(x*256), 255) — cuda/helpers.h:50-55."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.minimum((x * 256.0).astype(jnp.uint32), 255).astype(jnp.uint8)


def make_color(c: jnp.ndarray, alpha: bool = True) -> jnp.ndarray:
    """Linear RGB [... ,3] -> sRGB u8 [..., 3|4] (cuda/helpers.h:57-66)."""
    srgb = to_srgb(jnp.clip(c, 0.0, 1.0))
    rgb = quantize_u8(srgb)
    if not alpha:
        return rgb
    a = jnp.full(rgb.shape[:-1] + (1,), 255, dtype=jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)
