"""Edge-aware a-trous wavelet denoiser.

"Realtime denoiser" is an unimplemented roadmap item in the reference
(README.md:20). This is a TPU-friendly take: N iterations of the 5x5 a-trous
B3-spline filter with exponentially growing taps, with edge-stopping weights
from color difference (and optional normal/position guide buffers, the
SVGF-style joint filter). Entirely jnp convolutions + elementwise ops — jits
into a handful of fused kernels and runs per displayed frame.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# B3-spline 5-tap kernel (python floats: baked as compile-time constants)
_H = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]


def _shift2d(img, dy, dx):
    """Edge-clamped 2D shift of [H, W, C]."""
    img = jnp.roll(img, (dy, dx), axis=(0, 1))
    h, w = img.shape[:2]
    if dy > 0:
        img = img.at[:dy].set(img[dy])
    elif dy < 0:
        img = img.at[dy:].set(img[dy - 1])
    if dx > 0:
        img = img.at[:, :dx].set(img[:, dx:dx + 1])
    elif dx < 0:
        img = img.at[:, dx:].set(img[:, dx - 1:dx])
    return img


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    rgb: jnp.ndarray,
    normal: jnp.ndarray | None = None,
    position: jnp.ndarray | None = None,
    iterations: int = 3,
    sigma_color: float = 0.25,
    sigma_normal: float = 0.2,
    sigma_position: float = 0.5,
) -> jnp.ndarray:
    """Denoise a linear-radiance image [H, W, 3].

    normal / position are optional [H, W, 3] guide buffers; when present
    they contribute SVGF-style edge-stopping terms.
    """
    out = rgb
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                k = float(_H[iy + 2] * _H[ix + 2])
                tap = _shift2d(out, iy * step, ix * step)
                dc = tap - out
                w = jnp.exp(
                    -jnp.sum(dc * dc, axis=-1, keepdims=True)
                    / (2.0 * sigma_color * sigma_color)
                )
                if normal is not None:
                    dn = _shift2d(normal, iy * step, ix * step) - normal
                    w = w * jnp.exp(
                        -jnp.sum(dn * dn, axis=-1, keepdims=True)
                        / (2.0 * sigma_normal * sigma_normal)
                    )
                if position is not None:
                    dp = _shift2d(position, iy * step, ix * step) - position
                    w = w * jnp.exp(
                        -jnp.sum(dp * dp, axis=-1, keepdims=True)
                        / (2.0 * sigma_position * sigma_position)
                    )
                acc = acc + k * w * tap
                wsum = wsum + k * w
        out = acc / jnp.maximum(wsum, 1e-8)
    return out
