"""30-bit 3D Morton codes for spatial sorting.

The TPU replacement for OptiX's opaque BVH builder input stage: triangle
centroids quantized to a 1024^3 grid, bits interleaved x/y/z. Used by the
LBVH build (host) and by per-bounce ray sorting for traversal coherence.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _expand_bits_np(v: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(np.uint32) & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton3d_np(xyz01: np.ndarray) -> np.ndarray:
    """Normalized [N,3] float coords in [0,1] -> uint32 Morton codes."""
    q = np.clip(xyz01 * 1024.0, 0, 1023).astype(np.uint32)
    return (
        (_expand_bits_np(q[:, 0]) << 2)
        | (_expand_bits_np(q[:, 1]) << 1)
        | _expand_bits_np(q[:, 2])
    )


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32) & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton3d(xyz01: jnp.ndarray) -> jnp.ndarray:
    """jnp version (device-side, e.g. for ray sorting). [.., 3] -> uint32."""
    q = jnp.clip(xyz01 * 1024.0, 0, 1023).astype(jnp.uint32)
    return (
        (_expand_bits(q[..., 0]) << 2)
        | (_expand_bits(q[..., 1]) << 1)
        | _expand_bits(q[..., 2])
    )
