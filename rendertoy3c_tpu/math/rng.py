"""Per-lane counter RNG streams, bit-exact with the reference's tea/LCG.

The reference threads one uint32 LCG state per pixel through the whole path
(cuda/random.h:31-77: tea<N> seeding, lcg, rnd). On TPU every function here is
vectorized: `state` is a uint32 array of shape [R] (one lane per ray) and each
call advances all lanes at once on the VPU. Keeping the exact same generator
lets golden tests reproduce the reference's sample sequence lane-for-lane.

All functions are functional (state in, state out) — no hidden mutation, so
they compose with jit/scan/while_loop.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: module-level jnp constants would materialize
# device arrays at import time and initialize the XLA backend before
# jax.distributed.initialize can run (parallel/multihost.py)
_LCG_A = np.uint32(1664525)
_LCG_C = np.uint32(1013904223)
_LCG_MASK = np.uint32(0x00FFFFFF)
_INV_2_24 = 1.0 / float(0x01000000)


def tea(val0, val1, rounds: int = 4) -> jnp.ndarray:
    """TEA hash of two uint32s -> uint32 seed (cuda/random.h:31-46).

    Used as tea(pixel_index, subframe_index) to derive per-pixel streams.
    The round count is a static Python int (unrolled at trace time).
    """
    v0 = jnp.asarray(val0).astype(jnp.uint32)
    v1 = jnp.asarray(val1).astype(jnp.uint32)
    v0, v1 = jnp.broadcast_arrays(v0, v1)
    s0 = jnp.uint32(0)
    for _ in range(rounds):
        s0 = s0 + jnp.uint32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s0)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s0)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0


def lcg(state: jnp.ndarray):
    """One LCG step; returns (new_state, 24-bit output) (cuda/random.h:49-55)."""
    new = _LCG_A * state + _LCG_C
    return new, new & _LCG_MASK


def rnd(state: jnp.ndarray):
    """Uniform float32 in [0, 1); returns (new_state, u) (cuda/random.h:64-67)."""
    new, bits = lcg(state)
    return new, bits.astype(jnp.float32) * jnp.float32(_INV_2_24)


def rnd2(state: jnp.ndarray):
    """Two sequential uniforms; returns (new_state, u1, u2)."""
    state, u1 = rnd(state)
    state, u2 = rnd(state)
    return state, u1, u2


def rnd_masked(state: jnp.ndarray, mask: jnp.ndarray):
    """Draw a uniform but only advance lanes where mask is True.

    Reproduces data-dependent draw counts (e.g. the reference only draws the
    shadow-ray time when nDl > 0) without divergent control flow.
    """
    new, u = rnd(state)
    return jnp.where(mask, new, state), u


def rot_seed(seed, frame):
    """cuda/random.h:74-77."""
    return jnp.asarray(seed, jnp.uint32) ^ jnp.asarray(frame, jnp.uint32)
