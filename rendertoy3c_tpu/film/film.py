"""Progressive accumulation film.

The reference keeps a float4 accum buffer updated with
lerp(prev, cur, 1/(subframe+1)) and resets it by zeroing subframe_index on
camera/resize changes (src/shader/raygen.cu:75-86, src/wavefront.cpp:196-197).
Film is a pytree so it can be carried through jit with buffer donation — the
accumulator never leaves HBM between subframes.

The (accum, subframe_index) pair is also the complete checkpoint state of a
progressive render: see utils/checkpoint.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Film(NamedTuple):
    accum: jnp.ndarray  # [H, W, 3] float32 linear radiance
    subframe_index: jnp.ndarray  # scalar int32


def film_create(height: int, width: int) -> Film:
    return Film(
        accum=jnp.zeros((height, width, 3), jnp.float32),
        subframe_index=jnp.zeros((), jnp.int32),
    )


def film_accumulate(film: Film, frame: jnp.ndarray) -> Film:
    """Blend a new subframe estimate into the running average.

    Matches raygen.cu:79-85: accum = lerp(prev, cur, 1/(n+1)) for n > 0,
    accum = cur for n == 0.
    """
    n = film.subframe_index
    a = 1.0 / (n.astype(jnp.float32) + 1.0)
    blended = jnp.where(n > 0, film.accum + (frame - film.accum) * a, frame)
    return Film(accum=blended, subframe_index=n + 1)


def film_reset(film: Film) -> Film:
    """Restart accumulation (camera moved / resized) — wavefront.cpp:196-197."""
    return Film(accum=jnp.zeros_like(film.accum), subframe_index=jnp.zeros((), jnp.int32))
