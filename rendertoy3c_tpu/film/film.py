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
    # Optional AOV accumulators (first-hit guide buffers for the denoiser;
    # the reference's OptiX-denoiser roadmap item needs the same inputs):
    albedo: jnp.ndarray = None  # [H, W, 3] first-hit albedo
    normal: jnp.ndarray = None  # [H, W, 3] first-hit shading normal


def film_create(height: int, width: int, aov: bool = False) -> Film:
    z = lambda: jnp.zeros((height, width, 3), jnp.float32)  # noqa: E731
    return Film(
        accum=z(),
        subframe_index=jnp.zeros((), jnp.int32),
        albedo=z() if aov else None,
        normal=z() if aov else None,
    )


def film_accumulate(film: Film, frame: jnp.ndarray, aov=None) -> Film:
    """Blend a new subframe estimate into the running average.

    Matches raygen.cu:79-85: accum = lerp(prev, cur, 1/(n+1)) for n > 0,
    accum = cur for n == 0. `aov` (optional) is an (albedo, normal) frame
    pair blended the same way into the film's AOV accumulators.
    """
    n = film.subframe_index
    a = 1.0 / (n.astype(jnp.float32) + 1.0)

    def blend(prev, cur):
        return jnp.where(n > 0, prev + (cur - prev) * a, cur)

    albedo, normal = film.albedo, film.normal
    if aov is not None and albedo is not None:
        albedo = blend(albedo, aov[0].reshape(albedo.shape))
        normal = blend(normal, aov[1].reshape(normal.shape))
    return Film(accum=blend(film.accum, frame), subframe_index=n + 1,
                albedo=albedo, normal=normal)


def film_reset(film: Film) -> Film:
    """Restart accumulation (camera moved / resized) — wavefront.cpp:196-197."""
    z = lambda x: None if x is None else jnp.zeros_like(x)  # noqa: E731
    return Film(accum=jnp.zeros_like(film.accum),
                subframe_index=jnp.zeros((), jnp.int32),
                albedo=z(film.albedo), normal=z(film.normal))
