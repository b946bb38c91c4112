"""Checkpoint / resume for progressive renders.

The reference's only persistent render state is the progressive accumulation
buffer plus its subframe counter (src/shader/shader_data.h:76,
src/wavefront.cpp:196-197,361) — which makes checkpointing exact: saving
(accum, subframe_index) and reloading reproduces the continued render
bit-for-bit, because every subframe's RNG streams are derived solely from
(pixel_index, subframe_index) via tea() (raygen.cu:25).

Format: a .npz with the film arrays plus a small metadata header validated on
load (resolution and RNG seed must match the resumed config).
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..film.film import Film

_FORMAT_VERSION = 1


def save_checkpoint(path: str, film: Film, cfg=None) -> None:
    meta = {"version": _FORMAT_VERSION}
    if cfg is not None:
        meta.update(width=cfg.width, height=cfg.height, seed=cfg.seed,
                    samples_per_launch=cfg.samples_per_launch)
    extra = {}
    if film.albedo is not None:
        extra["albedo"] = np.asarray(film.albedo)
        extra["normal"] = np.asarray(film.normal)
    np.savez(
        path,
        accum=np.asarray(film.accum),
        subframe_index=np.asarray(film.subframe_index),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        **extra,
    )


def load_checkpoint(path: str, cfg=None) -> Film:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
        accum = z["accum"]
        subframe = z["subframe_index"]
        albedo = z["albedo"] if "albedo" in z else None
        normal = z["normal"] if "normal" in z else None
    if cfg is not None:
        if accum.shape[:2] != (cfg.height, cfg.width):
            raise ValueError(
                f"checkpoint is {accum.shape[1]}x{accum.shape[0]}, "
                f"config is {cfg.width}x{cfg.height}"
            )
        if "seed" in meta and meta["seed"] != cfg.seed:
            raise ValueError(
                f"checkpoint seed {meta['seed']} != config seed {cfg.seed}; "
                "resuming would decorrelate the sample streams"
            )
    return Film(
        accum=jnp.asarray(accum), subframe_index=jnp.asarray(subframe),
        albedo=None if albedo is None else jnp.asarray(albedo),
        normal=None if normal is None else jnp.asarray(normal),
    )
