"""Sweep leafwalk (SEG, LEAF, k_wave) on the 49k scene, bounce wavefront."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/rendertoy3c_jax")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from exp_trav import build_big_scene, make_wavefronts, make_run, time_run
import rendertoy3c_tpu.trace.leafwalk as lw


def main():
    scene = build_big_scene()
    waves = make_wavefronts(scene)

    for seg in (2048, 4096, 8192):
        for leaf in (64, 128, 256):
            for k_wave in (8, 16):
                lw.SEG = seg
                tab = lw.build_leaf_table(scene.geom, leaf=leaf)
                tab = tab._replace(num_faces=scene.num_faces)

                def closest(o, d, tab=tab, k=k_wave):
                    return lw.trace_closest_leafwalk(tab, o, d, 1e-3, 1e4,
                                                     k_wave=k)

                run = make_run(closest)
                for wname in ("bounce_sorted", "primary"):
                    o, d = waves[wname]
                    time_run(f"SEG={seg} LEAF={leaf} k={k_wave} {wname}",
                             run, o, d)


if __name__ == "__main__":
    main()
