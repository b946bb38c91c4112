"""Parallel jit warm-up.

Parity with the reference's multithreaded OptiX module compilation pool
(lib/CompileWithTasks.h:57-167): where OptiX splits module compilation into
tasks executed by a host thread pool, JAX's analog is AOT-lowering+compiling
several jitted entry points concurrently so a renderer's first frame doesn't
serialize every compile. XLA compilation releases the GIL, so plain threads
give real overlap; compiled executables land in jit caches as usual.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Sequence, Tuple

import jax


def warmup_parallel(entries: Iterable[Tuple[Callable, Sequence]],
                    max_workers: int = 4):
    """Compile [(fn, example_args), ...] concurrently.

    Each fn is jitted (if not already) and AOT-compiled against its example
    arguments. Returns the list of compiled executables in input order.
    """
    entries = list(entries)

    def compile_one(item):
        fn, args = item
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        return jitted.lower(*args).compile()

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(compile_one, entries))
