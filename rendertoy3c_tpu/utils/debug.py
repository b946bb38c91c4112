"""Debug / validation instrumentation.

The reference's closest analogs: OptiX validation mode + full device debug
info under DEBUG builds (src/cuda/optix_context.h:49-52, 239-242) and the
CHECK macro family (src/util/exception.h). TPU equivalents:

  * validation_mode(): context manager enabling jax_debug_nans +
    jax_disable_most_optimizations-style strictness for a block of code —
    any NaN produced by a jitted render step raises at the op that made it;
  * check_film(): explicit post-step asserts on the accumulator
    (finite, non-negative) with actionable errors;
  * interpret_kernels(): run all Pallas kernels in interpreter mode inside
    the context (pltpu.force_tpu_interpret_mode) for kernel debugging.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np


@contextmanager
def validation_mode():
    """Raise on NaNs produced inside jitted code (OptiX validation-mode
    analog). Recompiles affected functions; use for debugging only."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextmanager
def interpret_kernels():
    """Force Pallas kernels through the interpreter (kernel debugging)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


class RenderValidationError(RuntimeError):
    pass


def check_film(film, where: str = "render step") -> None:
    """Assert the film accumulator is finite and non-negative."""
    acc = np.asarray(film.accum)
    if not np.isfinite(acc).all():
        bad = int((~np.isfinite(acc)).sum())
        raise RenderValidationError(
            f"{where}: {bad} non-finite film texels (NaN/Inf) — enable "
            "validation_mode() to locate the producing op"
        )
    if (acc < 0).any():
        raise RenderValidationError(
            f"{where}: negative radiance in the film accumulator"
        )
