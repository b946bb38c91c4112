"""Aux subsystem tests: debug/validation, profiling helpers, timers."""
import jax.numpy as jnp
import numpy as np
import pytest

from rendertoy3c_tpu.film.film import Film, film_create
from rendertoy3c_tpu.utils.debug import (
    RenderValidationError,
    check_film,
    validation_mode,
)
from rendertoy3c_tpu.utils.timers import PhaseTimers


def test_check_film_passes_on_clean():
    check_film(film_create(4, 4))


def test_check_film_rejects_nan():
    film = Film(
        accum=jnp.full((4, 4, 3), jnp.nan), subframe_index=jnp.zeros((), jnp.int32)
    )
    with pytest.raises(RenderValidationError, match="non-finite"):
        check_film(film)


def test_check_film_rejects_negative():
    film = Film(
        accum=jnp.full((4, 4, 3), -1.0), subframe_index=jnp.zeros((), jnp.int32)
    )
    with pytest.raises(RenderValidationError, match="negative"):
        check_film(film)


def test_validation_mode_catches_nan():
    import jax

    @jax.jit
    def bad(x):
        return x * jnp.log(x)  # 0 * -inf -> NaN

    with validation_mode():
        with pytest.raises(FloatingPointError):
            np.asarray(bad(jnp.zeros(4)))
    # restored afterwards
    assert not jax.config.jax_debug_nans


def test_phase_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert "a" in s and "(2x)" in s and "b" in s
