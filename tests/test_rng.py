"""RNG bit-exactness vs the reference formulas (cuda/random.h:31-77)."""
import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.math import rng
import oracle


def test_tea_matches_scalar_reference():
    for v0, v1 in [(0, 0), (1, 0), (123456, 789), (0xFFFFFFFF, 0xABCDEF01)]:
        expected = oracle.tea(v0, v1)
        got = int(rng.tea(jnp.uint32(v0), jnp.uint32(v1)))
        assert got == expected, (v0, v1)


def test_tea_vectorized():
    v0 = np.arange(1000, dtype=np.uint32)
    v1 = np.full(1000, 7, np.uint32)
    got = np.asarray(rng.tea(jnp.asarray(v0), jnp.asarray(v1)))
    expected = np.array([oracle.tea(int(a), 7) for a in v0], np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_lcg_rnd_sequence_bit_exact():
    state = jnp.asarray([oracle.tea(42, 0)], jnp.uint32)
    ref = oracle.Lcg(oracle.tea(42, 0))
    for _ in range(100):
        state, u = rng.rnd(state)
        expected = ref.rnd()
        assert float(u[0]) == float(expected)
        assert int(state[0]) == ref.state


def test_rnd_range():
    state = rng.tea(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(3))
    for _ in range(8):
        state, u = rng.rnd(state)
        u = np.asarray(u)
        assert (u >= 0).all() and (u < 1).all()


def test_rnd_masked_advances_only_masked_lanes():
    state = jnp.asarray([1, 2, 3, 4], jnp.uint32)
    mask = jnp.asarray([True, False, True, False])
    new_state, _ = rng.rnd_masked(state, mask)
    full, _ = rng.rnd(state)
    np.testing.assert_array_equal(
        np.asarray(new_state), np.where(np.asarray(mask), full, state)
    )


def test_rot_seed():
    assert int(rng.rot_seed(jnp.uint32(0xDEAD), jnp.uint32(0xBEEF))) == 0xDEAD ^ 0xBEEF
