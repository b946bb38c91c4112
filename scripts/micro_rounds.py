"""Marginal per-round costs on the real chip, by reps-differencing.

The axon tunnel adds ~30 ms fixed per dispatch and block_until_ready does
not await execution (measure with a host fetch of a scalar result); the
marginal cost of one loop round = (T(reps_hi) - T(reps_lo)) / (hi - lo).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 32768
LO, HI = 100, 300


def marginal(make_run, make_args, label, bytes_per_round=None):
    ts = {}
    for reps in (LO, HI):
        run = make_run(reps)
        args = make_args()
        float(jnp.sum(run(*args)))  # warm + fetch
        best = 1e9
        for _ in range(3):
            args = make_args()
            jax.block_until_ready(args)
            t0 = time.perf_counter()
            float(jnp.sum(run(*args)))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    dt = (ts[HI] - ts[LO]) / (HI - LO)
    extra = ""
    if bytes_per_round:
        extra = f" ({bytes_per_round/1e6:5.1f} MB, {bytes_per_round/max(dt,1e-9)/1e9:7.1f} GB/s)"
    print(f"{label}: {dt*1e6:8.1f} us/round{extra}", flush=True)
    return dt


def gather_chase(n, w, r=R):
    rng = np.random.default_rng(n + w + r)
    tab_np = rng.random((n, w), np.float32)
    tab_np[:, 0] = rng.integers(0, n, size=n).astype(np.float32)

    def make_args():
        return (jnp.asarray(tab_np),
                jnp.asarray(rng.integers(0, n, size=(r,)).astype(np.int32)))

    def make_run(reps):
        @jax.jit
        def run(tab, ids):
            def body(i, c):
                ids, acc = c
                rows = jnp.take(tab, ids, axis=0)
                nxt = rows[:, 0].astype(jnp.int32) % n
                return (nxt, acc + jnp.sum(rows[:, 1:]))

            return jax.lax.fori_loop(0, reps, body,
                                     (ids, jnp.zeros((), jnp.float32)))[1]

        return run

    marginal(make_run, make_args, f"chase [{n:6d},{w:4d}] R={r:5d}",
             bytes_per_round=r * w * 4)


def trivial_round(w, r=R):
    rng = np.random.default_rng(w)

    def make_args():
        return (jnp.asarray(rng.random((r, w), np.float32)),)

    def make_run(reps):
        @jax.jit
        def run(x):
            def body(i, x):
                return x * 1.0000001 + 1e-9
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        return run

    marginal(make_run, make_args, f"trivial [R={r:5d}, w={w:3d}] body")


def sort_round(r=R):
    rng = np.random.default_rng(3)

    def make_args():
        return (jnp.asarray(rng.integers(0, 1 << 30, (r,)).astype(np.int32)),)

    def make_run(reps):
        @jax.jit
        def run(k):
            def body(i, c):
                k2, v2 = jax.lax.sort((c[0] ^ c[1], c[1]), num_keys=1)
                return (k2, v2)

            out = jax.lax.fori_loop(
                0, reps, body, (k, jnp.arange(r, dtype=jnp.int32)))
            return out[0] + out[1]

        return run

    marginal(make_run, make_args, f"sort32 [R={r:5d}] key+perm")


def main():
    print("devices:", jax.devices(), flush=True)
    for w in (8, 16, 32, 64, 128, 256):
        gather_chase(16384, w)
    gather_chase(512, 128)
    gather_chase(4096, 128)
    gather_chase(65536, 128)
    gather_chase(16384, 128, r=8192)
    gather_chase(16384, 128, r=2048)
    gather_chase(16384, 32, r=2048)
    for w in (8, 128):
        trivial_round(w)
    sort_round()


if __name__ == "__main__":
    main()
