"""Is the walk-round row gather traffic-bound or descriptor-bound?

Compares [N, 128] f32 vs bf16 row gathers (with f32 upcast after the
take, as the walk arithmetic would need) at walkpool wavefront widths.
If bf16 halves the round, directory rows should go bf16 (ROADMAP item);
if the time is flat, the gather is descriptor-rate bound and the idea is
dead.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 200


def timed(fn, make_args, label, bytes_per_rep):
    out = fn(*make_args())  # compile + warm
    jax.block_until_ready(out)
    dts = []
    for _ in range(3):
        args = make_args()
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / REPS)
    dt = min(dts)
    print(f"{label}: {dt*1e6:8.1f} us/round  "
          f"({bytes_per_rep/1e6:6.1f} MB, {bytes_per_rep/dt/1e9:7.1f} GB/s)")
    return dt


def bench(n, w, dtype):
    rng = np.random.default_rng(n + w)

    def make_args():
        return (jnp.asarray(rng.random((n, 128), np.float32).astype(dtype)),
                jnp.asarray(rng.integers(0, n, size=(w,)).astype(np.int32)))

    @jax.jit
    def run(tab, ids):
        def body(i, acc):
            rows = jnp.take(tab, (ids + i) % n, axis=0).astype(jnp.float32)
            return acc + jnp.sum(rows, axis=0)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((128,), jnp.float32))

    nbytes = w * 128 * (2 if dtype == np.dtype(jnp.bfloat16) else 4)
    timed(run, make_args,
          f"take [{n:6d},128] {str(np.dtype(dtype)):8s} W={w:6d}", nbytes)


def main():
    for n in (3700, 15000, 77000):
        for w in (8192, 16384, 32768):
            bench(n, w, np.float32)
            bench(n, w, jnp.bfloat16)
        print()


if __name__ == "__main__":
    main()
