"""Microbench: per-round costs for an XLA gather-round BVH walk on TPU.

Measures (on-device fori_loop repetition, CLAUDE.md rules; every timed call
gets FRESH input values — the remote axon backend appears to satisfy a
repeated (executable, args) pair without re-executing):
  1. jnp.take row-gather throughput from [N, W] f32 tables, W in 8..512
  2. while_loop round fixed overhead at wavefront sizes
  3. 32k-key sort cost (ray ordering)
Informs the node-row layout of the skip-pointer BVH walk.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 32768
REPS = 100


def timed(fn, make_args, label, bytes_per_rep=None):
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
    extra = ""
    if bytes_per_rep:
        extra = (f" ({bytes_per_rep/1e6:.1f} MB out, "
                 f"{bytes_per_rep/dt/1e9:7.1f} GB/s)")
    print(f"{label}: {dt*1e6:8.1f} us/round{extra}")
    return dt


def bench_gather(n, w):
    rng = np.random.default_rng(n * 1000 + w)

    def make_args():
        return (jnp.asarray(rng.random((n, w), np.float32)),
                jnp.asarray(rng.integers(0, n, size=(R,)).astype(np.int32)))

    @jax.jit
    def run(tab, ids):
        def body(i, acc):
            rows = jnp.take(tab, (ids + i) % n, axis=0)
            return acc + jnp.sum(rows, axis=0)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((w,), jnp.float32))

    timed(run, make_args, f"gather [{n:6d},{w:4d}] -> [{R},{w}]",
          bytes_per_rep=R * w * 4)


def bench_round_overhead(w):
    rng = np.random.default_rng(w)

    def make_args():
        return (jnp.asarray(rng.random((R, w), np.float32)),)

    @jax.jit
    def run(x):
        def cond(c):
            i, x = c
            return i < REPS

        def body(c):
            i, x = c
            return i + 1, x * 1.0000001 + 1.0

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]

    timed(run, make_args, f"while_loop [R={R}, w={w}] trivial body")


def bench_sort():
    rng = np.random.default_rng(7)

    def make_args():
        return (jnp.asarray(rng.integers(0, 1 << 30, size=(R,)).astype(np.int32)),
                jnp.arange(R, dtype=jnp.int32))

    @jax.jit
    def run(keys, vals):
        def body(i, c):
            k, v = c
            k2, v2 = jax.lax.sort(((k + i) ^ v, v), num_keys=1)
            return (k2, v2)

        return jax.lax.fori_loop(0, REPS, body, (keys, vals))

    timed(run, make_args, "sort 32k (key,val) x100")


def bench_topk(l, k):
    rng = np.random.default_rng(l + k)

    def make_args():
        return (jnp.asarray(rng.random((2048, l), np.float32)),)

    @jax.jit
    def run(x):
        def body(i, acc):
            nk, _ = jax.lax.top_k(x + acc[0, 0] * 1e-9, k)
            return acc + jnp.sum(nk)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((1, 1)))

    timed(run, make_args, f"top_k  [2048,{l:5d}] k={k:3d}")


def main():
    print("devices:", jax.devices())
    for w in (8, 16, 32, 64, 128, 144, 256, 512):
        bench_gather(16384, w)
    bench_gather(512, 128)
    bench_gather(2048, 128)
    bench_gather(65536, 128)
    for w in (8, 32, 128):
        bench_round_overhead(w)
    bench_sort()
    bench_topk(256, 16)
    bench_topk(1536, 16)
    bench_topk(1536, 24)


if __name__ == "__main__":
    main()
