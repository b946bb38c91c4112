"""Pointer-chase microbench: the REAL access pattern of a gather-round BVH
walk — each round's gather ids come from the PREVIOUS round's gathered rows
(serial dependence, nothing for XLA to collapse). REPS scaling is printed to
prove the loop actually executes.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

R = 32768


def chase(n, w, reps):
    rng = np.random.default_rng(n + w)
    tab_np = rng.random((n, w), np.float32)
    # column 0 carries the next-node pointer (random permutation-ish)
    tab_np[:, 0] = rng.integers(0, n, size=n).astype(np.float32)

    def make_args():
        return (jnp.asarray(tab_np),
                jnp.asarray(rng.integers(0, n, size=(R,)).astype(np.int32)))

    @jax.jit
    def run(tab, ids):
        def body(i, c):
            ids, acc = c
            rows = jnp.take(tab, ids, axis=0)
            nxt = rows[:, 0].astype(jnp.int32) % n
            return (nxt, acc + jnp.sum(rows[:, 1:]))

        return jax.lax.fori_loop(0, reps, body,
                                 (ids, jnp.zeros((), jnp.float32)))

    out = run(*make_args())
    jax.block_until_ready(out)
    dts = []
    for _ in range(3):
        args = make_args()
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / reps)
    dt = min(dts)
    mb = R * w * 4 / 1e6
    print(f"chase [{n:6d},{w:4d}] reps={reps:4d}: {dt*1e6:8.1f} us/round "
          f"({mb:.1f} MB out, {mb/dt/1e3:8.1f} GB/s)")


def main():
    print("devices:", jax.devices())
    for reps in (50, 100, 200):
        chase(16384, 128, reps)
    for w in (8, 16, 32, 64, 128, 256):
        chase(16384, w, 100)
    chase(512, 128, 100)      # table fits VMEM easily
    chase(65536, 128, 100)    # 32 MB table
    chase(262144, 32, 100)    # 32 MB table, thin rows
    chase(65536, 8, 100)


if __name__ == "__main__":
    main()
