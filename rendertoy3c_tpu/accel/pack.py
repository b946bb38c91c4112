"""Pack a BVH8 + reordered geometry into the Pallas kernel's VMEM layout.

The traversal kernel (trace/pallas_bvh.py) wants everything scalar-readable
from VMEM rows whose minor dimension is lane-friendly:

  nodes  [N, 56] f32 : per wide node, 8 children x (lo.xyz, hi.xyz) in lanes
                       0..47, then 8 child-slot encodings as float32 in lanes
                       48..55 (exact for |id| < 2^24);
  leaves [B, 80] f32 : per leaf block, 8 triangles x (v0.xyz, e1.xyz, e2.xyz)
                       in lanes 0..71, then 8 primitive ids as float32 in
                       lanes 72..79. Blocks are fully padded: unused slots
                       hold degenerate triangles (all zeros, det == 0, never
                       hit) with prim id -1.

Leaf child slots are re-encoded as -(2 + block_index): the kernel needs only
the aligned block id, not (start, count) — padding replaces count masking.

Child-slot encoding in the float child lanes:
  >= 0 : internal child, value = wide node index
  -1   : empty slot
  <= -2: leaf, value = -(2 + block_index)

This replaces the role of OptiX's opaque GAS memory (optixAccelBuild output,
src/cuda/cuda_mesh.h:83-153) with an explicitly layouted table tuned for
VMEM residency and scalar fetches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .lbvh import BVH8, decode_leaf


class PackedBVH(NamedTuple):
    nodes: jnp.ndarray   # [N, 56] f32
    leaves: jnp.ndarray  # [B, 80] f32
    n_nodes: int
    n_blocks: int


def pack_bvh(bvh: BVH8, geom, num_faces: int) -> PackedBVH:
    """Pack (bvh, geometry-already-in-bvh-order) for the Pallas kernel.

    `geom` is the reordered GeometrySoA (key 0 is used — the kernel currently
    traces static geometry; animated scenes use the jnp backend).
    """
    child_lo = np.asarray(bvh.child_lo)  # [N, 8, 3]
    child_hi = np.asarray(bvh.child_hi)
    child = np.asarray(bvh.child)  # [N, 8]
    n_nodes = child.shape[0]

    v0 = np.asarray(geom.v0[0])
    e1 = np.asarray(geom.e1[0])
    e2 = np.asarray(geom.e2[0])

    # --- allocate aligned leaf blocks ---
    blocks: list[np.ndarray] = []
    new_child = child.astype(np.float64).copy()
    start_arr, count_arr = decode_leaf(jnp.asarray(child))
    start_arr = np.asarray(start_arr)
    count_arr = np.asarray(count_arr)
    for i in range(n_nodes):
        for j in range(8):
            c = child[i, j]
            if c <= -2:  # leaf range -> aligned block
                s, cnt = int(start_arr[i, j]), int(count_arr[i, j])
                row = np.zeros(80, np.float32)
                row[72:80] = -1.0
                for k in range(cnt):
                    f = s + k
                    row[9 * k: 9 * k + 3] = v0[f]
                    row[9 * k + 3: 9 * k + 6] = e1[f]
                    row[9 * k + 6: 9 * k + 9] = e2[f]
                    row[72 + k] = float(f)
                new_child[i, j] = -(2 + len(blocks))
                blocks.append(row)

    n_blocks = max(len(blocks), 1)
    leaves = (
        np.stack(blocks, axis=0)
        if blocks
        else np.zeros((1, 80), np.float32)
    )
    if not blocks:
        leaves[0, 72:80] = -1.0

    nodes = np.zeros((n_nodes, 56), np.float32)
    for j in range(8):
        nodes[:, 6 * j + 0: 6 * j + 3] = child_lo[:, j]
        nodes[:, 6 * j + 3: 6 * j + 6] = child_hi[:, j]
    nodes[:, 48:56] = new_child.astype(np.float32)

    assert n_nodes < (1 << 24) and len(blocks) < (1 << 24) and num_faces < (1 << 24)
    return PackedBVH(
        nodes=jnp.asarray(nodes),
        leaves=jnp.asarray(leaves),
        n_nodes=n_nodes,
        n_blocks=n_blocks,
    )
