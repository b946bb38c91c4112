"""Two-level (instance -> mesh) fused Pallas tracing kernels.

The TPU-native equivalent of OptiX IAS traversal (cuda_accel.h:92-150 +
instance transform stage) built on the dense MT kernel (pallas_mt.py): the
instance loop is unrolled at compile time (instance counts are static and
modest); per instance the kernel

  1. slab-tests the ray tile against the instance's world AABB and skips the
     whole instance when no ray in the tile can hit it (tile-granular TLAS
     culling — the vector-machine replacement for per-ray BVH descent);
  2. transforms the ray tile into object space with scalar reads of the
     inverse instance matrix (t stays world-parametric: the object-space
     direction is left unnormalized);
  3. sweeps the instance's mesh triangle tiles with the shared
     Moller-Trumbore column test, tracking (t, prim, u, v, instance).

Static scenes only (instance matrix motion takes the jnp path,
trace/instanced.py — per-ray matrix inversion is better expressed at the XLA
level).

Instance table layout [I, 20] f32 (scalar-read in-kernel):
  0:12  world->object affine, row-major [3,4]
  12:15 world AABB lo      15:18 world AABB hi      18:20 pad
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.instanced import InstancedScene
from .intersect import Hit
from .pallas_mt import RAY_TILE, TRI_TILE, _BIG, _mt_test_cols, _pack_rays


def build_instanced_soup(scene: InstancedScene):
    """Object-space tri soup [F/CT, 9, CT] + per-mesh tile ranges +
    instance table [I, 20]."""
    v0 = np.asarray(scene.geom.v0[0])
    e1 = np.asarray(scene.geom.e1[0])
    e2 = np.asarray(scene.geom.e2[0])
    f = v0.shape[0]
    assert f % TRI_TILE == 0, "mesh ranges are FACE_ALIGN-padded"
    soup = np.zeros((9, f), np.float32)
    soup[0:3] = v0.T
    soup[3:6] = e1.T
    soup[6:9] = e2.T
    tiled = soup.reshape(9, f // TRI_TILE, TRI_TILE).transpose(1, 0, 2)

    inst = scene.instances
    n_inst = scene.num_instances
    table = np.zeros((n_inst, 20), np.float32)
    table[:, 0:12] = np.asarray(inst.minv)[:, 0].reshape(n_inst, 12)
    table[:, 12:15] = np.asarray(inst.aabb_lo)
    table[:, 15:18] = np.asarray(inst.aabb_hi)

    tile_ranges = tuple(
        (start // TRI_TILE, cnt // TRI_TILE) for start, cnt in scene.mesh_ranges
    )
    return (
        jnp.asarray(np.ascontiguousarray(tiled)),
        jnp.asarray(table),
        tile_ranges,
    )


def _instance_sweep(kern_update, tcur_fn, rays_ref, tris_ref, inst_ref,
                    instance_mesh, tile_ranges, state):
    """Shared instance loop: state is updated per surviving triangle tile.

    tcur_fn(state) -> [RT,1] current upper t bound (best-so-far for closest,
    the ray tmax for occlusion)."""
    ox, oy, oz = (rays_ref[:, c:c + 1] for c in (0, 1, 2))
    dx, dy, dz = (rays_ref[:, c:c + 1] for c in (3, 4, 5))
    tmin = rays_ref[:, 6:7]

    big = jnp.float32(_BIG)
    inv_dx = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, big)
    inv_dy = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, big)
    inv_dz = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, big)

    for i, mesh_i in enumerate(instance_mesh):
        def e(c, _i=i):
            return inst_ref[_i, c]

        # --- tile-level instance AABB cull (world space) ---
        t0x = (e(12) - ox) * inv_dx
        t1x = (e(15) - ox) * inv_dx
        t0y = (e(13) - oy) * inv_dy
        t1y = (e(16) - oy) * inv_dy
        t0z = (e(14) - oz) * inv_dz
        t1z = (e(17) - oz) * inv_dz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        tcur = tcur_fn(state)  # [RT,1] current best t (or tmax)
        hit_box = (tn <= tf) & (tf >= tmin) & (tn <= tcur)
        any_box = jnp.max(hit_box.astype(jnp.float32))

        start_tile, n_tiles = tile_ranges[mesh_i]

        # object-space ray columns via scalar matrix reads
        o2x = e(0) * ox + e(1) * oy + e(2) * oz + e(3)
        o2y = e(4) * ox + e(5) * oy + e(6) * oz + e(7)
        o2z = e(8) * ox + e(9) * oy + e(10) * oz + e(11)
        d2x = e(0) * dx + e(1) * dy + e(2) * dz
        d2y = e(4) * dx + e(5) * dy + e(6) * dz
        d2z = e(8) * dx + e(9) * dy + e(10) * dz

        def tile_body(k, st):
            cols = (o2x, o2y, o2z, d2x, d2y, d2z, tmin, tcur_fn(st))
            tri_tile = tris_ref[start_tile + k]
            prim_base = (start_tile + k) * TRI_TILE
            return kern_update(st, cols, tri_tile,
                               jnp.int32(prim_base), i)

        state = jax.lax.fori_loop(
            0,
            jnp.where(any_box > 0.0, n_tiles, 0),
            tile_body,
            state,
        )
    return state


def _closest_update(st, cols, tri_tile, prim_base, inst_i):
    best_t, best_prim, best_u, best_v, best_inst = st
    t, u, v, hit, prim_f = _mt_test_cols(cols, tri_tile, prim_base)
    t = jnp.where(hit, t, _BIG)
    t_c = jnp.min(t, axis=1, keepdims=True)
    at_min = t <= t_c
    prim_c = jnp.min(jnp.where(at_min, prim_f, _BIG), axis=1, keepdims=True)
    one = at_min & (prim_f == prim_c)
    u_c = jnp.sum(jnp.where(one, u, 0.0), axis=1, keepdims=True)
    v_c = jnp.sum(jnp.where(one, v, 0.0), axis=1, keepdims=True)
    better = t_c < best_t
    return (
        jnp.where(better, t_c, best_t),
        jnp.where(better, prim_c, best_prim),
        jnp.where(better, u_c, best_u),
        jnp.where(better, v_c, best_v),
        jnp.where(better, jnp.full_like(best_inst, float(inst_i)), best_inst),
    )


def _any_update(st, cols, tri_tile, prim_base, inst_i):
    (occ,) = st
    _, _, _, hit, _ = _mt_test_cols(cols, tri_tile, prim_base)
    return (jnp.maximum(occ, jnp.max(hit.astype(jnp.float32), axis=1,
                                     keepdims=True)),)


def _make_kernel(instance_mesh, tile_ranges, any_hit: bool):
    def kernel(count_ref, rays_ref, tris_ref, inst_ref, out_ref):
        i = pl.program_id(0)
        rt = rays_ref.shape[0]
        live = i * RAY_TILE < count_ref[0]

        if any_hit:
            state = (jnp.zeros((rt, 1), jnp.float32),)
        else:
            state = (
                rays_ref[:, 7:8],
                jnp.full((rt, 1), -1.0, jnp.float32),
                jnp.zeros((rt, 1), jnp.float32),
                jnp.zeros((rt, 1), jnp.float32),
                jnp.full((rt, 1), -1.0, jnp.float32),
            )

        tmax_col = rays_ref[:, 7:8]
        tcur_fn = (lambda st: tmax_col) if any_hit else (lambda st: st[0])

        def run(st):
            return _instance_sweep(
                _any_update if any_hit else _closest_update,
                tcur_fn, rays_ref, tris_ref, inst_ref,
                instance_mesh, tile_ranges, st,
            )

        state = jax.lax.cond(live, run, lambda st: st, state)

        if any_hit:
            out_ref[:, 0:1] = state[0]
            out_ref[:, 1:8] = jnp.zeros((rt, 7), jnp.float32)
        else:
            out_ref[:, 0:1] = state[0]
            out_ref[:, 1:2] = state[1]
            out_ref[:, 2:3] = state[2]
            out_ref[:, 3:4] = state[3]
            out_ref[:, 4:5] = state[4]
            out_ref[:, 5:8] = jnp.zeros((rt, 3), jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("instance_mesh", "tile_ranges", "any_hit",
                              "interpret"),
)
def _trace_instanced(tris, inst_table, o, d, tmin, tmax, *, instance_mesh,
                     tile_ranges, any_hit, count=None, interpret=False):
    rays, r, r_pad = _pack_rays(o, d, tmin, tmax)
    if count is None:
        count = r
    count = jnp.asarray(count, jnp.int32).reshape(1)
    kernel = _make_kernel(instance_mesh, tile_ranges, any_hit)
    f_tiles = tris.shape[0]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_pad // RAY_TILE,),
            in_specs=[
                pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f_tiles, 9, TRI_TILE), lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((inst_table.shape[0], 20), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RAY_TILE, 8), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, 8), jnp.float32),
        interpret=interpret,
    )(count, rays, tris, inst_table)
    return out[:r]


def make_pallas_instanced_tracer(scene: InstancedScene,
                                 interpret: bool | None = None):
    """(closest, any) tracer for a static InstancedScene on the Pallas
    kernels; animated scenes use trace/instanced.py."""
    if scene.num_keys != 1:
        raise ValueError("pallas instanced tracer supports static scenes; "
                         "matrix motion uses the jnp instanced tracer")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tris, inst_table, tile_ranges = build_instanced_soup(scene)
    instance_mesh = scene.instance_mesh
    num_faces = scene.num_faces

    def closest(o, d, tmin, tmax, time, count=None):
        del time
        out = _trace_instanced(
            tris, inst_table, o, d, tmin, tmax,
            instance_mesh=instance_mesh, tile_ranges=tile_ranges,
            any_hit=False, count=count, interpret=interpret,
        )
        r = o.shape[0]
        t = out[:, 0]
        prim_f = out[:, 1]
        valid = (prim_f >= 0.0) & (prim_f < num_faces) & (t < _BIG)
        return Hit(
            t=jnp.where(valid, t,
                        jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))),
            prim=jnp.where(valid, prim_f.astype(jnp.int32), -1),
            u=jnp.where(valid, out[:, 2], 0.0),
            v=jnp.where(valid, out[:, 3], 0.0),
            inst=jnp.where(valid, out[:, 4].astype(jnp.int32), -1),
        )

    def any_hit(o, d, tmin, tmax, time, count=None):
        del time
        out = _trace_instanced(
            tris, inst_table, o, d, tmin, tmax,
            instance_mesh=instance_mesh, tile_ranges=tile_ranges,
            any_hit=True, count=count, interpret=interpret,
        )
        return out[:, 0] > 0.0

    return closest, any_hit
