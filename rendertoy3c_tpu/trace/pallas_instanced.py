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

from ..scene.instanced import INST_FACE_ALIGN, InstancedScene
from .intersect import Hit
from .pallas_mt import RAY_TILE, _BIG, _mt_test_cols, _pack_rays

# Instanced tri-tile width = one vector register width = the instanced
# face alignment: small meshes (walls, props) sweep zero padding beyond
# their own 128-pad, where the baked path's 512-wide tiles would waste 4x.
ITILE = INST_FACE_ALIGN


def build_instanced_soup(scene: InstancedScene):
    """Object-space tri soup [F/IT, 9, IT] + per-mesh tile ranges +
    instance table [I, 20]."""
    v0 = np.asarray(scene.geom.v0[0])
    e1 = np.asarray(scene.geom.e1[0])
    e2 = np.asarray(scene.geom.e2[0])
    f = v0.shape[0]
    assert f % ITILE == 0, "mesh ranges are INST_FACE_ALIGN-padded"
    soup = np.zeros((9, f), np.float32)
    soup[0:3] = v0.T
    soup[3:6] = e1.T
    soup[6:9] = e2.T
    tiled = soup.reshape(9, f // ITILE, ITILE).transpose(1, 0, 2)

    inst = scene.instances
    n_inst = scene.num_instances
    table = np.zeros((n_inst, 20), np.float32)
    table[:, 0:12] = np.asarray(inst.minv)[:, 0].reshape(n_inst, 12)
    table[:, 12:15] = np.asarray(inst.aabb_lo)
    table[:, 15:18] = np.asarray(inst.aabb_hi)

    tile_ranges = tuple(
        (start // ITILE, cnt // ITILE) for start, cnt in scene.mesh_ranges
    )
    return (
        jnp.asarray(np.ascontiguousarray(tiled)),
        jnp.asarray(table),
        tile_ranges,
    )


def _instance_sweep(kern_update, tcur_fn, rays_ref, tris_ref, inst_ref,
                    instance_mesh, tile_ranges, state):
    """Shared instance loop: state is updated per surviving triangle tile.

    The per-instance cull + object-space transform run LANES-MAJOR on
    [1, RT] rows (a [RT, 1] column wastes 127/128 lanes per op — at ~30 ops
    x I instances that dominated the kernel); one [8, RT] -> [RT, 8]
    transpose per surviving instance feeds the rays-in-sublanes MT sweep.

    tcur_fn(state) -> [RT,1] current upper t bound (best-so-far for closest,
    the ray tmax for occlusion)."""
    rays_t = jnp.transpose(rays_ref[:], (1, 0))  # [8, RT]

    def row(c):
        return rays_t[c:c + 1, :]

    ox, oy, oz = row(0), row(1), row(2)
    dx, dy, dz = row(3), row(4), row(5)
    tmin_r = row(6)
    tmin_c = rays_ref[:, 6:7]

    big = jnp.float32(_BIG)
    inv_dx = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, big)
    inv_dy = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, big)
    inv_dz = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, big)

    # --- batched slab test + object-space transform for ALL instances at
    # once on [I, RT] (inst columns [I,1] broadcast against ray rows
    # [1,RT]); the per-instance loop then only compares against the
    # current-best t and slices its rows out ---
    def icol(c):
        return inst_ref[:, c:c + 1]  # [I, 1]

    t0x = (icol(12) - ox) * inv_dx
    t1x = (icol(15) - ox) * inv_dx
    t0y = (icol(13) - oy) * inv_dy
    t1y = (icol(16) - oy) * inv_dy
    t0z = (icol(14) - oz) * inv_dz
    t1z = (icol(17) - oz) * inv_dz
    tn_all = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
    tf_all = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
    ok_static = (tn_all <= tf_all) & (tf_all >= tmin_r)  # [I, RT]

    o2x_a = icol(0) * ox + icol(1) * oy + icol(2) * oz + icol(3)
    o2y_a = icol(4) * ox + icol(5) * oy + icol(6) * oz + icol(7)
    o2z_a = icol(8) * ox + icol(9) * oy + icol(10) * oz + icol(11)
    d2x_a = icol(0) * dx + icol(1) * dy + icol(2) * dz
    d2y_a = icol(4) * dx + icol(5) * dy + icol(6) * dz
    d2z_a = icol(8) * dx + icol(9) * dy + icol(10) * dz

    for i, mesh_i in enumerate(instance_mesh):
        tcur_r = jnp.transpose(tcur_fn(state), (1, 0))  # [1, RT]
        hit_box = ok_static[i:i + 1] & (tn_all[i:i + 1] <= tcur_r)
        any_box = jnp.max(hit_box.astype(jnp.float32))

        start_tile, n_tiles = tile_ranges[mesh_i]

        def do_instance(st, _i=i, _start=start_tile, _n=n_tiles):
            obj_cols = jnp.transpose(
                jnp.concatenate(
                    [o2x_a[_i:_i + 1], o2y_a[_i:_i + 1], o2z_a[_i:_i + 1],
                     d2x_a[_i:_i + 1], d2y_a[_i:_i + 1], d2z_a[_i:_i + 1]],
                    axis=0,
                ), (1, 0)
            )  # [RT, 6]

            def tile_body(k, s2):
                cols = tuple(obj_cols[:, c:c + 1] for c in range(6)) + (
                    tmin_c, tcur_fn(s2),
                )
                tri_tile = tris_ref[_start + k]
                prim_base = (_start + k) * ITILE
                return kern_update(s2, cols, tri_tile,
                                   jnp.int32(prim_base), _i)

            return jax.lax.fori_loop(0, _n, tile_body, st)

        state = jax.lax.cond(any_box > 0.0, do_instance, lambda st: st,
                             state)
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
                pl.BlockSpec((f_tiles, 9, ITILE), lambda i, *_: (0, 0, 0),
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
