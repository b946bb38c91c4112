"""Persistent walk-pool integrator: the traversal round IS the pool step.

The large-scene pool (integrate/path.py) calls a whole-walk tracer per
iteration; the walk's while_loop pays the MAX round count over the
wavefront while useful work scales with the MEAN (49k field: mean 5.9
visits, p90 14, max 42 — ~13% lane utilization; ROADMAP item 1). Measured
negatives rule out fixing that inside the tracer (straggler compaction,
chunked loops, width decay all lose to phase-boundary costs).

This integrator dissolves the tracer boundary instead: pool lanes carry
RESUMABLE traversal state (the ordered-DFS hierwalk's per-level
pending-children stacks, trace/hierwalk.py), every pool iteration advances
every lane by exactly ONE walk round (a [W,128] row gather + leaf MT /
child slab tests + ordered pop), and lanes that finish a walk wait only
until the next PHASE BOUNDARY (every cfg.walk_phase_every rounds) where
the masked stages run. The loop nests cond-free — outer while = one
unconditional framebuffer flush, middle fori = flush_n boundaries, inner
fori = K walk rounds — because a lax.cond around loop-carried buffers
makes XLA copy them every iteration (measured ~40% of the subframe):

  phase A  closest walk done -> the packed-state Pallas shade kernel
           (trace/pallas_shade.make_external_shader: shade + NEE ray gen +
           RR, all in one launch; the NEE term leaves as a pending column
           gated later by the REAL occlusion verdict, so shading cannot
           drift from the external pipeline). Scenes outside the kernel's
           eligibility (env maps, roughness/emissive maps, physical
           throughput) use an XLA stage with the same update semantics.
  phase B  the lane's shadow ray starts ITS walk in the same lane
  phase C  shadow walk done -> gate the pending NEE contribution, then
           bounce (kernel already drew RR) or retire; idle lanes flush +
           refill (pixel-major)

Lane utilization becomes mean-visits-bound: the only waste is the <=K-round
wait at each boundary, amortized over both walks of a path segment.
Per-path RNG draw order matches the classic pool / fused pipeline exactly
(phase A draws everything the reference's closest-hit draws, incl. the RR
draw whose VALUE is independent of the occlusion outcome — raygen.cu:62-66,
closehit_radiance.cu:91-138), so results match the external pipeline to
float-op order.

Scope: static or 2-key-motion non-instanced pool scenes on the hierwalk
band (trace/auto.py routes >16k-face scenes here); wave/golden paths
unaffected.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..math import rng
from ..trace.hierwalk import (
    _BIG,
    _L_FIRST,
    _L_TYPE,
    FANOUT,
    HierTable,
    _dir_entries,
    _leaf_mt,
    _prune_cut,
    _safe_inv,
    build_hier_table,
)
from ..trace.intersect import Hit
from .config import RenderConfig

# Flush the framebuffer every Nth boundary (see flush_stage): the scatter
# serializes per lane (~1.3ms at 16k). With the retire stash, lanes free
# at boundaries, so the only flush-cadence pressure is a full stash (a
# lane completing TWO pixels in one window parks). Measured with the
# stash on v5e (W=4096): 8/16/32 -> 9.53+7.63 / 9.72+6.91 / 9.20+5.20
# (49k+200k Mray/s) — short-path scenes complete pixels faster than 16
# boundaries, so 8 stays the default. Resolved at RENDER-FN BUILD time
# (env > cfg.flush_every > 8) so same-process A/Bs actually move it — a
# module-import freeze silently pinned 8 for any env set after the first
# walkpool import (r5 advisor finding).
import os as _os


def _flush_n(cfg) -> int:
    env = _os.environ.get("RT3C_FLUSH_N", "")
    if env:
        return int(env)
    return cfg.flush_every or 8

# Directory fanout for the walk-pool hier tables: 0 = auto (16-ary vs
# 20-ary exact-f32 by the smaller directory half-area sum — towns pick
# 20, uniform fields 16; hierwalk.build_hier_table), 16 / 20 = f32
# boxes, 32 = bf16-packed (hierwalk.FANOUT32). Env-switchable for A/B.
POOL_DIR_FANOUT = int(_os.environ.get("RT3C_DIR_FANOUT", "0"))

# RT3C_WP_STATS=1: count lane-rounds spent walking vs total, shades per
# boundary, etc., and debug-print them once per subframe (pipepool only).
# Zero-cost when off; the counters are jit-carried scalars.
_WP_STATS = _os.environ.get("RT3C_WP_STATS", "") == "1"

def _replace_at(lst, i, val):
    """Copy `lst` with element i replaced (per-path state lists)."""
    lst = list(lst)
    lst[i] = val
    return lst


# lane phases
_IDLE = 0
_WALK_CLOSEST = 1
_AWAIT_SHADE = 2
_WALK_SHADOW = 3
_AWAIT_GATE = 4


@dataclasses.dataclass(frozen=True)
class WalkPoolPipeline:
    """Tracer-slot marker + prebuilt shade stage for _render_walkpool.

    Build with make_walkpool_pipeline over the SPLIT-ORDERED scene
    (accel.lbvh.split_order_scene with the matching leaf cap) — always
    render the scene returned alongside this by trace.auto.choose_tracer.
    """

    walk_round: Callable  # (state dict) -> state dict, one traversal round
    n_levels: int         # pending-children stack depth (ents slots)
    num_faces: int        # real face count (hit prim validity bound)
    motion: bool          # 2-key scene: leaf rows lerped by per-ray time
    shade: Callable       # (rays, hit8, misc, attr_t, count) -> 3 outputs
    attr_rows: Any        # [F/k, 128] pack_rows128 attr table (kernel
    #                       path), or None; attr_w real columns per face
    kernel: bool          # True = Pallas shade kernel, False = XLA stage
    misc_w: int           # 16, or 24 with AOV accumulator columns
    shadow_w: int         # shadow-ray column count (8, 16 for motion)
    fanout: int = FANOUT  # pending-children slot width (= table fanout)
    instanced: bool = False   # trace-time two-level AS (inst TLAS walk)
    # > 0: the walk rides a PRE-TRANSFORMED world-space baked table
    # (hier_instanced.build_baked_world_table) — plain hierwalk rounds, no
    # per-round space switch; leaf hits encode eff = inst * stride + face
    # and the boundary decodes them for the instanced shade stage
    inst_stride: int = 0
    inst_it: Any = None       # kernel path: (packed, width, identity) from
    #                           pallas_shade.inst_attr_pack — per-instance
    #                           transform rows gathered by hit instance id
    attr_w: int = 0           # real attr column count before the packing
    # textured kernel path: XLA-side texture pre-sampler over the gathered
    # attr block (pallas_shade.make_tex_presampler); its rgb columns append
    # to attr_g so the kernel skips the in-kernel atlas matmuls
    presample: Any = None


def make_walkpool_pipeline(scene, cfg: RenderConfig) -> WalkPoolPipeline:
    """Node table + shade stage for `scene` (already split-ordered)."""
    from ..trace.pallas_shade import (
        external_shade_eligible,
        make_external_shader,
        pack_rows128,
    )

    tab = build_hier_table(scene.geom, scene.num_faces,
                           num_keys=scene.num_keys, fanout=POOL_DIR_FANOUT)
    motion = scene.num_keys == 2
    misc_w = 24 if cfg.aov else 16
    shadow_w = 16 if motion else 8
    walk_round = functools.partial(_walk_round, tab, motion=motion)
    common = dict(walk_round=walk_round,
                  n_levels=len(tab.level_starts),
                  num_faces=tab.num_faces, motion=motion,
                  misc_w=misc_w, shadow_w=shadow_w, fanout=tab.fanout)
    if external_shade_eligible(scene, cfg):
        shade, attr_rows, presample = make_external_shader(
            scene, cfg, motion=motion, transposed=True)
        return WalkPoolPipeline(shade=shade,
                                attr_rows=pack_rows128(attr_rows)[0],
                                attr_w=attr_rows.shape[1],
                                presample=presample,
                                kernel=True, **common)
    shade = _make_xla_shade_stage(scene, cfg, misc_w, shadow_w)
    return WalkPoolPipeline(shade=shade, attr_rows=None, kernel=False,
                            **common)


def make_inst_walkpool_pipeline(iscene, cfg: RenderConfig):
    """Walk-pool pipeline over the instanced TLAS gather walk
    (trace/hier_instanced.py): resumable world->instance->mesh walks in
    pool lanes; the shade stage transforms object-space normals through
    per-hit inverse-transpose attr rows (key 0, matching _shade_and_nee).
    Static or 2-key matrix motion (instance rows invert the time-lerped
    forward transform per lane); >2 keys ride the pallas kernels."""
    from ..trace.hier_instanced import build_inst_hier_table
    from ..trace.pallas_shade import (
        external_shade_eligible,
        make_external_shader,
        pack_rows128,
    )

    if iscene.num_keys > 2:
        raise ValueError("instanced walk pool supports <= 2 transform "
                         "keys; more ride the pallas_instanced kernels")
    from ..trace.auto import LEAFWALK_MIN_FACES
    from ..trace.hier_instanced import (
        baked_world_eligible,
        build_baked_world_table,
    )

    motion = iscene.num_keys == 2
    misc_w = 24 if cfg.aov else 16
    shadow_w = 16 if motion else 8
    eff_faces = sum(iscene.mesh_ranges[m][1] for m in iscene.instance_mesh)
    # static instance fields past the walk-band threshold trade memory for
    # round cost: a pre-transformed WORLD-SPACE table (duplicated leaf
    # rows, plain hierwalk rounds) drops the ~9-op/round space switch the
    # instanced walk pays (VERDICT r4 item 4). RT3C_INST_BAKE=2 forces it
    # on small scenes (tests); shading stays instanced either way.
    bake = baked_world_eligible(iscene) and (
        eff_faces > LEAFWALK_MIN_FACES
        or _os.environ.get("RT3C_INST_BAKE", "") == "2")
    if bake:
        # 2-key matrix motion bakes to 2-key vertex-motion leaves: a
        # lerped affine is linear in its entries, so the in-row vertex
        # lerp by ray time reproduces the transform lerp exactly
        btab, stride = build_baked_world_table(iscene)
        common = dict(walk_round=functools.partial(_walk_round, btab,
                                                   motion=motion),
                      n_levels=len(btab.level_starts),
                      num_faces=stride, motion=motion, misc_w=misc_w,
                      shadow_w=shadow_w, instanced=True,
                      inst_stride=stride, fanout=btab.fanout)
    else:
        itab = build_inst_hier_table(iscene)
        n_levels = len(itab.world_starts) + len(itab.mesh_starts)
        common = dict(walk_round=functools.partial(_walk_round_inst, itab,
                                                   motion=motion),
                      n_levels=n_levels, num_faces=itab.num_faces,
                      motion=motion, misc_w=misc_w, shadow_w=shadow_w,
                      instanced=True, fanout=itab.fanout)
    if external_shade_eligible(iscene, cfg):
        from ..trace.pallas_shade import inst_attr_pack

        shade, attr_rows, presample = make_external_shader(
            iscene, cfg, motion=motion, transposed=True)
        return WalkPoolPipeline(shade=shade,
                                attr_rows=pack_rows128(attr_rows)[0],
                                attr_w=attr_rows.shape[1],
                                presample=presample,
                                inst_it=inst_attr_pack(iscene),
                                kernel=True, **common)
    # XLA fallback: no kernel transform rows needed (and the eager
    # pack_rows128 would pay remote compile+execute round trips for
    # nothing at scene load)
    shade = _make_xla_shade_stage(iscene, cfg, misc_w, shadow_w)
    return WalkPoolPipeline(shade=shade, attr_rows=None, kernel=False,
                            **common)


def _make_xla_shade_stage(scene, cfg: RenderConfig, misc_w: int,
                          shadow_w: int):
    """XLA fallback with the shade kernel's exact interface and update
    semantics, for scenes outside external_shade_eligible (env maps,
    roughness/emissive textures, physical throughput, big atlases).

    Wraps integrate.path._shade_and_nee with a stub occlusion tracer that
    captures the shadow ray; the RR draw runs here (same stream position —
    its value never depended on the occlusion outcome) and the pending NEE
    term leaves via misc columns misc_w..misc_w+2 like the kernel's.
    """
    from ..math.vec import luminance
    from .path import _miss_radiance, _shade_and_nee

    bg = jnp.asarray(cfg.bg_radiance, jnp.float32)
    instanced = getattr(scene, "instances", None) is not None

    def shade(rays, hit8, misc, attr_t, count):
        del attr_t, count
        # walk-pool protocol: misc rides C-major [C, W]; this stage is the
        # ineligible-scene fallback, so a pair of transposes is fine
        misc = jnp.transpose(misc, (1, 0))
        r = rays.shape[0]
        org, d = rays[:, 0:3], rays[:, 3:6]
        seed = jax.lax.bitcast_convert_type(misc[:, 0], jnp.uint32)
        alive = misc[:, 9] > 0
        depth = misc[:, 8]
        prev_delta = misc[:, 7] > 0
        atten = misc[:, 1:4]
        last_atten = misc[:, 4:7]
        hit = Hit(t=hit8[:, 0], prim=hit8[:, 1].astype(jnp.int32),
                  u=hit8[:, 2], v=hit8[:, 3],
                  inst=hit8[:, 4].astype(jnp.int32) if instanced else None)
        cap = {}

        def stub_any(p, ldir, tmin_s, tmax_s, time_s, count=None):
            cap["p"] = p
            cap["ldir"] = ldir
            cap["tmax"] = jnp.broadcast_to(
                jnp.asarray(tmax_s, jnp.float32), (r,))
            cap["time"] = jnp.broadcast_to(
                jnp.asarray(time_s, jnp.float32), (r,))
            return jnp.zeros((r,), bool)

        (seed, emitted, radiance, norg, ndir, atten_factor, want_shadow,
         is_delta, sh_albedo, sh_normal) = _shade_and_nee(
            scene, cfg, stub_any, hit, org, d, seed, alive)
        is_hit = hit.mask
        adv = alive & is_hit

        # pending NEE rides extra columns; in-place acc takes emission +
        # the miss background (mirrors the kernel's external branch)
        nee = radiance * last_atten
        miss_rad = _miss_radiance(scene, bg, d)
        see_emit = is_hit & ((depth == 0) | prev_delta)
        contrib = (jnp.where(see_emit[:, None], emitted, 0.0)
                   + jnp.where(is_hit[:, None], 0.0, miss_rad) * last_atten)

        new_at = jnp.where(adv[:, None], atten * atten_factor, atten)
        new_last = jnp.where(alive[:, None], new_at, last_atten)
        p_rr = luminance(new_at)
        seed, u_rr = rng.rnd_masked(seed, adv)
        survive = adv & (u_rr <= p_rr)
        new_at = jnp.where(survive[:, None],
                           new_at / jnp.maximum(p_rr, 1e-12)[:, None],
                           new_at)
        acc_new = misc[:, 10:13] + jnp.where(alive[:, None], contrib, 0.0)
        depth_new = depth + alive.astype(jnp.float32)
        alive_new = survive & (depth_new < float(cfg.max_depth))
        pdelta_new = jnp.where(alive, is_delta, prev_delta)

        rays_out = jnp.concatenate(
            [jnp.where(survive[:, None], norg, org),
             jnp.where(survive[:, None], ndir, d),
             rays[:, 6:8]], axis=1)
        misc_cols = [
            jax.lax.bitcast_convert_type(seed, jnp.float32)[:, None],
            new_at, new_last,
            pdelta_new.astype(jnp.float32)[:, None],
            depth_new[:, None],
            alive_new.astype(jnp.float32)[:, None],
            acc_new,
            misc[:, 13:14], misc[:, 14:15],
            want_shadow.astype(jnp.float32)[:, None],
        ]
        if cfg.aov:
            first = (adv & (depth == 0))[:, None]
            misc_cols += [
                misc[:, 16:19] + jnp.where(first, sh_albedo, 0.0),
                misc[:, 19:22] + jnp.where(first, sh_normal, 0.0),
                jnp.zeros((r, 2), jnp.float32),
            ]
        misc_cols += [jnp.where(want_shadow[:, None], nee, 0.0),
                      jnp.zeros((r, 5), jnp.float32)]
        misc_out = jnp.transpose(jnp.concatenate(misc_cols, axis=1), (1, 0))

        tmax_s = jnp.where(want_shadow, cap["tmax"], 0.0)
        sh_cols = [cap["p"], cap["ldir"],
                   jnp.full((r, 1), jnp.float32(cfg.shadow_tmin)),
                   tmax_s[:, None]]
        if shadow_w == 16:
            sh_cols += [cap["time"][:, None],
                        jnp.zeros((r, 7), jnp.float32)]
        return rays_out, misc_out, jnp.concatenate(sh_cols, axis=1)

    return shade


def _walk_round(tab: HierTable, s, motion: bool):
    """Advance every walking lane by one traversal round (mixed modes).

    Same per-round work as hierwalk._walk's body, with per-lane any/closest
    mode: closest lanes (wmode=False) keep best (t, prim, u, v) and prune
    by best_t; shadow lanes (wmode=True) flip wfound on any in-range hit
    and stop. Lanes with cur < 0 are idle/awaiting and unaffected. Rays
    (o, d, tmin) live in the packed s["rays"] [W, 8] columns.
    """
    n_levels = len(tab.level_starts)
    fanout = tab.fanout
    bounds = tuple(tab.level_starts[1:]) + (tab.leaf_start,)
    cur = s["cur"]
    rays = s["rays"]
    o, d = rays[:, 0:3], rays[:, 3:6]
    walking = cur >= 0
    r = cur.shape[0]
    lane16 = jax.lax.iota(jnp.int32, fanout)[None, :]
    inv = _safe_inv(d)
    tmin_c = rays[:, 6:7]

    rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
    is_leaf = rows[:, _L_TYPE] > 0.5
    first = rows[:, _L_FIRST]

    # --- leaf: fused MT over the inline triangles ---
    tcur = jnp.where(s["wfound"], 0.0, s["wb_t"])
    t, u, v, hit = _leaf_mt(rows, o, d, tmin_c, tcur[:, None],
                            time=s["wtime"] if motion else None)
    hit = hit & (is_leaf & walking)[:, None]
    wmode = s["wmode"]
    wfound = s["wfound"] | (wmode & jnp.any(hit, axis=1))

    cap = hit.shape[1]
    tt = jnp.where(hit, t, jnp.float32(_BIG))
    t_leaf = jnp.min(tt, axis=1)
    lane = jax.lax.iota(jnp.int32, cap)[None, :]
    at_min = tt <= t_leaf[:, None]
    lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
    one = at_min & (lane == lane_sel[:, None])
    better = (~wmode) & (t_leaf < s["wb_t"])
    wb_t = jnp.where(better, t_leaf, s["wb_t"])
    wb_prim = jnp.where(better, first.astype(jnp.int32) + lane_sel,
                        s["wb_prim"])
    wb_u = jnp.where(better, jnp.sum(jnp.where(one, u, 0.0), axis=1),
                     s["wb_u"])
    wb_v = jnp.where(better, jnp.sum(jnp.where(one, v, 0.0), axis=1),
                     s["wb_v"])

    # --- directory: slab-test children, record entry distances ---
    eff_t = jnp.where(wfound, 0.0, wb_t)
    cut = _prune_cut(eff_t)[:, None]
    ent = _dir_entries(rows, o, inv, tmin_c, cut, fanout=fanout)
    is_dir = walking & ~is_leaf
    ents = list(s["ents"])
    bases = list(s["bases"])
    for lv in range(n_levels):
        at_lv = is_dir & (cur >= tab.level_starts[lv]) & (cur < bounds[lv])
        ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
        bases[lv] = jnp.where(at_lv, first.astype(jnp.int32), bases[lv])

    # --- ordered pop: nearest pending child at the deepest level. The
    # write-back PERSISTS the pruning (dead entries become _BIG instead of
    # being re-skipped every round): best_t only decreases, so a pruned
    # entry can never revive, and a FINISHED walk (no alive entry at any
    # level) leaves its ents all-_BIG — the pipelined pool relaunches into
    # the scratch with no per-level reset. ---
    nxt = jnp.full((r,), -1, jnp.int32)
    done_now = wfound  # shadow lanes stop popping once occluded
    for lv in reversed(range(n_levels)):
        e = ents[lv]
        alive_e = e < cut
        ee = jnp.where(alive_e, e, jnp.float32(_BIG))
        e_min = jnp.min(ee, axis=1)
        has = (e_min < _BIG) & walking & (nxt < 0) & ~done_now
        at_min2 = ee <= e_min[:, None]
        j = jnp.min(jnp.where(at_min2, lane16, fanout), axis=1)
        nxt = jnp.where(has, bases[lv] + j, nxt)
        taken = has[:, None] & (lane16 == j[:, None])
        ents[lv] = jnp.where(taken, jnp.float32(_BIG), ee)

    out = dict(
        s,
        cur=jnp.where(walking, nxt, cur),
        wb_t=wb_t, wb_prim=wb_prim, wb_u=wb_u, wb_v=wb_v, wfound=wfound,
        ents=ents, bases=bases,
    )
    if "phase" in s:  # classic pool; the pipelined pool tracks wslot instead
        finished = walking & (nxt < 0)
        out["phase"] = jnp.where(finished, s["phase"] + 1, s["phase"])
    return out


def _walk_round_inst(tab, s, motion: bool = False):
    """Instanced-table variant of _walk_round (trace/hier_instanced.py
    semantics): rows are world directories, instance rows (switch the lane
    into that instance's object space), shared mesh directories, or leaf
    rows; a pop that re-enters a world level restores the world ray. Extra
    lane state vs the static round: o_cur/d_cur (current-space ray),
    inst_cur, wb_inst. 2-key matrix motion (tab.motion) inverts the
    time-lerped forward transform per lane at instance rows (s["wtime"]).
    """
    from ..trace.hier_instanced import _inst_space
    from ..trace.hier_instanced import _L_FIRST as _LI_FIRST
    from ..trace.hier_instanced import _L_TYPE as _LI_TYPE

    n_world = len(tab.world_starts)
    n_mesh = len(tab.mesh_starts)
    n_levels = n_world + n_mesh
    fanout = tab.fanout
    level_lo = list(tab.world_starts) + list(tab.mesh_starts)
    level_hi = (list(tab.world_starts[1:]) + [tab.inst_start]
                + list(tab.mesh_starts[1:]) + [tab.leaf_start])
    cur = s["cur"]
    rays = s["rays"]
    o_w, d_w = rays[:, 0:3], rays[:, 3:6]
    o_cur, d_cur = s["o_cur"], s["d_cur"]
    walking = cur >= 0
    r = cur.shape[0]
    lane16 = jax.lax.iota(jnp.int32, fanout)[None, :]
    inv_w = _safe_inv(d_w)
    inv_cur = _safe_inv(d_cur)
    tmin_c = rays[:, 6:7]

    rows = jnp.take(tab.table, jnp.maximum(cur, 0), axis=0)
    typ = rows[:, _LI_TYPE]
    is_inst = typ > 1.5
    is_leaf = (typ > 0.5) & ~is_inst
    first = rows[:, _LI_FIRST]

    # --- leaf: fused MT in the current space (t stays in world units) ---
    tcur = jnp.where(s["wfound"], 0.0, s["wb_t"])
    t, u, v, hit = _leaf_mt(rows, o_cur, d_cur, tmin_c, tcur[:, None])
    hit = hit & (is_leaf & walking)[:, None]
    wmode = s["wmode"]
    wfound = s["wfound"] | (wmode & jnp.any(hit, axis=1))

    cap = hit.shape[1]
    tt = jnp.where(hit, t, jnp.float32(_BIG))
    t_leaf = jnp.min(tt, axis=1)
    lane = jax.lax.iota(jnp.int32, cap)[None, :]
    at_min = tt <= t_leaf[:, None]
    lane_sel = jnp.min(jnp.where(at_min, lane, cap), axis=1)
    one = at_min & (lane == lane_sel[:, None])
    better = (~wmode) & (t_leaf < s["wb_t"])
    wb_t = jnp.where(better, t_leaf, s["wb_t"])
    wb_prim = jnp.where(better, first.astype(jnp.int32) + lane_sel,
                        s["wb_prim"])
    wb_inst = jnp.where(better, s["inst_cur"], s["wb_inst"])
    wb_u = jnp.where(better, jnp.sum(jnp.where(one, u, 0.0), axis=1),
                     s["wb_u"])
    wb_v = jnp.where(better, jnp.sum(jnp.where(one, v, 0.0), axis=1),
                     s["wb_v"])

    # --- instance row: switch into object space, jump to subtree ---
    o_t, d_t, iid = _inst_space(rows, o_w, d_w, s["wtime"], motion)
    sel_i = (walking & is_inst)[:, None]
    o_cur = jnp.where(sel_i, o_t, o_cur)
    d_cur = jnp.where(sel_i, d_t, d_cur)
    inv_cur = jnp.where(sel_i, _safe_inv(d_t), inv_cur)
    inst_cur = jnp.where(walking & is_inst, iid.astype(jnp.int32),
                         s["inst_cur"])

    # --- directory: slab-test children in the current space ---
    eff_t = jnp.where(wfound, 0.0, wb_t)
    cut = _prune_cut(eff_t)[:, None]
    ent = _dir_entries(rows, o_cur, inv_cur, tmin_c, cut, fanout=fanout)
    is_dir = walking & ~is_leaf & ~is_inst
    ents = list(s["ents"])
    bases = list(s["bases"])
    for lv in range(n_levels):
        at_lv = is_dir & (cur >= level_lo[lv]) & (cur < level_hi[lv])
        ents[lv] = jnp.where(at_lv[:, None], ent, ents[lv])
        bases[lv] = jnp.where(at_lv, first.astype(jnp.int32), bases[lv])

    # --- pop: nearest pending at the deepest level; instance rows jump
    # straight to their subtree root instead ---
    nxt = jnp.full((r,), -1, jnp.int32)
    pop_lv = jnp.full((r,), -1, jnp.int32)
    done_now = wfound
    for lv in reversed(range(n_levels)):
        e = ents[lv]
        alive_e = e < cut
        ee = jnp.where(alive_e, e, jnp.float32(_BIG))
        e_min = jnp.min(ee, axis=1)
        has = (e_min < _BIG) & walking & ~is_inst & (nxt < 0) & ~done_now
        at2 = ee <= e_min[:, None]
        j = jnp.min(jnp.where(at2, lane16, fanout), axis=1)
        nxt = jnp.where(has, bases[lv] + j, nxt)
        pop_lv = jnp.where(has, lv, pop_lv)
        taken = has[:, None] & (lane16 == j[:, None])
        ents[lv] = jnp.where(taken, jnp.float32(_BIG), ents[lv])

    go_inst = walking & is_inst & ~done_now
    nxt = jnp.where(go_inst, first.astype(jnp.int32), nxt)

    # a world-level pop leaves the current instance: restore the world ray
    back = (pop_lv >= 0) & (pop_lv < n_world)
    o_cur = jnp.where(back[:, None], o_w, o_cur)
    d_cur = jnp.where(back[:, None], d_w, d_cur)
    inst_cur = jnp.where(back, -1, inst_cur)

    out = dict(
        s,
        cur=jnp.where(walking, nxt, cur),
        o_cur=o_cur, d_cur=d_cur, inst_cur=inst_cur,
        wb_t=wb_t, wb_prim=wb_prim, wb_inst=wb_inst, wb_u=wb_u, wb_v=wb_v,
        wfound=wfound, ents=ents, bases=bases,
    )
    if "phase" in s:  # classic pool; the pipelined pool tracks wslot
        finished = walking & (nxt < 0)
        out["phase"] = jnp.where(finished, s["phase"] + 1, s["phase"])
    return out


def _render_walkpool(scene, cfg: RenderConfig, cam, pipe: WalkPoolPipeline,
                     pixel_idx, subframe_index):
    """Pool-compatible subframe body; returns (rgb, aov, n_rad, n_shad).

    Pixel-major schedule only (a lane owns one pixel and renders all its
    samples back-to-back; flush rides the phase boundary)."""
    from ..trace.pallas_shade import take_packed
    from .path import _camera_ray, _lcg_advance_table, _next_pow2

    motion = pipe.motion
    # baked world-space tables shade as instanced but walk as plain
    # hierwalk — no per-lane space state (see _render_pipepool)
    spacewalk = pipe.instanced and pipe.inst_stride == 0
    misc_w = pipe.misc_w
    n_levels = pipe.n_levels
    num_faces = pipe.num_faces
    n_pix = pixel_idx.shape[0]
    pool = min(cfg.ray_block, _next_pow2(n_pix * cfg.samples_per_launch))
    # the shade kernel's grid is RAY_TILE(256)-wide; surplus lanes idle
    pool = max(pool, 256)
    spp = cfg.samples_per_launch
    # 0 = auto cadence. 16 is the measured optimum across the band with
    # the columnized boundary (v5e, W=8192, K 8/12/16/24: 49k field
    # 8.73/9.85/10.00/8.74, 200k town 7.08/7.91/8.01/7.59 Mray/s; the
    # pre-columnization boundary preferred 12 under 100k faces).
    if cfg.walk_phase_every < 0:
        raise ValueError("walk_phase_every must be >= 0 (0 = auto)")
    k_phase = cfg.walk_phase_every or 16
    flush_n = _flush_n(cfg)
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    jump = _lcg_advance_table(spp)
    pixel_base = pixel_idx[0]

    state = dict(
        # current walk ray columns (o, d, tmin, tmax): camera/bounce ray in
        # closest mode, the NEE shadow probe during its walk
        rays=jnp.zeros((pool, 8), jnp.float32),
        wtime=jnp.zeros((pool,), jnp.float32),
        cur=jnp.full((pool,), -1, jnp.int32),
        wmode=jnp.zeros((pool,), bool),
        wfound=jnp.zeros((pool,), bool),
        wb_t=jnp.full((pool,), jnp.float32(cfg.primary_tmax)),
        wb_prim=jnp.full((pool,), -1, jnp.int32),
        wb_u=jnp.zeros((pool,), jnp.float32),
        wb_v=jnp.zeros((pool,), jnp.float32),
        ents=[jnp.full((pool, pipe.fanout), jnp.float32(_BIG))
              for _ in range(n_levels)],
        **({} if not spacewalk else dict(
            # instanced TLAS walk: the current-space ray (object space
            # inside an instance subtree) + the owning instance ids
            o_cur=jnp.zeros((pool, 3), jnp.float32),
            d_cur=jnp.zeros((pool, 3), jnp.float32),
            inst_cur=jnp.full((pool,), -1, jnp.int32),
            wb_inst=jnp.full((pool,), -1, jnp.int32),
        )),
        bases=[jnp.zeros((pool,), jnp.int32) for _ in range(n_levels)],
        phase=jnp.zeros((pool,), jnp.int32),
        # packed path state (the fused pool's misc layout, pallas_shade.py)
        # held as 1-D COLUMNS: a [W, 16] f32 array is physically padded to
        # [W, 128] by the T(8,128) tiling (8x traffic on every select),
        # while [W] 1-D arrays tile dense — the boundary's ~30 masked
        # column updates cost ~100x less as 1-D ops. The 2-D misc view is
        # materialized once per boundary for the shade kernel only.
        mc=[jnp.full((pool,), -1.0, jnp.float32) if c == 13
            else jnp.zeros((pool,), jnp.float32) for c in range(misc_w)],
        # deferred-segment stash: next bounce ray + pending NEE term
        nrays=jnp.zeros((pool, 8), jnp.float32),
        nee=[jnp.zeros((pool,), jnp.float32) for _ in range(3)],
        # retire stash: completed lanes park (pixel, acc) HERE (a dense
        # per-lane slot, no scatter) and take new work at the same
        # boundary; the flush scatters + clears the stash. Capacity 1 is
        # enough: a pixel takes ~spp*depth*visits rounds >> one flush
        # window, so a second completion before the flush is rare — it
        # falls back to parking for one window.
        stash_px=jnp.full((pool,), -1.0, jnp.float32),
        stash_rgb=[jnp.zeros((pool,), jnp.float32) for _ in range(3)],
        image=jnp.zeros((n_pix + 1, 3), jnp.float32),
        next_work=jnp.zeros((), jnp.int32),
        # traversal rounds executed (roofline accounting: rows gathered =
        # n_round * pool; surfaced as RenderStats.walk_rounds)
        n_round=jnp.zeros((), jnp.int32),
        n_rad=jnp.zeros((), jnp.int32),
        n_shad=jnp.zeros((), jnp.float32),
    )
    if cfg.aov:
        state.update(
            image_alb=jnp.zeros((n_pix + 1, 3), jnp.float32),
            image_nrm=jnp.zeros((n_pix + 1, 3), jnp.float32),
            stash_aov=[jnp.zeros((pool,), jnp.float32) for _ in range(6)],
        )
    _IMGS = ((("image", 10), ("image_alb", 16), ("image_nrm", 19))
             if cfg.aov else (("image", 10),))

    def cond(s):
        mc = s["mc"]
        pending = (mc[13] >= 0) & (mc[14] < spp)
        return ((s["next_work"] < n_pix) | jnp.any(s["phase"] != _IDLE)
                | jnp.any(pending))

    def boundary(s):
        mc = list(s["mc"])
        rays = s["rays"]

        # ---- phase A: shade lanes whose closest walk finished ----
        m_a = s["phase"] == _AWAIT_SHADE
        if pipe.inst_stride:
            # baked world table: decode eff = inst*stride + face (see
            # hier_instanced.build_baked_world_table)
            eff = s["wb_prim"]
            w_inst = jnp.where(eff >= 0, eff // pipe.inst_stride, -1)
            w_prim = jnp.where(eff >= 0, eff - w_inst * pipe.inst_stride,
                               -1)
        else:
            w_prim = s["wb_prim"]
            w_inst = s["wb_inst"] if pipe.instanced else None
        valid = m_a & (w_prim >= 0) & (w_prim < num_faces)
        hit_t = jnp.where(valid, s["wb_t"], rays[:, 7])
        hit_prim = jnp.where(valid, w_prim, -1)
        if pipe.instanced:
            hit_inst = jnp.where(valid, w_inst, -1)
            hit8 = jnp.concatenate(
                [hit_t[:, None], hit_prim.astype(jnp.float32)[:, None],
                 jnp.where(valid, s["wb_u"], 0.0)[:, None],
                 jnp.where(valid, s["wb_v"], 0.0)[:, None],
                 hit_inst.astype(jnp.float32)[:, None],
                 jnp.zeros((pool, 3), jnp.float32)], axis=1)
        else:
            hit8 = jnp.concatenate(
                [hit_t[:, None], hit_prim.astype(jnp.float32)[:, None],
                 jnp.where(valid, s["wb_u"], 0.0)[:, None],
                 jnp.where(valid, s["wb_v"], 0.0)[:, None],
                 jnp.zeros((pool, 4), jnp.float32)], axis=1)
        # C-major misc for the shade stage: a stack of 1-D columns along
        # axis 0 is a dense sublane concat (the [W, C] form would shred
        # back into lane-strided column slices on the way out)
        misc_in = jnp.stack(
            mc[:9] + [m_a.astype(jnp.float32)] + mc[10:], axis=0)
        hit_u = jnp.where(valid, s["wb_u"], 0.0)
        hit_v = jnp.where(valid, s["wb_v"], 0.0)
        if pipe.kernel and pipe.instanced:
            # per-hit transform rows (identity for misses) for the
            # kernel's in-kernel instance normal/tangent transforms
            from ..trace.pallas_shade import instanced_attr_t

            attr_t = instanced_attr_t(pipe.attr_rows, pipe.attr_w,
                                      pipe.inst_it, hit_prim, hit_inst,
                                      presample=pipe.presample,
                                      bu=hit_u, bv=hit_v)
        elif pipe.kernel:
            attr_g = take_packed(pipe.attr_rows, jnp.maximum(hit_prim, 0),
                                 pipe.attr_w)
            if pipe.presample is not None:
                attr_g = jnp.concatenate(
                    [attr_g, pipe.presample(attr_g, hit_u, hit_v)], axis=1)
            attr_t = jnp.transpose(attr_g, (1, 0))
        else:
            attr_t = None
        rays2, misc_e, sh = pipe.shade(rays, hit8, misc_in, attr_t, pool)

        me = [misc_e[c] for c in range(misc_w + 3)]
        mc = [jnp.where(m_a, me[c], mc[c]) for c in range(misc_w)]
        nrays = jnp.where(m_a[:, None], rays2, s["nrays"])
        nee = [jnp.where(m_a, me[misc_w + j], s["nee"][j])
               for j in range(3)]
        want_shadow = m_a & (me[15] > 0)
        n_shad = s["n_shad"] + jnp.sum(jnp.where(m_a, me[15], 0.0))

        # ---- phase B: launch the shadow walk in place ----
        ws = want_shadow
        rays = jnp.where(ws[:, None], sh[:, 0:8], rays)
        wtime = jnp.where(ws, sh[:, 8] if pipe.shadow_w == 16 else 0.0,
                          s["wtime"])
        wmode = jnp.where(m_a, ws, s["wmode"])
        wfound = s["wfound"] & ~m_a
        wb_t = jnp.where(ws, sh[:, 7], s["wb_t"])
        cur = jnp.where(ws, 0, jnp.where(m_a, -1, s["cur"]))
        inst_extra = {}
        if spacewalk:
            # shadow walks start in world space
            inst_extra = dict(
                o_cur=jnp.where(ws[:, None], sh[:, 0:3], s["o_cur"]),
                d_cur=jnp.where(ws[:, None], sh[:, 3:6], s["d_cur"]),
                inst_cur=jnp.where(ws, -1, s["inst_cur"]),
            )
        phase = jnp.where(m_a,
                          jnp.where(ws, _WALK_SHADOW, _AWAIT_GATE),
                          s["phase"])
        ents = [jnp.where(ws[:, None], jnp.float32(_BIG), e)
                for e in s["ents"]]

        # ---- phase C: gate the pending NEE, bounce or retire ----
        # (includes lanes phase A just routed past the shadow walk, so a
        # shadow-free segment pays zero extra boundary waits)
        m_c = phase == _AWAIT_GATE
        gate = m_c & ~wfound
        acc = [mc[10 + j] + jnp.where(gate, nee[j], 0.0) for j in range(3)]
        aacc = mc[16:22] if cfg.aov else None
        cont = m_c & (mc[9] > 0)
        rays = jnp.where(cont[:, None], nrays, rays)
        phase = jnp.where(m_c, jnp.where(cont, _WALK_CLOSEST, _IDLE), phase)

        # ---- retire + refill (pixel-major; mirrors _render_pool_fused).
        # Completed lanes move (pixel, acc) into their dense stash slot and
        # free IMMEDIATELY (no waiting for the flush — parking cost a
        # measured ~2.2x round inflation at W=4096); a lane whose stash is
        # still occupied (rare: needs two completions in one flush window)
        # parks until the flush clears it, as before. The framebuffer
        # scatter lives in flush_stage OUTSIDE this function so no
        # lax.cond wraps any loop-carried buffer. ----
        pixel = mc[13]
        samp = mc[14]
        idle = phase == _IDLE
        completed = idle & (pixel >= 0) & (samp >= spp)
        can_stash = completed & (s["stash_px"] < 0)
        stash_px = jnp.where(can_stash, pixel, s["stash_px"])
        stash_rgb = [jnp.where(can_stash, acc[j], s["stash_rgb"][j])
                     for j in range(3)]
        acc = [jnp.where(can_stash, 0.0, acc[j]) for j in range(3)]
        if cfg.aov:
            stash_aov = [jnp.where(can_stash, aacc[j], s["stash_aov"][j])
                         for j in range(6)]
            aacc = [jnp.where(can_stash, 0.0, aacc[j]) for j in range(6)]
        pixel = jnp.where(can_stash, -1.0, pixel)
        samp = jnp.where(can_stash, 0.0, samp)
        fresh = idle & (pixel < 0)
        rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
        wpix = s["next_work"] + rank
        take_px = fresh & (wpix < n_pix)
        pixel = jnp.where(
            take_px,
            (pixel_base + jnp.clip(wpix, 0, n_pix - 1)).astype(jnp.float32),
            pixel)
        samp = jnp.where(take_px, 0.0, samp)
        next_work = s["next_work"] + jnp.sum(take_px.astype(jnp.int32))

        take = idle & (pixel >= 0) & (samp < spp)
        samp_rng = samp.astype(jnp.int32)
        samp = jnp.where(take, samp + 1.0, samp)
        new_pixel = jnp.maximum(pixel, 0.0).astype(jnp.int32)

        st = rng.tea(new_pixel.astype(jnp.uint32), subframe_index)
        if cfg.seed:
            st = rng.rot_seed(st, jnp.uint32(cfg.seed))
        aj = jnp.full((pool,), int(jump[0, 0]), jnp.uint32)
        cj = jnp.full((pool,), int(jump[0, 1]), jnp.uint32)
        for si in range(1, spp):
            sel = samp_rng == si
            aj = jnp.where(sel, jnp.uint32(int(jump[si, 0])), aj)
            cj = jnp.where(sel, jnp.uint32(int(jump[si, 1])), cj)
        st = aj * st + cj
        st, jx = rng.rnd(st)
        st, jy = rng.rnd(st)
        px = new_pixel % cfg.width
        py = new_pixel // cfg.width
        cam_org, cam_dir = _camera_ray(cam, px, py, jx, jy, width, height)

        take2 = take[:, None]
        launch = cont | take
        seed_u = jnp.where(
            take, st, jax.lax.bitcast_convert_type(mc[0], jnp.uint32))
        # per-radiance-ray motion-time draw (shader_common.h:64); static
        # scenes still consume it to keep streams aligned with the pool
        seed_u, t_draw = rng.rnd_masked(seed_u, launch)
        mc = ([jax.lax.bitcast_convert_type(seed_u, jnp.float32)]
              + [jnp.where(take, 1.0, mc[c]) for c in (1, 2, 3, 4, 5, 6)]
              + [jnp.where(take, 0.0, mc[7]),
                 jnp.where(take, 0.0, mc[8]),
                 jnp.where(take, 1.0, mc[9])]
              + acc
              + [pixel, samp, mc[15]]
              + (aacc + mc[22:misc_w] if cfg.aov else []))

        # ---- launch closest walks (continuing bounces + fresh samples) ----
        rays = jnp.concatenate([
            jnp.where(take2, cam_org, rays[:, 0:3]),
            jnp.where(take2, cam_dir, rays[:, 3:6]),
            jnp.where(launch, jnp.float32(cfg.primary_tmin),
                      rays[:, 6])[:, None],
            jnp.where(launch, jnp.float32(cfg.primary_tmax),
                      rays[:, 7])[:, None],
        ], axis=1)
        wtime = jnp.where(launch, t_draw, wtime)
        wb_t = jnp.where(launch, jnp.float32(cfg.primary_tmax), wb_t)
        wb_prim = jnp.where(launch, -1, s["wb_prim"])
        wmode = wmode & ~launch
        wfound = wfound & ~launch
        cur = jnp.where(launch, 0, cur)
        phase = jnp.where(launch, _WALK_CLOSEST, phase)
        ents = [jnp.where(launch[:, None], jnp.float32(_BIG), e)
                for e in ents]
        n_rad = s["n_rad"] + jnp.sum(launch.astype(jnp.int32))
        if spacewalk:
            # closest walks start at the world root in world space
            inst_extra = dict(
                o_cur=jnp.where(launch[:, None], rays[:, 0:3],
                                inst_extra["o_cur"]),
                d_cur=jnp.where(launch[:, None], rays[:, 3:6],
                                inst_extra["d_cur"]),
                inst_cur=jnp.where(launch, -1, inst_extra["inst_cur"]),
                wb_inst=jnp.where(launch, -1, s["wb_inst"]),
            )

        out = dict(
            s,
            rays=rays, wtime=wtime, cur=cur, wmode=wmode, wfound=wfound,
            wb_t=wb_t, wb_prim=wb_prim, ents=ents, phase=phase,
            mc=mc, nrays=nrays, nee=nee,
            stash_px=stash_px, stash_rgb=stash_rgb,
            next_work=next_work, n_rad=n_rad, n_shad=n_shad,
            **inst_extra,
        )
        if cfg.aov:
            out["stash_aov"] = stash_aov
        return out

    def flush_stage(s):
        # Unconditional scatter + clear of the retire stash. Runs once per
        # outer iteration (= every flush_n boundaries): no lax.cond
        # anywhere, so the framebuffer scatter updates the loop-carried
        # image in place and no identity branch copies the [W]-wide state
        # (measured ~650ms/subframe in the cond variants). Lane freeing
        # happens at the boundaries (retire stash), not here.
        stash_px = s["stash_px"]
        have = stash_px >= 0
        target = jnp.where(have, stash_px.astype(jnp.int32) - pixel_base,
                           n_pix + 1)
        accs = ((jnp.stack(s["stash_rgb"], axis=1),)
                + ((jnp.stack(s["stash_aov"][:3], axis=1),
                    jnp.stack(s["stash_aov"][3:], axis=1))
                   if cfg.aov else ()))
        out = {
            k: s[k].at[target].add(a, mode="drop", unique_indices=True)
            for (k, _c), a in zip(_IMGS, accs)
        }
        out["stash_px"] = jnp.full((pool,), -1.0, jnp.float32)
        out["stash_rgb"] = [jnp.zeros((pool,), jnp.float32)
                            for _ in range(3)]
        if cfg.aov:
            out["stash_aov"] = [jnp.zeros((pool,), jnp.float32)
                                for _ in range(6)]
        return dict(s, **out)

    # Unrolling the walk rounds lets XLA fuse across round boundaries and
    # shave launch gaps — measured (v5e, quick suite): unroll=4 lifts
    # 49k 8.43->8.53, 200k 5.27->5.39, inst field 6.61->6.66, but LOSES on
    # the 5-level 1M table (4.13->3.95; full unroll also lost at 49k,
    # 8.34), so deep tables keep the rolled loop.
    round_unroll = 4 if n_levels <= 5 else False
    if _os.environ.get("RT3C_ROUND_UNROLL", ""):  # A/B override
        _v = int(_os.environ["RT3C_ROUND_UNROLL"])
        round_unroll = _v if _v > 1 else False

    def super_step(i, s):
        # boundary (drains lanes the previous rounds finished), then K
        # unconditional walk rounds: no lax.cond around the full state, so
        # XLA neither copies carried buffers for an identity branch nor
        # pays per-round branch dispatch.
        s = boundary(s)
        return jax.lax.fori_loop(
            0, k_phase, lambda j, st: pipe.walk_round(st), s,
            unroll=round_unroll)

    # the framebuffer(s) live ONLY in the outer while carry (they are
    # untouched between flushes; keeping them out of the middle/inner fori
    # carries is free and measured perf-neutral — XLA already aliased them)
    _IMG_KEYS = tuple(k for k, _c in _IMGS)

    def outer(s):
        s = flush_stage(s)
        lanes = {k: v for k, v in s.items() if k not in _IMG_KEYS}
        lanes = jax.lax.fori_loop(0, flush_n, super_step, lanes,
                                  unroll=False)
        lanes["n_round"] = lanes["n_round"] + flush_n * k_phase
        return dict(lanes, **{k: s[k] for k in _IMG_KEYS})

    s = jax.lax.while_loop(cond, outer, state)

    # drain both retire paths: the stash and any lane still parked with a
    # completed pixel in its misc accumulator
    mc = s["mc"]
    pixel = mc[13]
    flushm = pixel >= 0
    target = jnp.where(flushm, pixel.astype(jnp.int32) - pixel_base,
                       n_pix + 1)
    sp = s["stash_px"]
    starget = jnp.where(sp >= 0, sp.astype(jnp.int32) - pixel_base,
                        n_pix + 1)
    inv_spp = 1.0 / jnp.float32(spp)

    def final_img(key, c, stash_vals):
        img = s[key].at[starget].add(jnp.stack(stash_vals, axis=1),
                                     mode="drop", unique_indices=True)
        img = img.at[target].add(jnp.stack(mc[c:c + 3], axis=1),
                                 mode="drop", unique_indices=True)
        return img[:n_pix] * inv_spp

    rgb = final_img("image", 10, s["stash_rgb"])
    aov = ((final_img("image_alb", 16, s["stash_aov"][:3]),
            final_img("image_nrm", 19, s["stash_aov"][3:]))
           if cfg.aov else None)
    return rgb, aov, s["n_rad"], s["n_shad"].astype(jnp.int32), s["n_round"]


def _render_pipepool(scene, cfg: RenderConfig, cam, pipe: WalkPoolPipeline,
                     pixel_idx, subframe_index, paths: int = 2):
    """Software-pipelined walk pool: P paths per lane, one walk scratch.

    The classic walk pool's lanes idle between finishing a walk and the
    next phase boundary (mean ~6 visits vs K=16 rounds -> ~50% of the
    gather-floor-bound rounds are wasted; ROADMAP item 1). Here each lane
    time-shares its walk scratch between TWO independent paths: when a
    walk finishes (its pop comes up empty), the round's end STASHES the
    result into the owning path's columns and the next round's start
    LAUNCHES the sibling path's pending ray — zero idle rounds between
    walks as long as either path has work. The boundary shades/gates each
    path separately (same kernel, same RNG stream per path as the classic
    pool, so per-pixel results are bit-identical to _render_walkpool).

    Measured add-on cost of the in-round stash+launch is ~1 us/round at
    W=8192 (exp/exp_pipecost.py); the win is utilization: lane-rounds per
    walk drop from ~12 toward the ~6-visit mean.

    Serves static / 2-key-motion scenes AND trace-time instanced TLAS
    walks (the scratch then carries the current-space ray + instance
    state, reset to world at every launch)."""
    from ..trace.pallas_shade import take_packed
    from .path import _camera_ray, _lcg_advance_table, _next_pow2

    instanced = pipe.instanced
    # baked world-space tables shade as instanced but WALK as plain
    # hierwalk (no per-lane space state; hits decode at the stash step)
    spacewalk = instanced and pipe.inst_stride == 0
    motion = pipe.motion
    misc_w = pipe.misc_w
    n_levels = pipe.n_levels
    num_faces = pipe.num_faces
    # Inline shadow gating (see pipe_round's stash step) trades ~16 extra
    # per-round selects for the held-walk boundary waits. Measured on v5e:
    # 49k field 19.4 -> 20.7-21.1, 200k town ~par (11.8). The 5-level
    # tables (1M DP-grouped dirs) need the FULL combination — gate + x4
    # round unroll + K=16 — measured r5: base 9.3, gate alone 9.1, gate+
    # unroll 10.1, gate+unroll+K16 12.7 Mray/s; gate without unroll loses
    # (every extra op is a launch gap in a rolled loop), so both flip
    # together on n_levels <= 5.
    inline_gate = n_levels <= 5
    if _os.environ.get("RT3C_INLINE_GATE", "") in ("0", "1"):
        inline_gate = _os.environ["RT3C_INLINE_GATE"] == "1"  # A/B override
    n_pix = pixel_idx.shape[0]
    pool = min(cfg.ray_block, _next_pow2(n_pix * cfg.samples_per_launch))
    pool = max(pool, 256)
    spp = cfg.samples_per_launch
    # auto cadence: deep tables walk longer per node, so the doubled
    # boundary amortizes over more rounds (v5e, W=8192, K 16/32: 49k field
    # 13.04/12.12, 200k town 9.39/9.13, 1M town 6.71/7.34 Mray/s). With
    # the inline shadow gate each path feeds the scratch ~2 walks per
    # window, so K=16 beats the old variable-ordered K=12 (49k 20.7 vs
    # 20.3). K must stay a multiple of the 4x round unroll (K=14/10
    # measured 16.4/14.8).
    if cfg.walk_phase_every < 0:
        raise ValueError("walk_phase_every must be >= 0 (0 = auto); a "
                         "negative K runs zero rounds per phase and the "
                         "pool loop never terminates")
    if cfg.walk_phase_every:
        k_phase = cfg.walk_phase_every
    elif n_levels > 5:
        # only tables too deep for the inline gate + x4 unroll amortize
        # the boundary over 32 rounds; gated/unrolled tables want K=16
        # (r5, 1M 5-level: K 16/24/32 = 12.7/11.4/10.1)
        k_phase = 32
    elif spacewalk:
        # instanced TLAS walks run longer per node (space switches), so
        # the boundary amortizes over more rounds (v5e K 16/20/24 on the
        # 562k tower field: 12.8/13.0/12.2; motion 10.8/10.9)
        k_phase = 20
    else:
        k_phase = 16
    flush_n = _flush_n(cfg)
    # capacity-2 retire stash (default on; RT3C_STASH2=0 reverts): a
    # second dense slot catches same-window double completions that would
    # otherwise park the lane until the flush. Slot 2 rolls into slot 1
    # at each flush (no extra scatter) and images stay BIT-identical
    # (per-pixel RNG is keyed by pixel id, so only lane scheduling moves).
    # Measured v5e at the default cadence 8: 49k 22.2 -> 22.6, 200k
    # 15.4 -> 15.8, textured 14.4 -> 15.0, 1M 12.7 -> 13.0, motion
    # instances 11.4 -> 11.7, baked instances par. It does NOT recover
    # longer cadences (S2+f16 still -4..-30% — the flush-16 cliff is not
    # parking alone; ROADMAP r6 item 4). AOV renders keep capacity 1
    # (slot 2 carries no aov columns).
    stash2 = (_os.environ.get("RT3C_STASH2", "1") == "1"
              and not cfg.aov)
    width = jnp.float32(cfg.width)
    height = jnp.float32(cfg.height)
    jump = _lcg_advance_table(spp)
    pixel_base = pixel_idx[0]
    P = paths

    def _mc0():
        return [jnp.full((pool,), -1.0, jnp.float32) if c == 13
                else jnp.zeros((pool,), jnp.float32) for c in range(misc_w)]

    state = dict(
        # shared walk scratch (one in-flight walk per lane)
        rays=jnp.zeros((pool, 8), jnp.float32),
        wtime=jnp.zeros((pool,), jnp.float32),
        cur=jnp.full((pool,), -1, jnp.int32),
        wslot=jnp.full((pool,), -1, jnp.int32),   # owning path, -1 = idle
        wmode=jnp.zeros((pool,), bool),
        wfound=jnp.zeros((pool,), bool),
        wb_t=jnp.full((pool,), jnp.float32(cfg.primary_tmax)),
        wb_prim=jnp.full((pool,), -1, jnp.int32),
        wb_u=jnp.zeros((pool,), jnp.float32),
        wb_v=jnp.zeros((pool,), jnp.float32),
        ents=[jnp.full((pool, pipe.fanout), jnp.float32(_BIG))
              for _ in range(n_levels)],
        bases=[jnp.zeros((pool,), jnp.int32) for _ in range(n_levels)],
        **({} if not spacewalk else dict(
            # instanced TLAS walk: current-space ray + instance ids
            o_cur=jnp.zeros((pool, 3), jnp.float32),
            d_cur=jnp.zeros((pool, 3), jnp.float32),
            inst_cur=jnp.full((pool,), -1, jnp.int32),
            wb_inst=jnp.full((pool,), -1, jnp.int32),
        )),
        # per-path packed state (same column layout as the classic pool)
        mc=[_mc0() for _ in range(P)],
        nrays=[jnp.zeros((pool, 8), jnp.float32) for _ in range(P)],
        nee=[[jnp.zeros((pool,), jnp.float32) for _ in range(3)]
             for _ in range(P)],
        # pending walk per path (ready to take the scratch)
        pray=[jnp.zeros((pool, 8), jnp.float32) for _ in range(P)],
        ptime=[jnp.zeros((pool,), jnp.float32) for _ in range(P)],
        pmode=[jnp.zeros((pool,), bool) for _ in range(P)],
        pvalid=[jnp.zeros((pool,), bool) for _ in range(P)],
        # bounce motion-time, drawn at shade (consumed by the inline gate)
        btime=[jnp.zeros((pool,), jnp.float32) for _ in range(P)],
        # finished-walk stash per path (awaits the boundary)
        hray=[jnp.zeros((pool, 8), jnp.float32) for _ in range(P)],
        ht=[jnp.full((pool,), jnp.float32(cfg.primary_tmax))
            for _ in range(P)],
        hprim=[jnp.full((pool,), -1, jnp.int32) for _ in range(P)],
        hu=[jnp.zeros((pool,), jnp.float32) for _ in range(P)],
        hv=[jnp.zeros((pool,), jnp.float32) for _ in range(P)],
        hfound=[jnp.zeros((pool,), bool) for _ in range(P)],
        hmode=[jnp.zeros((pool,), bool) for _ in range(P)],
        hvalid=[jnp.zeros((pool,), bool) for _ in range(P)],
        **({} if not instanced else dict(
            hinst=[jnp.full((pool,), -1, jnp.int32) for _ in range(P)],
        )),
        # shared retire stash + framebuffer(s)
        stash_px=jnp.full((pool,), -1.0, jnp.float32),
        stash_rgb=[jnp.zeros((pool,), jnp.float32) for _ in range(3)],
        **({} if not stash2 else dict(
            stash2_px=jnp.full((pool,), -1.0, jnp.float32),
            stash2_rgb=[jnp.zeros((pool,), jnp.float32)
                        for _ in range(3)],
        )),
        image=jnp.zeros((n_pix + 1, 3), jnp.float32),
        next_work=jnp.zeros((), jnp.int32),
        # traversal rounds executed (roofline accounting: rows gathered =
        # n_round * pool; surfaced as RenderStats.walk_rounds)
        n_round=jnp.zeros((), jnp.int32),
        n_rad=jnp.zeros((), jnp.int32),
        n_shad=jnp.zeros((), jnp.float32),
    )
    if cfg.aov:
        state.update(
            image_alb=jnp.zeros((n_pix + 1, 3), jnp.float32),
            image_nrm=jnp.zeros((n_pix + 1, 3), jnp.float32),
            stash_aov=[jnp.zeros((pool,), jnp.float32) for _ in range(6)],
        )
    if _WP_STATS:
        state.update(
            zn_round=jnp.zeros((), jnp.float32),   # walk rounds run
            zn_walk=jnp.zeros((), jnp.float32),    # lane-rounds walking
            zn_shade=jnp.zeros((), jnp.float32),   # lanes shaded (m_a)
            zn_bnd=jnp.zeros((), jnp.float32),     # boundary-path passes
            zn_pend=jnp.zeros((), jnp.float32),    # lane-rounds w/ pending
            zn_launch=jnp.zeros((), jnp.float32),  # walks launched
            zn_held=jnp.zeros((), jnp.float32),    # lane-rounds w/ held walk
        )
    _IMGS = ((("image", 10), ("image_alb", 16), ("image_nrm", 19))
             if cfg.aov else (("image", 10),))

    def cond(s):
        pend = s["cur"] >= 0
        for p in range(P):
            mc = s["mc"][p]
            pend = (pend | s["pvalid"][p] | s["hvalid"][p]
                    | ((mc[13] >= 0) & (mc[14] < spp)))
        return (s["next_work"] < n_pix) | jnp.any(pend)

    def pipe_round(s):
        # ---- launch: fill free scratch lanes from pending paths ----
        free = s["cur"] < 0
        ls = []
        taken = None
        for p in range(P):
            lp = free & s["pvalid"][p]
            if taken is not None:
                lp = lp & ~taken
            taken = lp if taken is None else taken | lp
            ls.append(lp)
        start = taken
        pray_sel = s["pray"][0]
        ptime_sel = s["ptime"][0]
        pmode_sel = s["pmode"][0]
        wslot = jnp.where(ls[0], 0, s["wslot"])
        for p in range(1, P):
            pray_sel = jnp.where(ls[p][:, None], s["pray"][p], pray_sel)
            ptime_sel = jnp.where(ls[p], s["ptime"][p], ptime_sel)
            pmode_sel = jnp.where(ls[p], s["pmode"][p], pmode_sel)
            wslot = jnp.where(ls[p], p, wslot)
        rays = jnp.where(start[:, None], pray_sel, s["rays"])
        s2 = dict(
            s,
            rays=rays,
            wtime=jnp.where(start, ptime_sel, s["wtime"]),
            wmode=jnp.where(start, pmode_sel, s["wmode"]),
            wslot=wslot,
            wfound=s["wfound"] & ~start,
            wb_t=jnp.where(start, rays[:, 7], s["wb_t"]),
            wb_prim=jnp.where(start, -1, s["wb_prim"]),
            cur=jnp.where(start, 0, s["cur"]),
            # no ents reset: the walk round's pop write-back persists its
            # pruning, so a finished walk leaves its ents all-_BIG
            pvalid=[s["pvalid"][p] & ~ls[p] for p in range(P)],
            **({} if not spacewalk else dict(
                # every walk (closest or shadow) launches in world space
                o_cur=jnp.where(start[:, None], rays[:, 0:3], s["o_cur"]),
                d_cur=jnp.where(start[:, None], rays[:, 3:6], s["d_cur"]),
                inst_cur=jnp.where(start, -1, s["inst_cur"]),
                wb_inst=jnp.where(start, -1, s["wb_inst"]),
            )),
        )
        if _WP_STATS:
            s2["zn_round"] = s2["zn_round"] + 1.0
            s2["zn_walk"] = s2["zn_walk"] + jnp.sum(
                (s2["cur"] >= 0).astype(jnp.float32))
            pend = s["pvalid"][0]
            for p in range(1, P):
                pend = pend | s["pvalid"][p]
            s2["zn_pend"] = s2["zn_pend"] + jnp.sum(
                pend.astype(jnp.float32))
            s2["zn_launch"] = s2["zn_launch"] + jnp.sum(
                start.astype(jnp.float32))
            held = s["hvalid"][0]
            for p in range(1, P):
                held = held | s["hvalid"][p]
            s2["zn_held"] = s2["zn_held"] + jnp.sum(
                held.astype(jnp.float32))

        # ---- one traversal round ----
        s2 = pipe.walk_round(s2)

        # ---- stash: finished CLOSEST walks park in the owning path's
        # columns for the boundary's shade kernel. Finished SHADOW walks
        # gate INLINE instead (the NEE add + bounce pend need no kernel):
        # the path streams closest -> shadow -> bounce without waiting
        # K rounds at a boundary just to run three selects — measured
        # walk_util 0.46 -> ~0.9 at the bench spp (the held-walk wait was
        # ~40% of all lane-rounds). Per-path arithmetic and RNG stream
        # order are unchanged (the shade kernel already drew the RR value;
        # the bounce-time draw below sits at the same stream position the
        # boundary's launch draw had), so results stay bit-identical to
        # the classic pool per path.
        fin = (s2["cur"] < 0) & (s2["wslot"] >= 0)
        fin_sh = fin & s2["wmode"] if inline_gate else jnp.zeros_like(fin)
        fin_cl = fin & ~fin_sh
        f = [fin_cl & (s2["wslot"] == p) for p in range(P)]
        fs = [fin_sh & (s2["wslot"] == p) for p in range(P)]
        if pipe.inst_stride:
            # baked world table: leaf hits carry eff = inst*stride + face;
            # decode here so the boundary/shade sees (face, instance) ids
            # identical to the space-switching walk's
            eff = s2["wb_prim"]
            w_inst = jnp.where(eff >= 0, eff // pipe.inst_stride, -1)
            w_prim = jnp.where(eff >= 0, eff - w_inst * pipe.inst_stride,
                               -1)
        else:
            w_prim = s2["wb_prim"]
            w_inst = s2["wb_inst"] if instanced else None
        out = dict(
            s2,
            wslot=jnp.where(fin, -1, s2["wslot"]),
            hray=[jnp.where(f[p][:, None], s2["rays"], s2["hray"][p])
                  for p in range(P)],
            ht=[jnp.where(f[p], s2["wb_t"], s2["ht"][p]) for p in range(P)],
            hprim=[jnp.where(f[p], w_prim, s2["hprim"][p])
                   for p in range(P)],
            hu=[jnp.where(f[p], s2["wb_u"], s2["hu"][p]) for p in range(P)],
            hv=[jnp.where(f[p], s2["wb_v"], s2["hv"][p]) for p in range(P)],
            hfound=[jnp.where(f[p], s2["wfound"], s2["hfound"][p])
                    for p in range(P)],
            hmode=[jnp.where(f[p], s2["wmode"], s2["hmode"][p])
                   for p in range(P)],
            hvalid=[s2["hvalid"][p] | f[p] for p in range(P)],
            **({} if not instanced else dict(
                hinst=[jnp.where(f[p], w_inst, s2["hinst"][p])
                       for p in range(P)],
            )),
        )
        if not inline_gate:
            return out
        # inline gate per path: add the pending NEE term unless the shadow
        # probe found an occluder, then pend the stashed bounce ray (alive
        # paths only; retired paths wait for the boundary's refill). The
        # bounce's motion-time draw already happened at shade time (btime,
        # same RNG stream position: no draws occur between the shade and
        # the classic launch) and the bounce was counted into n_rad there,
        # so the inline part is pure selects — no per-round RNG/reductions.
        for p in range(P):
            gate = fs[p] & ~s2["wfound"]
            mc = list(out["mc"][p])
            for j in range(3):
                mc[10 + j] = mc[10 + j] + jnp.where(gate, s2["nee"][p][j],
                                                    0.0)
            cont = fs[p] & (mc[9] > 0)
            out["mc"] = _replace_at(out["mc"], p, mc)
            out["pray"] = _replace_at(
                out["pray"], p,
                jnp.where(cont[:, None], s2["nrays"][p], out["pray"][p]))
            out["ptime"] = _replace_at(
                out["ptime"], p,
                jnp.where(cont, s2["btime"][p], out["ptime"][p]))
            out["pmode"] = _replace_at(
                out["pmode"], p, out["pmode"][p] & ~cont)
            out["pvalid"] = _replace_at(
                out["pvalid"], p, out["pvalid"][p] | cont)
        return out

    def boundary(s):
        s = dict(s)
        for p in range(P):
            s = _boundary_path(s, p)
        return s

    def _boundary_path(s, p):
        mc = list(s["mc"][p])

        # ---- phase A: shade this path if its closest walk finished ----
        m_a = s["hvalid"][p] & ~s["hmode"][p]
        valid = m_a & (s["hprim"][p] >= 0) & (s["hprim"][p] < num_faces)
        hit_t = jnp.where(valid, s["ht"][p], s["hray"][p][:, 7])
        hit_prim = jnp.where(valid, s["hprim"][p], -1)
        if instanced:
            hit_inst = jnp.where(valid, s["hinst"][p], -1)
            tail4 = jnp.concatenate(
                [hit_inst.astype(jnp.float32)[:, None],
                 jnp.zeros((pool, 3), jnp.float32)], axis=1)
        else:
            tail4 = jnp.zeros((pool, 4), jnp.float32)
        hit8 = jnp.concatenate(
            [hit_t[:, None], hit_prim.astype(jnp.float32)[:, None],
             jnp.where(valid, s["hu"][p], 0.0)[:, None],
             jnp.where(valid, s["hv"][p], 0.0)[:, None],
             tail4], axis=1)
        misc_in = jnp.stack(
            mc[:9] + [m_a.astype(jnp.float32)] + mc[10:], axis=0)
        hit_u = jnp.where(valid, s["hu"][p], 0.0)
        hit_v = jnp.where(valid, s["hv"][p], 0.0)
        if pipe.kernel and instanced:
            from ..trace.pallas_shade import instanced_attr_t

            attr_t = instanced_attr_t(pipe.attr_rows, pipe.attr_w,
                                      pipe.inst_it, hit_prim, hit_inst,
                                      presample=pipe.presample,
                                      bu=hit_u, bv=hit_v)
        elif pipe.kernel:
            attr_g = take_packed(pipe.attr_rows, jnp.maximum(hit_prim, 0),
                                 pipe.attr_w)
            if pipe.presample is not None:
                attr_g = jnp.concatenate(
                    [attr_g, pipe.presample(attr_g, hit_u, hit_v)], axis=1)
            attr_t = jnp.transpose(attr_g, (1, 0))
        else:
            attr_t = None
        rays2, misc_e, sh = pipe.shade(s["hray"][p], hit8, misc_in, attr_t,
                                       pool)

        me = [misc_e[c] for c in range(misc_w + 3)]
        mc = [jnp.where(m_a, me[c], mc[c]) for c in range(misc_w)]
        nrays = jnp.where(m_a[:, None], rays2, s["nrays"][p])
        nee = [jnp.where(m_a, me[misc_w + j], s["nee"][p][j])
               for j in range(3)]
        want_shadow = m_a & (me[15] > 0)
        n_shad = s["n_shad"] + jnp.sum(jnp.where(m_a, me[15], 0.0))

        if inline_gate:
            # bounce-time draw for shadow-bearing segments, done HERE at
            # the same RNG stream position the classic launch draw has (no
            # draws occur on this path between the shade and its bounce
            # launch); the stash-step inline gate then pends the bounce
            # with this time and zero per-round RNG work. The masked draws
            # (want_shadow vs cont|take) touch disjoint lanes, so their
            # order is irrelevant.
            seed_b = jax.lax.bitcast_convert_type(mc[0], jnp.uint32)
            seed_b, t_b = rng.rnd_masked(seed_b, want_shadow)
            mc[0] = jax.lax.bitcast_convert_type(seed_b, jnp.float32)
            btime = jnp.where(want_shadow, t_b, s["btime"][p])
        else:
            btime = s["btime"][p]

        # ---- pend the shadow walk ----
        pray = jnp.where(want_shadow[:, None], sh[:, 0:8], s["pray"][p])
        ptime = jnp.where(
            want_shadow, sh[:, 8] if pipe.shadow_w == 16 else 0.0,
            s["ptime"][p])
        pmode = jnp.where(m_a, want_shadow, s["pmode"][p])
        pvalid = s["pvalid"][p] | want_shadow

        # ---- phase C: gate the pending NEE, bounce or retire ----
        sh_done = s["hvalid"][p] & s["hmode"][p]
        m_c = sh_done | (m_a & ~want_shadow)
        gate = m_c & ~(s["hfound"][p] & sh_done)
        acc = [mc[10 + j] + jnp.where(gate, nee[j], 0.0) for j in range(3)]
        aacc = mc[16:22] if cfg.aov else None
        cont = m_c & (mc[9] > 0)
        pray = jnp.where(cont[:, None], nrays, pray)
        pmode = pmode & ~cont
        pvalid = pvalid | cont
        hvalid = s["hvalid"][p] & ~(m_a | sh_done)

        # ---- retire + refill (shared stash/work counter) ----
        pixel = mc[13]
        samp = mc[14]
        walking_p = (s["cur"] >= 0) & (s["wslot"] == p)
        idle = ~pvalid & ~hvalid & ~walking_p
        completed = idle & (pixel >= 0) & (samp >= spp)
        can_stash = completed & (s["stash_px"] < 0)
        stash_px = jnp.where(can_stash, pixel, s["stash_px"])
        stash_rgb = [jnp.where(can_stash, acc[j], s["stash_rgb"][j])
                     for j in range(3)]
        acc = [jnp.where(can_stash, 0.0, acc[j]) for j in range(3)]
        if cfg.aov:
            stash_aov = [jnp.where(can_stash, aacc[j], s["stash_aov"][j])
                         for j in range(6)]
            aacc = [jnp.where(can_stash, 0.0, aacc[j]) for j in range(6)]
        if stash2:
            can_s2 = completed & ~can_stash & (s["stash2_px"] < 0)
            stash2_px = jnp.where(can_s2, pixel, s["stash2_px"])
            stash2_rgb = [jnp.where(can_s2, acc[j], s["stash2_rgb"][j])
                          for j in range(3)]
            acc = [jnp.where(can_s2, 0.0, acc[j]) for j in range(3)]
            freed = can_stash | can_s2
        else:
            freed = can_stash
        pixel = jnp.where(freed, -1.0, pixel)
        samp = jnp.where(freed, 0.0, samp)
        fresh = idle & (pixel < 0)
        rank = jnp.cumsum(fresh.astype(jnp.int32)) - 1
        wpix = s["next_work"] + rank
        take_px = fresh & (wpix < n_pix)
        pixel = jnp.where(
            take_px,
            (pixel_base + jnp.clip(wpix, 0, n_pix - 1)).astype(jnp.float32),
            pixel)
        samp = jnp.where(take_px, 0.0, samp)
        next_work = s["next_work"] + jnp.sum(take_px.astype(jnp.int32))

        take = idle & (pixel >= 0) & (samp < spp)
        samp_rng = samp.astype(jnp.int32)
        samp = jnp.where(take, samp + 1.0, samp)
        new_pixel = jnp.maximum(pixel, 0.0).astype(jnp.int32)

        st = rng.tea(new_pixel.astype(jnp.uint32), subframe_index)
        if cfg.seed:
            st = rng.rot_seed(st, jnp.uint32(cfg.seed))
        aj = jnp.full((pool,), int(jump[0, 0]), jnp.uint32)
        cj = jnp.full((pool,), int(jump[0, 1]), jnp.uint32)
        for si in range(1, spp):
            sel = samp_rng == si
            aj = jnp.where(sel, jnp.uint32(int(jump[si, 0])), aj)
            cj = jnp.where(sel, jnp.uint32(int(jump[si, 1])), cj)
        st = aj * st + cj
        st, jx = rng.rnd(st)
        st, jy = rng.rnd(st)
        px = new_pixel % cfg.width
        py = new_pixel // cfg.width
        cam_org, cam_dir = _camera_ray(cam, px, py, jx, jy, width, height)

        take2 = take[:, None]
        launch = cont | take
        seed_u = jnp.where(
            take, st, jax.lax.bitcast_convert_type(mc[0], jnp.uint32))
        seed_u, t_draw = rng.rnd_masked(seed_u, launch)
        mc = ([jax.lax.bitcast_convert_type(seed_u, jnp.float32)]
              + [jnp.where(take, 1.0, mc[c]) for c in (1, 2, 3, 4, 5, 6)]
              + [jnp.where(take, 0.0, mc[7]),
                 jnp.where(take, 0.0, mc[8]),
                 jnp.where(take, 1.0, mc[9])]
              + acc
              + [pixel, samp, mc[15]]
              + (aacc + mc[22:misc_w] if cfg.aov else []))

        cam8 = jnp.concatenate([
            cam_org, cam_dir,
            jnp.full((pool, 1), jnp.float32(cfg.primary_tmin)),
            jnp.full((pool, 1), jnp.float32(cfg.primary_tmax)),
        ], axis=1)
        pray = jnp.where(take2, cam8, pray)
        ptime = jnp.where(launch, t_draw, ptime)
        pmode = pmode & ~take
        pvalid = pvalid | take
        # count the future inline-gated bounce launch now (want_shadow &
        # alive lanes WILL bounce when their shadow walk finishes — shadow
        # walks always complete before the pool drains)
        bounce_later = (want_shadow & (mc[9] > 0)) if inline_gate \
            else jnp.zeros_like(want_shadow)
        n_rad = s["n_rad"] + jnp.sum(
            (launch | bounce_later).astype(jnp.int32))

        def _set(key, val):
            lst = list(s[key])
            lst[p] = val
            return lst

        out = dict(
            s,
            mc=_set("mc", mc), nrays=_set("nrays", nrays),
            nee=_set("nee", nee),
            pray=_set("pray", pray), ptime=_set("ptime", ptime),
            pmode=_set("pmode", pmode), pvalid=_set("pvalid", pvalid),
            btime=_set("btime", btime),
            hvalid=_set("hvalid", hvalid),
            stash_px=stash_px, stash_rgb=stash_rgb,
            **({} if not stash2 else dict(stash2_px=stash2_px,
                                          stash2_rgb=stash2_rgb)),
            next_work=next_work, n_rad=n_rad, n_shad=n_shad,
        )
        if cfg.aov:
            out["stash_aov"] = stash_aov
        if _WP_STATS:
            out["zn_shade"] = s["zn_shade"] + jnp.sum(
                m_a.astype(jnp.float32))
            out["zn_bnd"] = s["zn_bnd"] + 1.0
        return out

    def flush_stage(s):
        stash_px = s["stash_px"]
        have = stash_px >= 0
        target = jnp.where(have, stash_px.astype(jnp.int32) - pixel_base,
                           n_pix + 1)
        accs = ((jnp.stack(s["stash_rgb"], axis=1),)
                + ((jnp.stack(s["stash_aov"][:3], axis=1),
                    jnp.stack(s["stash_aov"][3:], axis=1))
                   if cfg.aov else ()))
        out = {
            k: s[k].at[target].add(a, mode="drop", unique_indices=True)
            for (k, _c), a in zip(_IMGS, accs)
        }
        if stash2:
            # slot 2 rolls into the just-cleared slot 1 (a dense lane-wise
            # move, no extra scatter); its entries wait <= 1 extra window
            out["stash_px"] = s["stash2_px"]
            out["stash_rgb"] = list(s["stash2_rgb"])
            out["stash2_px"] = jnp.full((pool,), -1.0, jnp.float32)
            out["stash2_rgb"] = [jnp.zeros((pool,), jnp.float32)
                                 for _ in range(3)]
        else:
            out["stash_px"] = jnp.full((pool,), -1.0, jnp.float32)
            out["stash_rgb"] = [jnp.zeros((pool,), jnp.float32)
                                for _ in range(3)]
        if cfg.aov:
            out["stash_aov"] = [jnp.zeros((pool,), jnp.float32)
                                for _ in range(6)]
        if _WP_STATS:
            jax.debug.print(
                "FLUSH walking={w} pend0={p0} pend1={p1} "
                "held0={h0} held1={h1} live0={l0} live1={l1} next={nw}",
                                w=jnp.sum(s["cur"] >= 0),
                p0=jnp.sum(s["pvalid"][0]), p1=jnp.sum(s["pvalid"][-1]),
                h0=jnp.sum(s["hvalid"][0]), h1=jnp.sum(s["hvalid"][-1]),
                l0=jnp.sum((s["mc"][0][13] >= 0) & (s["mc"][0][14] < spp)),
                l1=jnp.sum((s["mc"][-1][13] >= 0) & (s["mc"][-1][14] < spp)),
                nw=s["next_work"])
        return dict(s, **out)

    round_unroll = 4 if n_levels <= 5 else False
    if _os.environ.get("RT3C_ROUND_UNROLL", ""):  # A/B override
        _v = int(_os.environ["RT3C_ROUND_UNROLL"])
        round_unroll = _v if _v > 1 else False

    def super_step(i, s):
        s = boundary(s)
        return jax.lax.fori_loop(
            0, k_phase, lambda j, st: pipe_round(st), s,
            unroll=round_unroll)

    _IMG_KEYS = tuple(k for k, _c in _IMGS)

    def outer(s):
        s = flush_stage(s)
        lanes = {k: v for k, v in s.items() if k not in _IMG_KEYS}
        lanes = jax.lax.fori_loop(0, flush_n, super_step, lanes,
                                  unroll=False)
        lanes["n_round"] = lanes["n_round"] + flush_n * k_phase
        return dict(lanes, **{k: s[k] for k in _IMG_KEYS})

    s = jax.lax.while_loop(cond, outer, state)
    if _WP_STATS:
        jax.debug.print(
            "WPSTATS W={w} rounds={r} walk_util={u:.3f} walks={k} "
            "visits/walk={v:.2f} shades={sh} shade/bnd-pass={sb:.3f}",
            w=pool, r=s["zn_round"],
            u=s["zn_walk"] / jnp.maximum(s["zn_round"] * pool, 1.0),
            k=s["n_rad"] + s["n_shad"].astype(jnp.int32),
            v=s["zn_walk"] / jnp.maximum(
                s["n_rad"].astype(jnp.float32) + s["n_shad"], 1.0),
            sh=s["zn_shade"],
            sb=s["zn_shade"] / jnp.maximum(s["zn_bnd"] * pool, 1.0))
        jax.debug.print(
            "WPSTATS2 pend_frac={p:.3f} held_frac={h:.3f} launches={l}",
            p=s["zn_pend"] / jnp.maximum(s["zn_round"] * pool, 1.0),
            h=s["zn_held"] / jnp.maximum(s["zn_round"] * pool, 1.0),
            l=s["zn_launch"])

    # drain: the retire stash + every path still parked with a completed
    # pixel in its misc accumulator
    sp = s["stash_px"]
    starget = jnp.where(sp >= 0, sp.astype(jnp.int32) - pixel_base,
                        n_pix + 1)
    if stash2:
        sp2 = s["stash2_px"]
        s2target = jnp.where(sp2 >= 0, sp2.astype(jnp.int32) - pixel_base,
                             n_pix + 1)
    ptargets = []
    for p in range(P):
        pixel = s["mc"][p][13]
        ptargets.append(jnp.where(pixel >= 0,
                                  pixel.astype(jnp.int32) - pixel_base,
                                  n_pix + 1))
    inv_spp = 1.0 / jnp.float32(spp)

    def final_img(key, c, stash_vals):
        img = s[key].at[starget].add(jnp.stack(stash_vals, axis=1),
                                     mode="drop", unique_indices=True)
        if stash2 and key == "image":
            img = img.at[s2target].add(
                jnp.stack(s["stash2_rgb"], axis=1),
                mode="drop", unique_indices=True)
        for p in range(P):
            img = img.at[ptargets[p]].add(
                jnp.stack(s["mc"][p][c:c + 3], axis=1),
                mode="drop", unique_indices=True)
        return img[:n_pix] * inv_spp

    rgb = final_img("image", 10, s["stash_rgb"])
    aov = ((final_img("image_alb", 16, s["stash_aov"][:3]),
            final_img("image_nrm", 19, s["stash_aov"][3:]))
           if cfg.aov else None)
    return rgb, aov, s["n_rad"], s["n_shad"].astype(jnp.int32), s["n_round"]
