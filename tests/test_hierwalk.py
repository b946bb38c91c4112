"""Hierarchical gather-walk tracer vs the brute-force oracle.

Same contract as every tracer: (closest, any)(o, d, tmin, tmax, time,
count). The walk must agree with brute force exactly on prim ids (both
resolve min-t with lowest-prim tiebreak within a leaf; across leaves min-t
is unambiguous for non-degenerate scenes) and on the occlusion mask.
"""
import numpy as np
import pytest

from rendertoy3c_tpu.accel.lbvh import split_order_scene
from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box, quad
from rendertoy3c_tpu.scene.material import Material
from rendertoy3c_tpu.scene.mesh import Mesh
from rendertoy3c_tpu.scene.scene import build_scene
from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF, make_hierwalk_tracer
from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer


def _box_field(n_side, seed=0):
    rng = np.random.default_rng(seed)
    white = Material(diffuse=(0.7, 0.7, 0.7))
    v_all, f_all, off = [], [], 0
    for gx in range(n_side):
        for gz in range(n_side):
            m = box_mesh(
                [gx - n_side / 2, 0, gz - n_side / 2],
                [gx - n_side / 2 + 0.8, rng.uniform(0.3, 2.0),
                 gz - n_side / 2 + 0.8], white)
            v_all.append(m.vertices[0])
            f_all.append(m.indices + off)
            off += m.vertices.shape[1]
    big = Mesh(vertices=np.concatenate(v_all)[None],
               indices=np.concatenate(f_all), material=white)
    lv, lf = quad([-3, 9, -3], [-3, 9, 3], [3, 9, 3], [3, 9, -3])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(30.0, 30.0, 30.0)))
    return build_scene([big, lamp])


def _rand_rays(scene, n, seed=1):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    g = scene.geom
    v0 = np.asarray(g.v0[0][: scene.num_faces])
    lo = v0.min(axis=0) - 1.0
    hi = v0.max(axis=0) + 1.0
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(scene, n_rays=2048, seed=2, count=None):
    import jax.numpy as jnp

    scene = split_order_scene(scene, leaf=HIER_LEAF)
    hc, ha = make_hierwalk_tracer(scene)
    bc, ba = make_bruteforce_tracer(scene)
    o, d = _rand_rays(scene, n_rays, seed)
    tmin, tmax = 1e-3, 1e16
    h = hc(o, d, tmin, tmax, None, count)
    b = bc(o, d, tmin, tmax, None, count)
    n_live = n_rays if count is None else count
    np.testing.assert_array_equal(np.asarray(h.prim)[:n_live],
                                  np.asarray(b.prim)[:n_live])
    np.testing.assert_allclose(np.asarray(h.t)[:n_live],
                               np.asarray(b.t)[:n_live], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.u)[:n_live],
                               np.asarray(b.u)[:n_live], rtol=2e-4, atol=2e-4)
    # any-hit with a bounded range (shadow-probe shape)
    occ_h = np.asarray(ha(o, d, tmin, 5.0, None, count))
    occ_b = np.asarray(ba(o, d, tmin, 5.0, None, count))
    np.testing.assert_array_equal(occ_h[:n_live], occ_b[:n_live])


def test_cornell_single_leaf_levels():
    """36 faces -> 3 leaves, one directory level."""
    meshes, _ = cornell_box()
    _check(build_scene(meshes))


def test_tiny_scene_single_row():
    """<= 13 faces -> the root IS the single leaf row (zero levels)."""
    lv, lf = quad([-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1])
    m = Mesh(vertices=lv[None], indices=lf,
             material=Material(diffuse=(0.5, 0.5, 0.5)))
    _check(build_scene([m]), n_rays=512)


def test_box_field_three_levels():
    """16x16 boxes (~3k faces): leaves + 2-3 directory levels."""
    _check(_box_field(16), n_rays=4096)


def test_box_field_count_gating():
    _check(_box_field(8), n_rays=1024, count=700)


def test_large_field_matches():
    """45x45 boxes (~24k faces): the production scale band."""
    _check(_box_field(45, seed=3), n_rays=2048, seed=5)


def test_render_parity_vs_brute():
    """End-to-end: a frame through the pool integrator over hierwalk ==
    the same frame over brute force (identical per-path arithmetic)."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame

    scene = split_order_scene(_box_field(8), leaf=HIER_LEAF)
    from rendertoy3c_tpu.scene.camera import Camera

    cam = Camera(eye=(0, 6, 12), lookat=(0, 0, 0), fov_y=45.0,
                 aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=4, ray_block=512, integrator="pool")
    f_h, s_h = render_frame(scene, cam.params(), cfg, subframes=1,
                            tracer=make_hierwalk_tracer(scene))
    f_b, s_b = render_frame(scene, cam.params(), cfg, subframes=1,
                            tracer=make_bruteforce_tracer(scene))
    # hit t is computed in a different arithmetic order than brute force
    # (fused row MT), so epsilon-offset secondary rays can flip on ulp-level
    # t differences — tolerate sub-1e-3 radiance deltas
    np.testing.assert_allclose(np.asarray(f_h.accum), np.asarray(f_b.accum),
                               rtol=2e-3, atol=2e-3)
    assert abs(int(s_h.radiance_rays) - int(s_b.radiance_rays)) <= 8


def test_multi_phase_decay_widths():
    """8k rays over a 24k-face field: exercises two width-decay
    compactions (8192 -> 4096 -> 2048) plus the result expansion."""
    _check(_box_field(45, seed=7), n_rays=8192, seed=11)


def test_multi_phase_with_count():
    """Width decay composes with the compacted-live-ray count hint."""
    _check(_box_field(45, seed=9), n_rays=8192, seed=13, count=5000)


def _motion_field(n_side, seed=0, shift=(0.35, 0.2, -0.25)):
    """2-keyframe box field: key 1 = key 0 translated by `shift`."""
    scene = _box_field(n_side, seed=seed)
    g = scene.geom
    import dataclasses

    import jax.numpy as jnp

    sh = np.asarray(shift, np.float32)
    v0 = np.stack([np.asarray(g.v0[0]), np.asarray(g.v0[0]) + sh])
    geom = g._replace(
        v0=jnp.asarray(v0),
        e1=jnp.concatenate([g.e1, g.e1], axis=0),
        e2=jnp.concatenate([g.e2, g.e2], axis=0),
        n0=jnp.concatenate([g.n0, g.n0], axis=0),
        n1=jnp.concatenate([g.n1, g.n1], axis=0),
        n2=jnp.concatenate([g.n2, g.n2], axis=0),
    )
    return dataclasses.replace(scene, geom=geom, num_keys=2)


def test_motion_two_key_matches_brute():
    """2-key hierwalk (lerped leaf rows + union boxes) vs brute force at
    several times, including the endpoints."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF_MOTION

    scene = split_order_scene(_motion_field(16), leaf=HIER_LEAF_MOTION)
    hc, ha = make_hierwalk_tracer(scene)
    bc, ba = make_bruteforce_tracer(scene)
    o, d = _rand_rays(scene, 2048, seed=21)
    rng = np.random.default_rng(33)
    for time in (jnp.zeros(2048), jnp.ones(2048), None,
                 jnp.asarray(rng.random(2048).astype(np.float32))):
        bt = jnp.zeros(2048) if time is None else time
        h = hc(o, d, 1e-3, 1e16, time, None)
        b = bc(o, d, 1e-3, 1e16, bt, None)
        np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(b.prim))
        np.testing.assert_allclose(np.asarray(h.t), np.asarray(b.t),
                                   rtol=2e-5, atol=2e-5)
        occ_h = np.asarray(ha(o, d, 1e-3, 5.0, time, None))
        occ_b = np.asarray(ba(o, d, 1e-3, 5.0, bt, None))
        np.testing.assert_array_equal(occ_h, occ_b)


def test_fanout20_f32_directories_exact():
    """20-ary EXACT-f32 directory rows (hierwalk.FANOUT20; 120 box lanes):
    same culling math as 16-ary with wider rows, so closest/any results
    equal brute force exactly."""
    import jax.numpy as jnp
    import numpy as np

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.hierwalk import (
        FANOUT20, HIER_LEAF, build_hier_table, trace_any_hier,
        trace_closest_hier,
    )
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    meshes, _cam = cornell_box()
    sc = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    tab = build_hier_table(sc.geom, sc.num_faces, fanout=FANOUT20)
    assert tab.fanout == FANOUT20
    bc, _ = make_bruteforce_tracer(sc)
    rng = np.random.default_rng(12)
    R = 2048
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h20 = trace_closest_hier(tab, o, d, 1e-3, 1e16)
    hb = bc(o, d, 1e-3, 1e16, None, None)
    np.testing.assert_array_equal(np.asarray(h20.prim), np.asarray(hb.prim))
    np.testing.assert_allclose(np.asarray(h20.t), np.asarray(hb.t),
                               rtol=2e-5, atol=2e-5)
    a20 = np.asarray(trace_any_hier(tab, o, d, 1e-3, jnp.full((R,), 0.5)))
    ab = np.asarray(bc(o, d, 1e-3, 0.5, None, None).prim) >= 0
    np.testing.assert_array_equal(a20, ab)


def test_fanout32_bf16_directories_exact():
    """32-ary bf16-packed directory rows (hierwalk.FANOUT32): conservative
    outward rounding means culling can only loosen, so closest/any results
    stay EXACTLY equal to brute force. (Measured on-chip: no walk-band win
    — 49k par, 200k/1M slightly worse; kept as a tested option, see
    ROADMAP.)"""
    import jax.numpy as jnp
    import numpy as np

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.hierwalk import (
        FANOUT32, HIER_LEAF, build_hier_table, trace_any_hier,
        trace_closest_hier,
    )
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    meshes, _cam = cornell_box()
    sc = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    tab = build_hier_table(sc.geom, sc.num_faces, fanout=FANOUT32)
    assert tab.fanout == FANOUT32
    bc, _ = make_bruteforce_tracer(sc)
    rng = np.random.default_rng(11)
    R = 2048
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h32 = trace_closest_hier(tab, o, d, 1e-3, 1e16)
    hb = bc(o, d, 1e-3, 1e16, None, None)
    np.testing.assert_array_equal(np.asarray(h32.prim), np.asarray(hb.prim))
    a32 = np.asarray(trace_any_hier(tab, o, d, 1e-3, jnp.full((R,), 0.5)))
    ab = np.asarray(bc(o, d, 1e-3, 0.5, None, None).prim) >= 0
    np.testing.assert_array_equal(a32, ab)


def test_fanout_auto_pick():
    """fanout=0 auto-picks by the directory half-area sum: a uniform box
    field keeps 16-ary; geometry whose leaf runs group better at 20 picks
    the 20-ary exact-f32 rows. Walk results stay exact either way."""
    import jax.numpy as jnp
    import numpy as np

    from rendertoy3c_tpu.accel.lbvh import split_order_scene
    from rendertoy3c_tpu.scene.builtin import cornell_box
    from rendertoy3c_tpu.scene.scene import build_scene
    from rendertoy3c_tpu.trace.hierwalk import (
        FANOUT, FANOUT20, HIER_LEAF, _dir_half_area_sum, build_hier_table,
        trace_closest_hier,
    )
    from rendertoy3c_tpu.trace.intersect import make_bruteforce_tracer

    meshes, _cam = cornell_box()
    sc = split_order_scene(build_scene(meshes), leaf=HIER_LEAF)
    tab = build_hier_table(sc.geom, sc.num_faces, fanout=0)
    assert tab.fanout in (FANOUT, FANOUT20)
    # the auto pick equals the explicit argmin of the metric
    f = sc.num_faces
    g = sc.geom
    v0 = np.asarray(g.v0[0][:f])
    e1 = np.asarray(g.e1[0][:f])
    e2 = np.asarray(g.e2[0][:f])
    n_leaf = -(-f // HIER_LEAF)
    pad = n_leaf * HIER_LEAF - f
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    big = np.float32(1e30)
    lo = np.concatenate([lo, np.full((pad, 3), big, np.float32)])
    hi = np.concatenate([hi, np.full((pad, 3), -big, np.float32)])
    llo = lo.reshape(n_leaf, HIER_LEAF, 3).min(1)
    lhi = hi.reshape(n_leaf, HIER_LEAF, 3).max(1)
    want = min((FANOUT, FANOUT20),
               key=lambda fo: _dir_half_area_sum(llo, lhi, fo))
    assert tab.fanout == want
    # and the auto table still traces exactly
    bc, _ = make_bruteforce_tracer(sc)
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (512, 3)).astype(np.float32))
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h = trace_closest_hier(tab, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e16)
    hb = bc(o, jnp.asarray(d), 1e-3, 1e16, None, None)
    np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(hb.prim))


def _nkey_field(n_side, num_keys, seed=0):
    """num_keys-keyframe box field: piecewise-linear drift per key."""
    scene = _box_field(n_side, seed=seed)
    g = scene.geom
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(seed + 50)
    v0s, e1s, e2s = [np.asarray(g.v0[0])], [np.asarray(g.e1[0])], \
        [np.asarray(g.e2[0])]
    for _k in range(1, num_keys):
        sh = rng.uniform(-0.4, 0.4, 3).astype(np.float32)
        v0s.append(v0s[-1] + sh)
        e1s.append(e1s[-1])
        e2s.append(e2s[-1])
    geom = g._replace(
        v0=jnp.asarray(np.stack(v0s)),
        e1=jnp.asarray(np.stack(e1s)),
        e2=jnp.asarray(np.stack(e2s)),
        n0=jnp.concatenate([g.n0] * num_keys, axis=0),
        n1=jnp.concatenate([g.n1] * num_keys, axis=0),
        n2=jnp.concatenate([g.n2] * num_keys, axis=0),
    )
    return dataclasses.replace(scene, geom=geom, num_keys=num_keys)


def test_nkey_motion_matches_brute():
    """>2-key piecewise-linear motion on the stacked-segment hierwalk
    (build_hier_table_nkey): exact prim parity with the brute tracer's
    N-key segment lerp (intersect._tri_chunk) at random times and at
    every key/segment boundary (cuda_mesh.h:85-88 N-key motion GAS)."""
    import jax.numpy as jnp

    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF_MOTION

    scene = split_order_scene(_nkey_field(16, num_keys=4),
                              leaf=HIER_LEAF_MOTION)
    hc, ha = make_hierwalk_tracer(scene)
    bc, ba = make_bruteforce_tracer(scene)
    o, d = _rand_rays(scene, 2048, seed=41)
    rng = np.random.default_rng(43)
    times = [jnp.full((2048,), v, jnp.float32)
             for v in (0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0)]
    times.append(jnp.asarray(rng.random(2048).astype(np.float32)))
    for time in times:
        h = hc(o, d, 1e-3, 1e16, time, None)
        b = bc(o, d, 1e-3, 1e16, time, None)
        np.testing.assert_array_equal(np.asarray(h.prim), np.asarray(b.prim))
        np.testing.assert_allclose(np.asarray(h.t), np.asarray(b.t),
                                   rtol=2e-4, atol=2e-4)
        occ_h = np.asarray(ha(o, d, 1e-3, 5.0, time, None))
        occ_b = np.asarray(ba(o, d, 1e-3, 5.0, time, None))
        np.testing.assert_array_equal(occ_h, occ_b)


def test_nkey_render_parity_vs_brute():
    """End-to-end: a pool frame over the auto ladder's >2-key route
    (stacked-segment hierwalk) == the same frame over brute force."""
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.trace.hierwalk import HIER_LEAF_MOTION

    scene = split_order_scene(_nkey_field(8, num_keys=3, seed=2),
                              leaf=HIER_LEAF_MOTION)
    cam = Camera(eye=(0, 6, 12), lookat=(0, 0, 0), fov_y=45.0,
                 aspect_ratio=1.0)
    cfg = RenderConfig(width=24, height=24, samples_per_launch=2,
                       max_depth=3, ray_block=512, integrator="pool")
    f_h, s_h = render_frame(scene, cam.params(), cfg, subframes=1,
                            tracer=make_hierwalk_tracer(scene))
    f_b, s_b = render_frame(scene, cam.params(), cfg, subframes=1,
                            tracer=make_bruteforce_tracer(scene))
    np.testing.assert_allclose(np.asarray(f_h.accum), np.asarray(f_b.accum),
                               rtol=2e-3, atol=2e-3)
