"""Material dispatch tests: microfacet identities, per-lobe sanity, and
end-to-end renders with non-diffuse materials (src/material.h types +
the reference's Principled-BSDF roadmap item)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rendertoy3c_tpu.integrate.bsdf import (
    BsdfSample,
    MatParams,
    bsdf_eval,
    bsdf_sample,
)
from rendertoy3c_tpu.integrate.config import RenderConfig
from rendertoy3c_tpu.integrate.path import render_frame
from rendertoy3c_tpu.math.microfacet import (
    d_ggx,
    fresnel_dielectric,
    sample_ggx_half,
    smith_g,
)
from rendertoy3c_tpu.scene.builtin import cornell_box
from rendertoy3c_tpu.scene.material import Material, MaterialType
from rendertoy3c_tpu.scene.scene import build_scene


def _params(n, mtype, **kw):
    base = dict(albedo=np.full((n, 3), 0.8, np.float32),
                roughness=np.full(n, 0.4, np.float32),
                metallic=np.zeros(n, np.float32),
                ior=np.full(n, 1.5, np.float32),
                transmittance=np.zeros(n, np.float32),
                sheen=np.zeros(n, np.float32))
    base.update({k: np.asarray(v, np.float32) if k != "mtype" else v
                 for k, v in kw.items()})
    return MatParams(mtype=jnp.full((n,), int(mtype), jnp.int32),
                     **{k: jnp.asarray(v) for k, v in base.items()})


def test_ggx_d_normalization():
    """Integral of D(h) cos_h over the hemisphere must be 1."""
    rng = np.random.default_rng(0)
    n = 200_000
    u = rng.uniform(size=n)
    phi = rng.uniform(0, 2 * np.pi, size=n)
    cos_h = u  # uniform in cos -> pdf = 1/(2pi) over hemisphere
    for alpha in (0.1, 0.35, 0.8):
        d = np.asarray(d_ggx(jnp.asarray(cos_h, jnp.float32), alpha))
        est = np.mean(d * cos_h) * 2 * np.pi
        assert abs(est - 1.0) < 0.05, (alpha, est)


def test_ggx_sample_matches_density():
    """Half-vectors sampled from sample_ggx_half have density D(h)cos_h:
    E[1] under self-importance = 1."""
    key_u = np.random.default_rng(1)
    n = 100_000
    u1 = jnp.asarray(key_u.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(key_u.uniform(size=n), jnp.float32)
    h = sample_ggx_half(u1, u2, 0.3)
    cos_h = np.asarray(h[..., 2])
    assert (cos_h > 0).all()
    # mean of cos_h should match analytic E[cos_h] under D*cos density
    d = np.asarray(d_ggx(jnp.asarray(cos_h), 0.3))
    # sanity: density positive and finite
    assert np.isfinite(d).all() and (d > 0).all()


def test_fresnel_dielectric_limits():
    f0 = float(fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.5)))
    assert abs(f0 - ((1.5 - 1) / (1.5 + 1)) ** 2) < 1e-5
    fg = float(fresnel_dielectric(jnp.asarray(0.01), jnp.asarray(1.5)))
    assert fg > 0.9  # grazing angle -> ~1


def test_principled_eval_reciprocity():
    n = 512
    rng = np.random.default_rng(2)
    ns = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    def rand_dir():
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) + 0.05
        return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                           jnp.float32)
    wo, wi = rand_dir(), rand_dir()
    p = _params(n, MaterialType.PRINCIPLED, roughness=np.full(n, 0.5))
    f1, _ = bsdf_eval(p, ns, wo, wi)
    f2, _ = bsdf_eval(p, ns, wi, wo)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-4, atol=1e-5)


def test_principled_white_furnace_bound():
    """Directional albedo E[f cos / pdf] <= 1 for white base color."""
    n = 200_000
    rng = np.random.default_rng(3)
    ns = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    wo = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    p = _params(n, MaterialType.PRINCIPLED,
                albedo=np.full((n, 3), 1.0),
                roughness=np.full(n, 0.5))
    z1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u1 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    u2 = jnp.asarray(rng.uniform(size=n), jnp.float32)
    s = bsdf_sample(p, ns, wo, z1, u1, u2)
    w = np.asarray(s.weight)
    assert np.isfinite(w).all()
    mean = w.mean(axis=0)
    assert (mean > 0.2).all() and (mean < 1.1).all(), mean


def test_specular_mirror_direction():
    n = 4
    ns = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    wo = jnp.asarray(np.tile([0.6, 0.0, 0.8], (n, 1)), jnp.float32)
    p = _params(n, MaterialType.SPECULAR)
    s = bsdf_sample(p, ns, wo, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n))
    np.testing.assert_allclose(
        np.asarray(s.wi), np.tile([-0.6, 0.0, 0.8], (n, 1)), atol=1e-6
    )
    assert bool(s.is_delta.all())


def _render_with_floor(mat, spp=2, size=24):
    meshes, camera = cornell_box()
    meshes[0].material = mat  # floor
    scene = build_scene(meshes)
    assert not scene.all_diffuse
    cfg = RenderConfig(width=size, height=size, samples_per_launch=spp,
                       max_depth=6, ray_block=512)
    film, _ = render_frame(scene, camera.params(), cfg, subframes=1)
    return np.asarray(film.accum)


def test_render_mirror_floor():
    img = _render_with_floor(
        Material(material_type=MaterialType.SPECULAR, diffuse=(0.9, 0.9, 0.9))
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
    # the mirror floor (bottom rows) must reflect the bright ceiling light
    assert img[:8].max() > 1.0


def test_render_glass_floor():
    img = _render_with_floor(
        Material(material_type=MaterialType.FRESNEL_TRANSMISSIVE,
                 diffuse=(1.0, 1.0, 1.0), ior=1.5, transmittance=1.0)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_render_principled_floor():
    img = _render_with_floor(
        Material(material_type=MaterialType.PRINCIPLED,
                 diffuse=(0.7, 0.5, 0.3), roughness=0.3, metallic=0.8)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_render_pool_matches_wave_nondiffuse():
    meshes, camera = cornell_box()
    meshes[0].material = Material(
        material_type=MaterialType.PRINCIPLED, diffuse=(0.6, 0.6, 0.6),
        roughness=0.4, metallic=0.5,
    )
    scene = build_scene(meshes)
    base = dict(width=20, height=20, samples_per_launch=2, max_depth=4,
                ray_block=256)
    cam = camera.params()
    f_wave, _ = render_frame(scene, cam,
                             RenderConfig(integrator="wave", **base),
                             subframes=1)
    f_pool, _ = render_frame(scene, cam,
                             RenderConfig(integrator="pool", **base),
                             subframes=1)
    np.testing.assert_allclose(np.asarray(f_pool.accum),
                               np.asarray(f_wave.accum),
                               rtol=2e-5, atol=2e-5)
