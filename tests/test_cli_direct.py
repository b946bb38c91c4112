"""CLI smoke test for the direct-lighting renderer and explicit tracers."""
import os

from rendertoy3c_tpu.app.cli import main


def test_cli_direct_renderer(tmp_path):
    out = str(tmp_path / "direct.png")
    rc = main([
        "--scene", "cornell", "--size", "24x24", "--spp", "1",
        "--subframes", "1", "--renderer", "direct", "--tracer", "brute",
        "--ray-block", "576", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_wave_integrator(tmp_path):
    out = str(tmp_path / "wave.png")
    rc = main([
        "--scene", "cornell-empty", "--size", "16x16", "--spp", "1",
        "--subframes", "1", "--integrator", "wave", "--tracer", "brute",
        "--max-depth", "2", "--ray-block", "256", "-o", out,
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_direct_glass_recursion_sees_through():
    """Recursive whitted glass (cuda/shading.cu:226-325): a
    FRESNEL_TRANSMISSIVE slab with ior=1 transmits ~(1-F)^2 of the wall
    behind it (plus the fresnel-reflected share), so the through-glass
    view must be a dimmed version of the no-slab render — NOT an opaque
    PBR surface."""
    import numpy as np

    from rendertoy3c_tpu.film.film import film_create
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.direct import make_direct_render_fn
    from rendertoy3c_tpu.scene.builtin import box_mesh, cornell_box
    from rendertoy3c_tpu.scene.material import Material, MaterialType
    from rendertoy3c_tpu.scene.scene import build_scene

    meshes, camera = cornell_box(with_blocks=False)
    camera.aspect_ratio = 1.0
    cfg = RenderConfig(width=32, height=32, samples_per_launch=1,
                       max_depth=6, ray_block=1024)

    def render(ms):
        scene = build_scene(ms)
        step = make_direct_render_fn(scene, cfg, ambient=(0.4, 0.4, 0.4))
        film, _ = step(camera.params(), film_create(cfg.height, cfg.width))
        return np.asarray(film.accum)

    ref = render(meshes)
    glass = box_mesh([-0.5, 0.3, -0.1], [0.5, 1.3, 0.1],
                     Material(material_type=MaterialType.FRESNEL_TRANSMISSIVE,
                              ior=1.0, transmittance=0.98))
    img = render(meshes + [glass])
    assert np.isfinite(img).all()
    # center pixels look through the slab: dimmed background, not black
    # and not the opaque-PBR gray of the old routing
    c_ref = ref[12:20, 12:20].mean()
    c_glass = img[12:20, 12:20].mean()
    assert 0.4 * c_ref < c_glass < 1.05 * c_ref
    # pixels outside the slab are identical
    np.testing.assert_allclose(img[:2], ref[:2], atol=1e-5)
