"""Texture atlas packing + CUDA-texture-semantics bilinear sampling
(src/cuda/cuda_texture.h:16-74)."""
import numpy as np
import jax.numpy as jnp

from rendertoy3c_tpu.scene.texture import (
    build_texture_atlas, sample_texture_bilinear,
)


def _solid(w, h, rgba):
    img = np.zeros((h, w, 4), np.uint8)
    img[:] = rgba
    return img


def test_atlas_packing_disjoint():
    r = np.random.default_rng(0)
    sizes = [(8, 8), (16, 4), (32, 32), (5, 7), (12, 3)]
    images = [_solid(w, h, (i * 40, 0, 0, 255)) for i, (w, h) in enumerate(sizes)]
    atlas = build_texture_atlas(images)
    meta = np.asarray(atlas.meta)
    cover = np.zeros(np.asarray(atlas.data).shape[:2], np.int32)
    for y0, x0, h, w, _ws, _wt in meta:
        cover[y0:y0 + h, x0:x0 + w] += 1
    assert cover.max() == 1  # no overlap
    # content preserved
    data = np.asarray(atlas.data)
    for i, (y0, x0, h, w, _ws, _wt) in enumerate(meta):
        np.testing.assert_array_equal(data[y0:y0 + h, x0:x0 + w], images[i])


def test_sample_constant_texture():
    atlas = build_texture_atlas([_solid(16, 16, (255, 128, 0, 255))])
    u = jnp.asarray([0.1, 0.5, 0.93])
    v = jnp.asarray([0.2, 0.5, 0.01])
    rgb = np.asarray(sample_texture_bilinear(atlas, jnp.asarray([0, 0, 0]), u, v))
    np.testing.assert_allclose(rgb[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(rgb[:, 1], 128 / 255, atol=1e-6)
    np.testing.assert_allclose(rgb[:, 2], 0.0, atol=1e-6)


def test_sample_texel_center_exact():
    img = np.zeros((4, 4, 4), np.uint8)
    img[1, 2] = (200, 100, 50, 255)
    atlas = build_texture_atlas([img])
    # texel (x=2, y=1) center: u = 2.5/4, v = 1.5/4
    rgb = np.asarray(
        sample_texture_bilinear(
            atlas, jnp.asarray([0]), jnp.asarray([2.5 / 4]), jnp.asarray([1.5 / 4])
        )
    )
    np.testing.assert_allclose(rgb[0], [200 / 255, 100 / 255, 50 / 255], atol=1e-6)


def test_wrap_mode():
    img = np.random.default_rng(1).integers(0, 256, (8, 8, 4), dtype=np.uint8)
    atlas = build_texture_atlas([img])
    tid = jnp.asarray([0, 0])
    a = np.asarray(sample_texture_bilinear(atlas, tid,
                                           jnp.asarray([0.3, 1.3]),
                                           jnp.asarray([0.6, -0.4])))
    np.testing.assert_allclose(a[0], a[1], atol=1e-6)


def test_clamp_to_edge_mode():
    """CLAMP_TO_EDGE pins out-of-range coordinates to the edge texel."""
    from rendertoy3c_tpu.scene.texture import WRAP_CLAMP, TextureImage

    img = np.zeros((1, 4, 4), np.uint8)
    img[0, 0] = (255, 0, 0, 255)
    img[0, 3] = (0, 0, 255, 255)
    atlas = build_texture_atlas([TextureImage(img, WRAP_CLAMP, WRAP_CLAMP)])
    tid = jnp.asarray([0, 0, 0])
    rgb = np.asarray(sample_texture_bilinear(
        atlas, tid, jnp.asarray([-0.7, 1.8, 0.5 / 4]),
        jnp.asarray([0.5, 0.5, 0.5])))
    np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0], atol=1e-6)  # left edge
    np.testing.assert_allclose(rgb[1], [0.0, 0.0, 1.0], atol=1e-6)  # right edge
    np.testing.assert_allclose(rgb[2], [1.0, 0.0, 0.0], atol=1e-6)  # texel 0


def test_mirrored_repeat_mode():
    """MIRRORED_REPEAT folds the coordinate with period 2."""
    from rendertoy3c_tpu.scene.texture import WRAP_MIRROR, TextureImage

    img = np.random.default_rng(2).integers(0, 256, (8, 8, 4), dtype=np.uint8)
    atlas = build_texture_atlas([TextureImage(img, WRAP_MIRROR, WRAP_MIRROR)])
    tid = jnp.asarray([0, 0])
    # u = 1.25 mirrors to 0.75; v = -0.3 mirrors to 0.3
    a = np.asarray(sample_texture_bilinear(
        atlas, tid, jnp.asarray([1.25, 0.75]), jnp.asarray([-0.3, 0.3])))
    np.testing.assert_allclose(a[0], a[1], atol=1e-6)


def test_wrap_modes_quad_table_matches_gather_path():
    """The single-gather quad path and the 4-fetch fallback agree for every
    address mode (including at the edges)."""
    from rendertoy3c_tpu.scene.texture import (
        WRAP_CLAMP, WRAP_MIRROR, WRAP_REPEAT, TextureImage,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    for mode in (WRAP_REPEAT, WRAP_CLAMP, WRAP_MIRROR):
        atlas = build_texture_atlas([TextureImage(img, mode, mode)])
        assert atlas.quad is not None
        no_quad = atlas._replace(quad=None)
        u = jnp.asarray(rng.uniform(-2, 3, 64).astype(np.float32))
        v = jnp.asarray(rng.uniform(-2, 3, 64).astype(np.float32))
        tid = jnp.zeros(64, jnp.int32)
        a = np.asarray(sample_texture_bilinear(atlas, tid, u, v))
        b = np.asarray(sample_texture_bilinear(no_quad, tid, u, v))
        np.testing.assert_allclose(a, b, atol=1e-5), mode


def test_bilinear_interpolation():
    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = (0, 0, 0, 255)
    img[0, 1] = (255, 255, 255, 255)
    atlas = build_texture_atlas([img])
    # halfway between the two texel centers: u = 0.5
    rgb = np.asarray(
        sample_texture_bilinear(atlas, jnp.asarray([0]), jnp.asarray([0.5]),
                                jnp.asarray([0.5]))
    )
    np.testing.assert_allclose(rgb[0], 0.5, atol=1e-3)


def test_no_texture_returns_black():
    atlas = build_texture_atlas([_solid(4, 4, (255, 255, 255, 255))])
    rgb = np.asarray(
        sample_texture_bilinear(atlas, jnp.asarray([-1]), jnp.asarray([0.5]),
                                jnp.asarray([0.5]))
    )
    np.testing.assert_array_equal(rgb[0], 0.0)


def test_uv_transform():
    """Texture-coordinate transform (offset/rotation/scale) shifts sampling
    (MaterialData.h texture desc / KHR_texture_transform)."""
    import numpy as np
    import jax.numpy as jnp
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.builtin import quad
    from rendertoy3c_tpu.scene.material import Material
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.scene import build_scene

    # half-red half-blue texture; scaling uv by (0.5, 1) samples only the
    # red half
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[:, :4] = (255, 0, 0, 255)
    tex[:, 4:] = (0, 0, 255, 255)
    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    lamp_v, lamp_f = quad([-0.5, 2, -0.5], [-0.5, 2, 0.5], [0.5, 2, 0.5],
                          [0.5, 2, -0.5])
    lamp = Mesh(vertices=lamp_v[None], indices=lamp_f,
                material=Material(emissive=(10, 10, 10)))
    cam = Camera(eye=(0, 2.0, 2.0), lookat=(0, 0, 0), fov_y=45.0)
    cfg = RenderConfig(width=12, height=12, samples_per_launch=4,
                       max_depth=2, ray_block=256)

    def render(mat):
        floor = Mesh(vertices=v[None], indices=f, texcoords=uvs, material=mat)
        scene = build_scene([floor, lamp], textures=[tex])
        film, _ = render_frame(scene, cam.params(), cfg, subframes=1)
        return np.asarray(film.accum)

    base = render(Material(diffuse=(1, 1, 1), diffuse_texture_id=0))
    xf = render(Material(diffuse=(1, 1, 1), diffuse_texture_id=0,
                         tex_scale=(0.4, 1.0)))
    # blue-DOMINANT pixels isolate the blue texture half from white lamp
    # highlights: present untransformed, gone once uv scaling keeps
    # sampling inside the red half
    def blue_dom(img):
        return int(((img[..., 2] > 2 * img[..., 0])
                    & (img[..., 2] > 0.01)).sum())

    assert blue_dom(base) > 10
    assert blue_dom(xf) == 0
    assert xf[..., 0].max() > 0.02  # red still present


def test_normal_mapping():
    """A tangent-space normal map perturbs shading on a flat floor (the
    reference parses normal-map ids but never applies them)."""
    import numpy as np
    import jax.numpy as jnp
    from rendertoy3c_tpu.integrate.config import RenderConfig
    from rendertoy3c_tpu.integrate.path import render_frame
    from rendertoy3c_tpu.scene.builtin import quad
    from rendertoy3c_tpu.scene.material import Material, MaterialType
    from rendertoy3c_tpu.scene.mesh import Mesh
    from rendertoy3c_tpu.scene.camera import Camera
    from rendertoy3c_tpu.scene.scene import build_scene

    # flat map (z=1) vs strongly tilted map
    flat = np.zeros((4, 4, 4), np.uint8)
    flat[..., 0] = 128
    flat[..., 1] = 128
    flat[..., 2] = 255
    flat[..., 3] = 255
    tilted = flat.copy()
    tilted[..., 0] = 255  # lean the normal hard toward +tangent
    tilted[..., 2] = 128

    v, f = quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1])
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    lv, lf = quad([-0.4, 2, -0.4], [-0.4, 2, 0.4], [0.4, 2, 0.4],
                  [0.4, 2, -0.4])
    lamp = Mesh(vertices=lv[None], indices=lf,
                material=Material(emissive=(12, 12, 12)))
    cam = Camera(eye=(0, 1.5, 2.0), lookat=(0, 0, 0), fov_y=45.0)
    cfg = RenderConfig(width=12, height=12, samples_per_launch=8,
                       max_depth=2, ray_block=256, seed=3)

    def render(tex):
        # PRINCIPLED floor so the dispatch (normal-mapped) path runs
        mat = Material(material_type=MaterialType.PRINCIPLED,
                       diffuse=(0.7, 0.7, 0.7), roughness=0.8,
                       normal_texture_id=0)
        floor = Mesh(vertices=v[None], indices=f, texcoords=uvs, material=mat)
        scene = build_scene([floor, lamp], textures=[tex])
        assert scene.any_normal_map
        film, _ = render_frame(scene, cam.params(), cfg, subframes=2)
        return np.asarray(film.accum)

    img_flat = render(flat)
    img_tilt = render(tilted)
    assert np.isfinite(img_flat).all() and np.isfinite(img_tilt).all()
    # tilting the normals away from the light darkens the floor
    diff = np.abs(img_flat - img_tilt).mean()
    assert diff > 0.01, diff
