"""Progressive viewer session + image-texture tests (SURVEY §2: cuda2gl
replacement and the dangling mTexID/texture.h capability)."""
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.core.camera import make_camera
from pathtracer_tpu.scene.scene import SceneBuilder
from pathtracer_tpu.viewer.interactive import ViewerSession, _ansi_frame


def _scene():
    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0, 0, -3), 1.0, m)
    cam = make_camera((0, 0, 1), (0, 0, -3), 60, 2.0, aperture=0,
                      focus_dist=4)
    return b.build(), cam


CFG = RenderConfig(width=16, height=8, spp=2, max_depth=2, accel="brute",
                   ray_chunk=128, scene="test")


def test_viewer_accumulates_and_restarts():
    scene, cam = _scene()
    sess = ViewerSession(scene, cam, CFG, spp_per_frame=1)
    img1 = sess.step()
    assert img1.shape == (8, 16, 3)
    img2 = sess.step()
    assert sess.passes == 2
    # accumulation converges: frame 2 is the mean of two 1-spp passes
    assert not np.array_equal(img1, img2)

    moved = sess.handle_key("w", 0.1)
    assert moved and sess.passes == 0  # WASD restarts accumulation
    assert not sess.handle_key("x", 0.1)


def test_ansi_frame_shape():
    img = np.random.default_rng(0).random((8, 16, 3)).astype(np.float32)
    s = _ansi_frame(img)
    assert s.count("\n") == 3  # 8 rows -> 4 half-block lines


def test_image_texture_modulates_albedo():
    """Lambertian albedo is modulated by the bound image texture at the hit
    UV (wires the reference's dangling mTexID, material.h:64)."""
    from pathtracer_tpu.render.renderer import render_image

    def build(with_tex):
        b = SceneBuilder()
        if with_tex:
            tex = np.zeros((4, 4, 3), np.float32)
            tex[:, :, 0] = 1.0   # pure red texture
            tid = b.add_texture(tex)
            m = b.add_lambertian((1.0, 1.0, 1.0), tex_id=tid)
        else:
            m = b.add_lambertian((1.0, 0.0, 0.0))  # same effective color
        b.add_sphere((0, 0, -3), 1.0, m)
        cam = make_camera((0, 0, 1), (0, 0, -3), 60, 2.0, aperture=0,
                          focus_dist=4)
        return b.build(), cam

    s_tex, cam = build(True)
    s_plain, _ = build(False)
    img_tex = np.asarray(render_image(s_tex, cam, CFG))
    img_plain = np.asarray(render_image(s_plain, cam, CFG))
    np.testing.assert_allclose(img_tex, img_plain, atol=1e-5)


def test_png_file_texture_end_to_end(tmp_path):
    """read_png -> SceneBuilder.add_texture -> rendered texel colors: the
    full image-file texture path (stb_image's reserved role,
    png_image.h:8-9)."""
    import numpy as np

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.core.camera import make_camera
    from pathtracer_tpu.io.png import read_png, write_png
    from pathtracer_tpu.render.renderer import render_image
    from pathtracer_tpu.scene.scene import SceneBuilder

    # write a tiny 4-quadrant PNG to disk, read it back, texture a sphere
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:4, :4] = (1, 0, 0)
    tex[:4, 4:] = (0, 1, 0)
    tex[4:, :4] = (0, 0, 1)
    tex[4:, 4:] = (1, 1, 0)
    path = str(tmp_path / "quad.png")
    write_png(path, tex, flip_rows=False)
    loaded = read_png(path)[..., :3]
    np.testing.assert_allclose(loaded, tex, atol=0.01)

    b = SceneBuilder()
    tid = b.add_texture(loaded)
    mat = b.add_lambertian((1, 1, 1), tex_id=tid)
    b.add_sphere((0, 0, 0), 1.0, mat)
    scene = b.build()
    cam = make_camera((0, 0, 4), (0, 0, 0), 40, 1.0, aperture=0,
                      focus_dist=4, time0=0, time1=0)
    cfg = RenderConfig(width=32, height=32, spp=4, max_depth=2,
                       accel="brute", ray_chunk=1024, scene="test")
    img = np.asarray(render_image(scene, cam, cfg))
    # sphere center-left vs center-right texels must differ (texture shows)
    assert img[16, 12].tolist() != img[16, 20].tolist()
    assert img.max() > 0.2


def test_cornell_full_has_file_texture():
    from pathtracer_tpu.scene.cornell import MARBLE_PNG, cornell_box
    import os
    assert os.path.exists(MARBLE_PNG), "marble.png asset missing"
    scene, _ = cornell_box()
    assert scene.textures.shape[0] >= 2  # checker + marble file texture
