"""Golden-image regression (SURVEY §4: the reference's milestone-PNG eyeball
diffing, made automatic). The golden was rendered on the CPU backend with
the brute path at a fixed seed; the stateless RNG makes the render a pure
function of (scene, cfg, seed), so any drift beyond fp-reassociation
tolerance is a real behavior change."""
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.renderer import render_image
from pathtracer_tpu.scene.worlds import test_world

GOLDEN = "tests/golden/test_world_64x36_s4d4.npy"
CFG = RenderConfig(width=64, height=36, spp=4, max_depth=4, accel="brute",
                   ray_chunk=2304, scene="test", seed=0)


def test_golden_test_world():
    scene, cam = test_world()
    img = np.asarray(render_image(scene, cam, CFG))
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(img, golden, atol=2e-3)


def test_golden_accel_paths_agree():
    """tensor/bvh paths reproduce the golden within edge-case tolerance."""
    scene, cam = test_world()
    golden = np.load(GOLDEN)
    for accel in ("tensor", "bvh"):
        img = np.asarray(render_image(scene, cam, CFG.replace(accel=accel)))
        close = np.isclose(img, golden, atol=5e-3).mean()
        assert close > 0.999, (accel, close)
