"""Russian-roulette termination (reference constants 0.8/1.25,
global_variables.h:38-41 — shipped but unused there)."""
import jax
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.renderer import make_renderer
from pathtracer_tpu.scene import worlds


def _render(cfg, scene, cam, seed=0):
    render = make_renderer(cfg, with_bvh=False, with_stats=True)
    img, n_exec = render(scene, None, cam, seed)
    return np.asarray(img), int(np.sum(n_exec))


def test_rr_unbiased_and_cheaper():
    scene, cam = worlds.get_world("random")
    base = RenderConfig(width=40, height=24, spp=16, max_depth=24,
                        accel="tensor", ray_chunk=40 * 24, scene="random")
    img_ref, n_ref = _render(base, scene, cam)
    img_rr, n_rr = _render(base.replace(rr=True, rr_depth=2), scene, cam)

    # unbiased: means agree within Monte-Carlo noise of this workload
    assert abs(img_rr.mean() - img_ref.mean()) < 0.02, \
        (img_rr.mean(), img_ref.mean())
    # cheaper: roulette retires deep paths, so fewer queries execute
    assert n_rr < n_ref, (n_rr, n_ref)


def test_rr_off_matches_legacy_stream():
    # rr=False must leave the sample stream identical to the pre-RR
    # integrator (the RR uniforms draw from a separate folded key): compare
    # against a STORED golden of that stream, so a change to the rr=False
    # path fails here (a second in-process render would only test
    # determinism).
    scene, cam = worlds.get_world("test")
    cfg = RenderConfig(width=32, height=18, spp=4, max_depth=6,
                       accel="brute", ray_chunk=32 * 18, scene="test")
    render = make_renderer(cfg, with_bvh=False)
    a = np.asarray(render(scene, None, cam, 0))
    golden = np.load("tests/golden/test_world_rr_off_32x18_s4d6.npy")
    np.testing.assert_allclose(a, golden, atol=2e-3)
