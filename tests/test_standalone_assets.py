"""Standalone-asset fallbacks: the framework runs without the reference
tree (SURVEY §1 La — the one 'partial' row of the round-3 inventory).

- Cornell fallback is geometry-IDENTICAL to the reference's OBJ files
  (both vendor the canonical published Cornell box dataset).
- The bunny stand-in builds a renderable flagship scene end-to-end.
"""
import os

import numpy as np

from pathtracer_tpu.io.obj import load_obj
from pathtracer_tpu.scene.standalone_assets import bunny_standin, cornell_mesh

REF_DIR = "/root/reference/models/cornellbox"


def _soup(v, f):
    return np.sort(np.asarray(v, np.float64)[
        np.asarray(f).reshape(-1)].reshape(-1, 9).ravel())


def test_cornell_fallback_matches_reference_objs():
    if not os.path.isdir(REF_DIR):
        import pytest
        pytest.skip("reference tree absent (the very case the fallback "
                    "serves) — geometry identity is pinned where it exists")
    for name in ("floor", "left", "right", "light", "shortbox", "tallbox"):
        v1, f1 = load_obj(os.path.join(REF_DIR, name + ".obj"))
        v2, f2 = cornell_mesh(name)
        np.testing.assert_allclose(_soup(v1, f1), _soup(v2, f2),
                                   err_msg=name)


def test_cornell_scene_builds_without_objs(tmp_path):
    from pathtracer_tpu.scene.cornell import cornell_box
    scene, cam = cornell_box(obj_dir=str(tmp_path / "nope"))
    assert scene.num_prims > 20
    assert scene.num_lights >= 1


def test_bunny_standin_renders(monkeypatch):
    monkeypatch.setenv("PT_BUNNY_OBJ", "/nonexistent/bunny.obj")
    from pathtracer_tpu.scene.bunny import bunny_world
    scene, cam = bunny_world()
    assert scene.num_prims > 1000
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image
    cfg = RenderConfig(width=48, height=27, spp=1, max_depth=2,
                       ray_chunk=48 * 27, scene="bunny", accel="cluster")
    img = np.asarray(render_image(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # lit scene, not black
