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


def test_vendored_bunny_renders_close_to_reference():
    """VERDICT r4 #6: the committed assets/bunny.obj (grid-cluster
    decimation of the public-domain Stanford scan, tools/
    make_bunny_asset.py) must render within noise of the reference-tree
    full-res OBJ — and far closer than the procedural stand-in."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image
    from pathtracer_tpu.scene.bunny import ASSET_OBJ, REFERENCE_OBJ, \
        bunny_world
    from pathtracer_tpu.scene.standalone_assets import bunny_standin

    assert os.path.exists(ASSET_OBJ), "vendored asset missing"
    if not os.path.exists(REFERENCE_OBJ):
        import pytest
        pytest.skip("reference tree absent — the vendored asset is the "
                    "default then; parity is pinned where the scan exists")

    cfg = RenderConfig(width=64, height=36, spp=4, max_depth=3,
                       ray_chunk=64 * 36, scene="bunny", accel="cluster")

    def render(obj_path):
        scene, cam = bunny_world(obj_path=obj_path)
        return np.asarray(render_image(scene, cam, cfg))

    img_ref = render(REFERENCE_OBJ)
    img_asset = render(ASSET_OBJ)
    d_asset = float(np.abs(img_asset - img_ref).mean())
    assert d_asset < 0.05, f"vendored bunny render off: {d_asset}"

    # the stand-in blob is a different shape — the vendored asset must be
    # an order closer (this is what makes it parity-grade, not a stand-in)
    sv, sf = bunny_standin()
    import pathtracer_tpu.scene.bunny as bmod
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                     delete=False) as f:
        for v in sv:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in np.asarray(sf) + 1:
            f.write(f"f {a} {b} {c}\n")
        blob_path = f.name
    try:
        img_blob = render(blob_path)
    finally:
        os.unlink(blob_path)
    d_blob = float(np.abs(img_blob - img_ref).mean())
    assert d_asset < 0.5 * d_blob, (d_asset, d_blob)


def test_bunny_standin_renders():
    # an explicit missing path forces the last-resort stand-in (a missing
    # PT_BUNNY_OBJ env no longer does: resolve_bunny_obj falls through to
    # the reference tree, then the vendored asset)
    from pathtracer_tpu.scene.bunny import bunny_world
    scene, cam = bunny_world(obj_path="/nonexistent/bunny.obj")
    assert scene.num_prims > 1000
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image
    cfg = RenderConfig(width=48, height=27, spp=1, max_depth=2,
                       ray_chunk=48 * 27, scene="bunny", accel="cluster")
    img = np.asarray(render_image(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # lit scene, not black
