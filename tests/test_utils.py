"""Checkpoint/resume + metrics tests (SURVEY §5 auxiliary subsystems)."""
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.renderer import render_image
from pathtracer_tpu.scene.worlds import test_world
from pathtracer_tpu.utils import checkpoint, metrics

CFG = RenderConfig(width=16, height=8, spp=4, max_depth=3, accel="brute",
                   ray_chunk=128, scene="test", seed=11)


def test_checkpoint_resume_bit_identical(tmp_path):
    """Interrupting at an spp-chunk boundary and resuming produces the
    bit-identical image (stateless RNG => accumulation is restartable)."""
    scene, cam = test_world()
    ck = str(tmp_path / "render.ckpt.npz")

    # NB: same spp_per_chunk on both sides — bit-identity holds per chunk
    # layout (fp addition order differs across layouts).
    full = checkpoint.render_with_checkpoints(scene, cam, CFG, ck,
                                              spp_per_chunk=2)

    # simulate an interrupted run: 1 chunk (2 spp), then "crash", then resume
    ck2 = str(tmp_path / "partial.ckpt.npz")
    seen = []

    def stop_after_first(done, total):
        seen.append(done)
        if done >= 2:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        checkpoint.render_with_checkpoints(scene, cam, CFG, ck2,
                                           spp_per_chunk=2,
                                           progress=stop_after_first)
    state = checkpoint.load_render_state(ck2, CFG, scene.num_prims)
    assert state is not None and state[1] == 2

    resumed = checkpoint.render_with_checkpoints(scene, cam, CFG, ck2,
                                                 spp_per_chunk=2)
    np.testing.assert_array_equal(resumed, full)


def test_checkpoint_matches_plain_render(tmp_path):
    """The chunked/resumable path equals the one-shot renderer exactly
    (same per-sample keys, same summation order per pixel)."""
    scene, cam = test_world()
    ck = str(tmp_path / "r.ckpt.npz")
    via_ckpt = checkpoint.render_with_checkpoints(scene, cam, CFG, ck,
                                                  spp_per_chunk=4)
    plain = np.asarray(render_image(scene, cam, CFG))
    np.testing.assert_allclose(via_ckpt, plain, atol=1e-6)


def test_checkpoint_rejects_mismatched_config(tmp_path):
    scene, cam = test_world()
    ck = str(tmp_path / "r.ckpt.npz")
    checkpoint.render_with_checkpoints(scene, cam, CFG, ck, spp_per_chunk=4)
    other = CFG.replace(seed=99)
    assert checkpoint.load_render_state(ck, other, scene.num_prims) is None


def test_fit_state_roundtrip(tmp_path):
    p = str(tmp_path / "fit.npz")
    params = {"albedo": np.ones((3, 3), np.float32) * 0.5}
    checkpoint.save_fit_state(p, params, 7, [1.0, 0.5])
    loaded, step, hist = checkpoint.load_fit_state(p)
    assert step == 7 and hist == [1.0, 0.5]
    np.testing.assert_array_equal(loaded["albedo"], params["albedo"])


def test_phase_timer_and_mrays():
    t = metrics.PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
    assert metrics.mrays_per_s(1000, 10, 5, 0.05) == 1.0
