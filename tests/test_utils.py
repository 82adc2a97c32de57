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


def test_sobol_sampler_reduces_pixel_variance():
    """Owen-scrambled Sobol pixel filter (core/sampling.sobol_owen_2d)
    converges faster than the reference's uniform jitter: at equal low spp
    the MSE against a high-spp reference must be lower. Also pins the
    sampler's basic properties (range, first-sample stratification)."""
    import jax.numpy as jnp
    import numpy as np
    from pathtracer_tpu.core.sampling import sobol_owen_2d

    # unit-range + determinism + per-pixel decorrelation
    pid = jnp.arange(512, dtype=jnp.int32)
    x0, x1 = sobol_owen_2d(jnp.uint32(5), pid, seed=0)
    assert float(x0.min()) >= 0.0 and float(x0.max()) < 1.0
    assert float(x1.min()) >= 0.0 and float(x1.max()) < 1.0
    y0, _ = sobol_owen_2d(jnp.uint32(5), pid, seed=0)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(y0))
    # each pixel's own 16-sample set is a (0,2)-net: every quadrant of the
    # unit square gets exactly 4 of the 16 samples
    one = jnp.zeros((16,), jnp.int32)
    xs, ys = [], []
    for s in range(16):
        a, b = sobol_owen_2d(jnp.uint32(s), one[:1] + 7, seed=3)
        xs.append(float(a[0])); ys.append(float(b[0]))
    q = np.zeros((2, 2), np.int32)
    for a, b in zip(xs, ys):
        q[int(a * 2), int(b * 2)] += 1
    np.testing.assert_array_equal(q, np.full((2, 2), 4))

    # variance: MSE vs a high-spp reference at 4 spp, edge-heavy test scene
    scene, cam = test_world()
    base = RenderConfig(width=48, height=27, spp=4, max_depth=3,
                        accel="brute", ray_chunk=1296, scene="test", seed=1)
    ref = np.asarray(render_image(scene, cam,
                                  base.replace(spp=128, seed=9)))
    img_r = np.asarray(render_image(scene, cam, base))
    img_s = np.asarray(render_image(scene, cam,
                                    base.replace(sampler="sobol")))
    mse_r = float(np.mean((img_r - ref) ** 2))
    mse_s = float(np.mean((img_s - ref) ** 2))
    assert mse_s < mse_r, (mse_s, mse_r)


def test_orbax_fit_checkpoint_roundtrip(tmp_path):
    """The Orbax fit-state backend round-trips params/step/history exactly
    (mirrors the npz backend's contract)."""
    pytest.importorskip("orbax.checkpoint")
    params = {"albedo": np.linspace(0, 1, 12, dtype=np.float32),
              "emit": np.ones((2, 3), np.float32)}
    p = str(tmp_path / "fit_orbax")
    checkpoint.save_fit_state_orbax(p, params, 7, [1.0, 0.5])
    out = checkpoint.load_fit_state_orbax(p)
    assert out is not None
    params2, step, hist = out
    assert step == 7 and hist == [1.0, 0.5]
    np.testing.assert_array_equal(params2["albedo"], params["albedo"])
    np.testing.assert_array_equal(params2["emit"], params["emit"])
