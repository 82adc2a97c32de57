"""Pallas fused-sweep kernel vs the XLA tensor sweep (interpret mode on the
CPU backend; the compiled path runs on real TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops import intersect, pallas_sweep, tensor_sweep
from pathtracer_tpu.scene.worlds import get_world, test_world


def _rays(cam, n, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    o = jnp.tile(jnp.asarray(cam.position)[None, :], (n, 1))
    d = (cam.lower_left[None, :] + u[:, None] * cam.horizontal[None, :]
         + v[:, None] * cam.vertical[None, :] - o)
    return o, d


@pytest.mark.parametrize("maker,n_rays", [
    (lambda: test_world(), 256),
    (lambda: get_world("triangle", total_count=80), 384),
])
def test_pallas_matches_tensor(maker, n_rays):
    scene, cam = maker()
    o, d = _rays(cam, n_rays)
    tables = tensor_sweep.pack_sweep_tables(scene, tile=1024)

    ti, tt, tv = tensor_sweep.tensor_closest(
        tables, o, d, jnp.float32(1e-3), intersect.BIG_T)
    pi, pt, pv = pallas_sweep.pallas_closest(tables, o, d, 1e-3)

    np.testing.assert_array_equal(np.asarray(tv), np.asarray(pv))
    m = np.asarray(tv)
    np.testing.assert_array_equal(np.asarray(ti)[m], np.asarray(pi)[m])
    np.testing.assert_allclose(np.asarray(pt)[m], np.asarray(tt)[m],
                               rtol=1e-6)


def test_ray_tile_divisor_fallback():
    """Odd wavefront sizes shrink the ray tile instead of failing."""
    scene, cam = test_world()
    o, d = _rays(cam, 96)  # not divisible by the default 128
    tables = tensor_sweep.pack_sweep_tables(scene)
    idx, t, valid = pallas_sweep.pallas_closest(tables, o, d, 1e-3)
    assert idx.shape == (96,)
