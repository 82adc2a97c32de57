"""Morton bit-math property tests + triangle-light sampling coverage."""
import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops import morton
from pathtracer_tpu.render import lights
from pathtracer_tpu.scene.cornell import cornell_box


def _expand_bits_ref(v):
    """Straightforward bit-by-bit interleave reference."""
    out = 0
    for i in range(10):
        out |= ((v >> i) & 1) << (3 * i)
    return out


def test_expand_bits_matches_reference_bit_math():
    vals = np.arange(1024, dtype=np.uint32)
    got = np.asarray(morton.expand_bits(jnp.asarray(vals)))
    ref = np.array([_expand_bits_ref(int(v)) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, ref)


def test_morton3d_orders_along_axes():
    """Codes are monotone along each axis and x has the highest bits
    (morton_code.h:29-45: interleave order x, y, z)."""
    wmin = jnp.zeros(3)
    wmax = jnp.ones(3)
    a = morton.morton3d(jnp.array([[0.1, 0.0, 0.0]]), wmin, wmax)
    b = morton.morton3d(jnp.array([[0.9, 0.0, 0.0]]), wmin, wmax)
    c = morton.morton3d(jnp.array([[0.0, 0.9, 0.0]]), wmin, wmax)
    d = morton.morton3d(jnp.array([[0.0, 0.0, 0.9]]), wmin, wmax)
    assert int(a[0]) < int(b[0])
    assert int(b[0]) > int(c[0]) > int(d[0])  # x dominates y dominates z


def test_triangle_light_sampling_on_cornell_quad():
    """Sampled points lie on the Cornell ceiling light (two triangles of the
    quad), normals are vertical, and the pdf integrates the quad area."""
    scene, _ = cornell_box(variant="spheres")
    assert scene.num_lights == 2  # light.obj quad = 2 triangles
    u = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))
    p, n, emit, pdf = lights.sample_lights(scene, u)
    p = np.asarray(p)

    # the reference light quad: x in [213,343], z in [227,332] at y ~ 548.8
    assert (np.abs(p[:, 1] - p[0, 1]) < 1.0).all()   # planar, constant y
    assert p[:, 0].min() >= 212.0 and p[:, 0].max() <= 344.0
    assert p[:, 2].min() >= 226.0 and p[:, 2].max() <= 333.0
    # vertical normals
    np.testing.assert_allclose(np.abs(np.asarray(n)[:, 1]), 1.0, atol=1e-4)
    # pdf = 1 / (area_of_that_triangle * num_lights); summing the two
    # distinct values' reciprocals recovers the full quad area * L
    inv = 1.0 / np.asarray(pdf)
    areas = np.unique(np.round(inv / 2.0, 2))
    assert len(areas) <= 2
    quad_area = float(areas.sum()) if len(areas) == 2 else 2 * float(areas[0])
    assert abs(quad_area - 130.0 * 105.0) / (130.0 * 105.0) < 0.05
    np.testing.assert_allclose(np.asarray(emit),
                               np.tile([15.0, 15.0, 15.0], (512, 1)),
                               rtol=1e-6)
