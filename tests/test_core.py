"""Unit tests for the math/sampling/camera layer (SURVEY §4: property tests
for math/sampling; reference formulas cited per function)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.core import camera as cam_mod
from pathtracer_tpu.core import optics, sampling, vec


def test_vec_basics():
    a = jnp.array([[1.0, 2.0, 3.0], [0.0, 1.0, 0.0]])
    b = jnp.array([[4.0, 5.0, 6.0], [1.0, 0.0, 0.0]])
    np.testing.assert_allclose(vec.dot(a, b), [32.0, 0.0])
    np.testing.assert_allclose(vec.cross(a, b)[0], [-3.0, 6.0, -3.0])
    np.testing.assert_allclose(
        vec.normalize(jnp.array([3.0, 0.0, 4.0])), [0.6, 0.0, 0.8])
    assert bool(vec.near_zero(jnp.array([1e-8, -1e-8, 0.0])))
    assert not bool(vec.near_zero(jnp.array([1e-6, 0.0, 0.0])))


def test_reflect_refract():
    # 45-degree mirror (physical.h:11-13)
    v = vec.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    r = optics.reflect(v, n)
    np.testing.assert_allclose(r, vec.normalize(jnp.array([1.0, 1.0, 0.0])),
                               atol=1e-6)
    # normal incidence refraction passes straight through
    uv = jnp.array([0.0, -1.0, 0.0])
    t = optics.refract(uv, n, 1.0 / 1.5)
    np.testing.assert_allclose(t, uv, atol=1e-6)
    # Schlick at grazing -> 1, at normal incidence -> r0
    np.testing.assert_allclose(optics.reflectance(0.0, 1.5), 1.0, atol=1e-6)
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    np.testing.assert_allclose(optics.reflectance(1.0, 1.5), r0, atol=1e-6)


def test_snell_angle():
    # 45 deg into glass: sin(t) = sin(45)/1.5
    n = jnp.array([0.0, 1.0, 0.0])
    uv = vec.normalize(jnp.array([1.0, -1.0, 0.0]))
    out = optics.refract(uv, n, 1.0 / 1.5)
    sin_out = float(jnp.abs(out[0]) / vec.length(out))
    np.testing.assert_allclose(sin_out, np.sin(np.pi / 4) / 1.5, atol=1e-5)


@pytest.mark.parametrize("sampler,expect_norm", [
    ("on_sphere", 1.0), ("in_sphere", None), ("disk", None)])
def test_sampling_distributions(sampler, expect_norm):
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (3, 20000))
    if sampler == "on_sphere":
        pts = sampling.uniform_on_sphere(u[0], u[1])
        np.testing.assert_allclose(vec.length(pts), 1.0, atol=1e-5)
        # uniform on sphere: component means 0, E[x^2] = 1/3
        np.testing.assert_allclose(np.mean(np.asarray(pts), axis=0),
                                   0.0, atol=0.02)
        np.testing.assert_allclose(np.mean(np.asarray(pts) ** 2, axis=0),
                                   1 / 3, atol=0.02)
    elif sampler == "in_sphere":
        pts = sampling.uniform_in_sphere(u[0], u[1], u[2])
        r = np.asarray(vec.length(pts))
        assert (r <= 1.0 + 1e-6).all()
        # uniform in ball: E[r] = 3/4, E[r^3] = 1/2
        np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)
        np.testing.assert_allclose((r ** 3).mean(), 0.5, atol=0.01)
    else:
        pts = sampling.uniform_in_disk(u[0], u[1])
        r = np.asarray(vec.length(pts))
        assert (np.asarray(pts[..., 2]) == 0).all()
        assert (r <= 1.0 + 1e-6).all()
        # uniform in disk: E[r] = 2/3, E[r^2] = 1/2 (utility.h:98-102)
        np.testing.assert_allclose(r.mean(), 2 / 3, atol=0.01)
        np.testing.assert_allclose((r ** 2).mean(), 0.5, atol=0.01)


def test_hemisphere_sampler():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (2, 5000))
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5000, 1))
    pts = sampling.uniform_on_hemisphere(u[0], u[1], n)
    assert (np.asarray(vec.dot(pts, n)) > 0).all()


def test_camera_center_ray():
    # A ray through the viewport center points from look_from to look_at
    cam = cam_mod.make_camera((0, 0, 15), (0, 0, 0), 20, 16 / 9,
                              aperture=0, focus_dist=10)
    s = jnp.array([0.5]); t = jnp.array([0.5])
    z = jnp.zeros(1)
    o, d, time = cam_mod.get_rays(cam, s, t, z, z, z)
    np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 15], atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.normalize(d[0])), [0, 0, -1],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(time), 0.0)


def test_camera_time_jitter():
    cam = cam_mod.make_camera((0, 0, 15), (0, 0, 0), 20, 16 / 9,
                              aperture=0, focus_dist=10, time0=0.25,
                              time1=0.75)
    s = jnp.full(100, 0.5); z = jnp.zeros(100)
    u_time = jnp.linspace(0, 1, 100)
    _, _, time = cam_mod.get_rays(cam, s, s, z, z, u_time)
    t = np.asarray(time)
    assert t.min() >= 0.25 and t.max() <= 0.75


def test_camera_move_matches_reference_directions():
    # FORWARD subtracts front (camera.h:43-44) — i.e. moves toward look_at
    cam = cam_mod.make_camera((0, 0, 15), (0, 0, 0), 20, 16 / 9,
                              aperture=0, focus_dist=10)
    moved = cam_mod.move_camera(cam, cam_mod.Direction.FORWARD, 1.0)
    assert float(moved.position[2]) < 15.0  # front = +z here, FORWARD -> -z
    # lower_left tracks the position (camera.h:55)
    np.testing.assert_allclose(
        np.asarray(moved.lower_left - moved.position),
        np.asarray(cam.lower_left - cam.position), atol=1e-5)


def test_defocus_blur_spread():
    cam = cam_mod.make_camera((0, 0, 15), (0, 0, 0), 20, 16 / 9,
                              aperture=2.0, focus_dist=10)
    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (2, 512))
    s = jnp.full(512, 0.5)
    o, d, _ = cam_mod.get_rays(cam, s, s, u[0], u[1], jnp.zeros(512))
    # origins spread over the lens disk of radius 1
    r = np.asarray(vec.length(o - jnp.array([0.0, 0.0, 15.0])))
    assert r.max() <= 1.0 + 1e-5 and r.max() > 0.5
    # all rays converge at the focal point
    focal = np.asarray(o + d)  # t = 1 reaches the focus plane
    np.testing.assert_allclose(focal[:, 2], 5.0, atol=1e-4)
