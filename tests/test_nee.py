"""Next-event estimation: unbiasedness vs naive sampling, occlusion, and
no-double-counting (render/lights.py + integrator nee path)."""
import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.core.camera import make_camera
from pathtracer_tpu.render import lights
from pathtracer_tpu.render.renderer import render_image
from pathtracer_tpu.scene.scene import SceneBuilder


def _lit_scene(blocker=False):
    """Lambertian ground sphere lit by a small emissive sphere overhead."""
    b = SceneBuilder()
    g = b.add_lambertian((0.7, 0.6, 0.5))
    b.add_sphere((0, -100.5, -3), 100.0, g)
    e = b.add_emissive((24.0, 20.0, 16.0))
    b.add_sphere((0, 3.0, -3), 0.6, e)
    if blocker:
        blk = b.add_lambertian((0.1, 0.1, 0.1))
        b.add_sphere((0, 1.2, -3), 0.8, blk)
    cam = make_camera((0, 1.2, 2.0), (0, 0, -3), 55, 1.0, aperture=0,
                      focus_dist=5)
    return b.build(), cam


BASE = RenderConfig(width=12, height=12, spp=8, max_depth=3, accel="brute",
                    ray_chunk=144, sky=False, scene="test")


def test_scene_light_list():
    scene, _ = _lit_scene()
    assert scene.num_lights == 1
    assert int(scene.light_idx[0]) == 1  # the emissive sphere


def test_sample_lights_geometry():
    scene, _ = _lit_scene()
    u = jax.random.uniform(jax.random.PRNGKey(0), (256, 3))
    p, n, emit, pdf = lights.sample_lights(scene, u)
    # all points on the light sphere surface
    d = np.linalg.norm(np.asarray(p) - np.array([0, 3.0, -3]), axis=1)
    np.testing.assert_allclose(d, 0.6, rtol=1e-5)
    # normals unit + radial
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=1), 1.0,
                               rtol=1e-5)
    area = 4 * np.pi * 0.6 ** 2
    np.testing.assert_allclose(np.asarray(pdf), 1.0 / area, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(emit), np.tile([24.0, 20.0, 16.0], (256, 1)), rtol=1e-6)


def test_nee_matches_naive_energy():
    """NEE at 32 spp must agree with naive sampling at high spp — same
    integral, different estimator (unbiasedness check in linear light)."""
    scene, cam = _lit_scene()
    naive = np.asarray(render_image(
        scene, cam, BASE.replace(spp=3000, nee=False))) ** 2
    with_nee = np.asarray(render_image(
        scene, cam, BASE.replace(spp=32, nee=True))) ** 2
    # compare scene-average radiance (the ground region dominates)
    assert abs(with_nee.mean() - naive.mean()) / naive.mean() < 0.12, (
        with_nee.mean(), naive.mean())


def test_nee_occlusion():
    """A blocker between ground and light kills the direct term."""
    scene, cam = _lit_scene(blocker=True)
    img = np.asarray(render_image(scene, cam,
                                  BASE.replace(spp=32, nee=True)))
    scene_open, _ = _lit_scene(blocker=False)
    img_open = np.asarray(render_image(scene_open, cam,
                                       BASE.replace(spp=32, nee=True)))
    # shadowed scene is darker overall (the blocker kills direct light in
    # its umbra; indirect + unshadowed ground keep the rest lit)
    assert img.mean() < img_open.mean() * 0.92, (img.mean(), img_open.mean())


def test_emissive_seen_directly_not_double_counted():
    """Pixels that see the light directly must show ~emit with and without
    NEE (camera rays always count emissive hits)."""
    scene, cam = _lit_scene()
    cam = make_camera((0, 3.0, 0.0), (0, 3.0, -3), 30, 1.0, aperture=0,
                      focus_dist=3)
    a = np.asarray(render_image(scene, cam, BASE.replace(spp=4, nee=False)))
    b = np.asarray(render_image(scene, cam, BASE.replace(spp=4, nee=True)))
    center = (slice(4, 8), slice(4, 8))
    np.testing.assert_allclose(a[center], b[center], atol=1e-6)
    assert a[center][..., 0].min() > 0.9  # bright light pixels (gamma'd)


def test_mis_weights_sum_to_one():
    """For any (surface point, light point) pair, the NEE weight and the
    BSDF weight of the same path must sum to 1 (balance heuristic)."""
    import jax
    from pathtracer_tpu.core import vec as vecm
    scene, cam = _lit_scene()
    # NEE side at a fixed geometry
    rec_p = jnp.array([[0.0, -0.5, -3.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    light_p = jnp.array([[0.3, 3.0 - 0.6, -3.0]])  # bottom of light sphere
    seg = light_p - rec_p
    dist2 = float(vecm.dot(seg, seg)[0])
    inv_d = 1.0 / np.sqrt(dist2)
    cos_s = float(vecm.dot(n, seg)[0]) * inv_d
    n_l = jnp.array([[0.3 / 0.6, -1.0, 0.0]])
    n_l = n_l / jnp.linalg.norm(n_l)
    cos_l = abs(float(vecm.dot(n_l, seg)[0])) * inv_d
    area = 4 * np.pi * 0.36
    pdf_area = 1.0 / area  # one light
    p_light = pdf_area * dist2 / cos_l
    p_bsdf = cos_s / np.pi
    w_nee = p_light / (p_light + p_bsdf)
    w_bsdf = p_bsdf / (p_bsdf + p_light)
    np.testing.assert_allclose(w_nee + w_bsdf, 1.0, rtol=1e-6)


def test_mis_reduces_variance_of_specularish_light():
    """MIS: the BSDF-hit path now carries partial weight, so per-pixel
    variance near the light's reflection should not exceed pure NEE's by
    much, while the energy stays unbiased (checked against naive)."""
    scene, cam = _lit_scene()
    nee32 = np.asarray(render_image(scene, cam,
                                    BASE.replace(spp=64, nee=True))) ** 2
    naive = np.asarray(render_image(
        scene, cam, BASE.replace(spp=3000, nee=False))) ** 2
    assert abs(nee32.mean() - naive.mean()) / naive.mean() < 0.12


def test_glossy_nee_unbiased_and_lower_variance():
    """Fuzzy-metal NEE (render/lights.metal_lobe_pdf): light-sampling the
    glossy lobe must agree with naive path tracing in the mean and converge
    faster (lower seed-to-seed variance at equal spp)."""
    import jax.numpy as jnp

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image
    from pathtracer_tpu.scene.scene import SceneBuilder
    from pathtracer_tpu.core.camera import make_camera

    b = SceneBuilder()
    glossy = b.add_metal((0.9, 0.8, 0.7), 0.4)
    # fuzzy-metal floor seen by the camera, emitter above. The lamp is
    # deliberately LARGE and dim (same power as a 0.3-radius x40 emitter):
    # the *naive* reference estimator is firefly-dominated for small bright
    # lights — its image mean swung +-13% between sample sets, drowning the
    # unbiasedness comparison — while a ~1-radius lamp tames its variance
    # ~25x so the 15% gate actually resolves bias.
    b.add_triangle((-6, 0, -6), (6, 0, -6), (-6, 0, 6), glossy)
    b.add_triangle((6, 0, -6), (6, 0, 6), (-6, 0, 6), glossy)
    lamp = b.add_emissive((3.6, 3.6, 3.6))
    b.add_sphere((0, 4.0, 0), 1.0, lamp)
    scene = b.build()
    cam = make_camera((0, 3.0, 8.0), (0, 0.5, 0), 40, 16 / 9,
                      aperture=0, focus_dist=8, time0=0, time1=0)

    base = RenderConfig(width=48, height=27, spp=16, max_depth=3, sky=False,
                        accel="brute", ray_chunk=48 * 27, scene="test")

    def mean_and_var(cfg, seeds=8):
        imgs = [np.asarray(render_image(scene, cam, cfg, seed=s)) ** 2
                for s in range(seeds)]  # undo gamma -> linear radiance
        imgs = np.stack(imgs)
        return imgs.mean(), imgs.mean(axis=0), imgs.var(axis=0).mean()

    _, mean_nee, var_nee = mean_and_var(base.replace(nee=True))
    _, mean_naive, var_naive = mean_and_var(base.replace(nee=False))
    # unbiased: image means agree within Monte-Carlo noise
    assert abs(mean_nee.mean() - mean_naive.mean()) < 0.15 * max(
        mean_naive.mean(), 1e-3), (mean_nee.mean(), mean_naive.mean())
    # variance: glossy NEE must cut noise substantially on this workload
    # (the big dim lamp that makes the mean comparison resolvable also
    # helps the naive estimator — the measured reduction here is ~1.9x,
    # vs far larger on small-bright-light scenes)
    assert var_nee < 0.7 * var_naive, (var_nee, var_naive)
