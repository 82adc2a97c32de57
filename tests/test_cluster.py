"""Cluster-culled closest-hit (ops/clusters.py + ops/cluster_sweep.py).

Cross-checks the culled/windowed/sorted query against the brute-force linear
scan (the reference's own fallback semantics, render_manager.h:71-84) on the
reference worlds — the same equality contract the tensor/pallas/bvh paths
satisfy (tests/test_tensor_sweep.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.core.camera import get_rays
from pathtracer_tpu.ops import intersect
from pathtracer_tpu.ops.clusters import build_cluster_tables
from pathtracer_tpu.ops.cluster_sweep import (cluster_closest,
                                              make_cluster_closest_hit)
from pathtracer_tpu.scene import worlds

T_MIN = 1e-3


def _camera_rays(scene_cam, n, key=0):
    scene, cam = scene_cam
    k = jax.random.PRNGKey(key)
    u = jax.random.uniform(k, (4, n), jnp.float32)
    o, d, _ = get_rays(cam, u[0], u[1], u[2], u[3],
                       jnp.zeros(n, jnp.float32))
    return scene, o, d


def _check_vs_brute(scene, ct, o, d, query=None, **kw):
    """Culled result must match the dense tensor sweep bit-exactly (same
    per-pair epilogue arithmetic; only tie winners may differ), and brute
    force loosely (the known matmul-vs-factored ulp divergence,
    tests/test_tensor_sweep.py)."""
    from pathtracer_tpu.ops import tensor_sweep
    query = query or cluster_closest
    idx_c, t_c, v_c = query(ct, o, d, T_MIN, **kw)
    tables = tensor_sweep.pack_sweep_tables(ct.scene)
    idx_t, t_t, v_t = tensor_sweep.tensor_closest(
        tables, o, d, jnp.float32(T_MIN), intersect.BIG_T)
    # Grazing sphere hits (disc = B^2 - a*C0 ~ 0) amplify ulp-level
    # differences in the matmul lowering to ~1e-4 in t, so bit-exactness
    # across *any* two computation paths is unattainable for those rays
    # (the standalone kernel vs the XLA dot already differ); everything
    # else must agree exactly.
    v_c, v_t = np.asarray(v_c), np.asarray(v_t)
    assert (v_c == v_t).mean() > 0.995
    hit = v_c & v_t
    np.testing.assert_allclose(np.asarray(t_c)[hit],
                               np.asarray(t_t)[hit], rtol=2e-4)
    exact = hit & (np.asarray(t_c) == np.asarray(t_t))
    # Bit-exactness across computation paths is only a property of the
    # *triangle* epilogue (div-only arithmetic; measured 100% here).
    # Sphere-winner t passes through sqrt(B^2 - a*C0) whose cancellation
    # amplifies matmul-route/fusion ulps to ~1e-6 relative — measured
    # ~40-55% bit-exact between the interpret kernel and the XLA scan even
    # BEFORE the residual moved to an XLA sweep, and dependent on fusion
    # decisions we don't control. Contract: triangles bit-exact, spheres
    # rtol (asserted above) + winner agreement (below).
    regular = hit & (np.asarray(idx_c) < ct.C_reg * ct.K)
    pt = np.asarray(ct.scene.prim_type)
    from pathtracer_tpu.scene.scene import PRIM_SPHERE
    tri_w = regular & (pt[np.asarray(idx_c)] != PRIM_SPHERE)
    if tri_w.sum() >= 20:
        assert exact[tri_w].mean() > 0.95, \
            "triangle-winner hits must be bit-exact vs tensor sweep"
    same_win = np.asarray(idx_c)[exact] == np.asarray(idx_t)[exact]
    assert same_win.mean() > 0.999, "non-tie winner mismatch"
    res = hit & ~regular
    if res.any():
        same_res = np.asarray(idx_c)[res] == np.asarray(idx_t)[res]
        assert same_res.mean() > 0.99, "residual winner mismatch"
    # loose brute-force sanity (factored-form arithmetic differs at ~1e-4
    # relative on large-extent scenes — same bound the tensor tests use)
    idx_b, t_b, v_b = intersect.brute_force_closest(
        scene, o, d, jnp.float32(T_MIN), intersect.BIG_T)
    assert (v_c == np.asarray(v_b)).mean() > 0.995
    both = hit & np.asarray(v_b)
    rel = np.abs(np.asarray(t_c)[both] - np.asarray(t_b)[both]) \
        / np.abs(np.asarray(t_b)[both])
    assert (rel < 1e-3).mean() > 0.99, rel.max()


def test_build_invariants():
    scene, _ = worlds.random_world(seed=7)
    ct = build_cluster_tables(scene)
    n0 = scene.num_prims
    total = (ct.C_reg + 1) * ct.K
    perm = np.asarray(ct.perm)
    # a permutation: every original row appears exactly once
    assert sorted(perm.tolist()) == list(range(total))
    # reordered rows match the originals
    v0_orig = np.asarray(scene.v0)
    v0_new = np.asarray(ct.scene.v0)
    real = perm < n0
    np.testing.assert_array_equal(v0_new[real], v0_orig[perm[real]])
    # cluster AABBs contain their member prims
    bmin = np.asarray(ct.scene.box_min)[:ct.C_reg * ct.K]
    bmax = np.asarray(ct.scene.box_max)[:ct.C_reg * ct.K]
    cmin = np.asarray(ct.cmin)
    cmax = np.asarray(ct.cmax)
    k = ct.K
    for c in range(ct.C_reg):
        rows = slice(c * k, (c + 1) * k)
        ok = bmin[rows, 0] <= bmax[rows, 0]  # skip inverted padding boxes
        assert (bmin[rows][ok] >= cmin[c] - 1e-4).all()
        assert (bmax[rows][ok] <= cmax[c] + 1e-4).all()
    # the 1000-radius backdrop sphere is routed to the residual tile
    radius = np.asarray(ct.scene.radius)
    residual_rows = radius[ct.C_reg * ct.K:]
    assert (np.abs(residual_rows) >= 999).any()
    assert (np.abs(radius[:ct.C_reg * ct.K]) < 999).all()


def test_lights_remapped():
    scene, _ = worlds.get_world("cornell")
    ct = build_cluster_tables(scene)
    assert ct.scene.num_lights == scene.num_lights
    old = np.sort(np.asarray(scene.prim_mat)[np.asarray(scene.light_idx)])
    new = np.sort(
        np.asarray(ct.scene.prim_mat)[np.asarray(ct.scene.light_idx)])
    np.testing.assert_array_equal(old, new)


@pytest.mark.parametrize("world", ["random", "triangle", "cornell"])
def test_matches_brute_camera_rays(world):
    scene, o, d = _camera_rays(worlds.get_world(world), 512, key=1)
    ct = build_cluster_tables(scene)
    _check_vs_brute(scene, ct, o, d)


@pytest.mark.parametrize("world", ["random", "cornell"])
@pytest.mark.parametrize("sort_rays", [True, False])
def test_march_matches_brute(world, sort_rays):
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world(world), 512, key=1)
    ct = build_cluster_tables(scene)
    _check_vs_brute(scene, ct, o, d,
                    query=lambda *a, **k: cluster_march(
                        *a, sort_rays=sort_rays, **k))


def test_march_incoherent_and_dead():
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, _ = worlds.random_world(seed=11)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    o = jax.random.uniform(k1, (512, 3), jnp.float32, -8.0, 8.0)
    d = jax.random.normal(k2, (512, 3), jnp.float32)
    d = jnp.where(((jnp.arange(512) % 5) == 0)[:, None], 0.0, d)
    ct = build_cluster_tables(scene)
    idx_m, t_m, v_m = cluster_march(ct, o, d, T_MIN)
    idx_r, t_r, v_r = cluster_closest(ct, o, d, T_MIN)
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(v_r))
    hit = np.asarray(v_r)
    # 1e-3: march and rounds pipeline associate the fused6 contraction
    # differently (window widths), and incoherent rays against the random
    # world's big backdrop spheres sit in the sqrt-cancellation regime
    # where ulp input differences amplify ~100x (see
    # test_march_matches_brute's sphere-tolerance note)
    np.testing.assert_allclose(np.asarray(t_m)[hit], np.asarray(t_r)[hit],
                               rtol=1e-3)
    dead = np.asarray((jnp.arange(512) % 5) == 0)
    assert not np.asarray(v_m)[dead].any()


def test_matches_brute_unsorted_mode():
    scene, o, d = _camera_rays(worlds.get_world("random"), 384, key=2)
    ct = build_cluster_tables(scene)
    _check_vs_brute(scene, ct, o, d, sort_rays=False)


def test_matches_brute_forced_fallback():
    # max_rounds=0 pushes every ray through the exact fallback pass
    scene, o, d = _camera_rays(worlds.get_world("random"), 256, key=3)
    ct = build_cluster_tables(scene)
    _check_vs_brute(scene, ct, o, d, max_rounds=0)


def test_matches_brute_incoherent_rays():
    # random origins inside the scene ball, random directions — the
    # worst-case (post-bounce) wavefront
    scene, _ = worlds.random_world(seed=11)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    o = jax.random.uniform(k1, (512, 3), jnp.float32, -8.0, 8.0)
    d = jax.random.normal(k2, (512, 3), jnp.float32)
    ct = build_cluster_tables(scene)
    _check_vs_brute(scene, ct, o, d)


def test_dead_rays_resolve_as_miss():
    scene, o, d = _camera_rays(worlds.get_world("random"), 256, key=5)
    ct = build_cluster_tables(scene)
    dead = (jnp.arange(256) % 3) == 0
    d_m = jnp.where(dead[:, None], 0.0, d)
    idx, t, valid = cluster_closest(ct, o, d_m, T_MIN)
    assert not np.asarray(valid)[np.asarray(dead)].any()
    # live lanes unaffected by dead neighbours
    idx2, t2, valid2 = cluster_closest(ct, o, d, T_MIN)
    live = ~np.asarray(dead)
    np.testing.assert_array_equal(np.asarray(valid)[live],
                                  np.asarray(valid2)[live])
    np.testing.assert_array_equal(np.asarray(t)[live],
                                  np.asarray(t2)[live])


def test_render_image_cluster_matches_tensor():
    from pathtracer_tpu.render.renderer import render_image
    scene, cam = worlds.get_world("random")
    base = RenderConfig(width=48, height=27, spp=2, max_depth=4,
                        ray_chunk=48 * 27, scene="random")
    img_t = np.asarray(render_image(scene, cam, base.replace(accel="tensor")))
    img_c = np.asarray(
        render_image(scene, cam, base.replace(accel="cluster")))
    # grazing-hit pixels may pick a different (equal-t) winner
    bad = ~np.isclose(img_c, img_t, atol=1e-5)
    assert bad.sum() <= 2 * 3, (bad.sum(), np.abs(img_c - img_t).max())


def test_factory_contract():
    scene, o, d = _camera_rays(worlds.get_world("random"), 128, key=6)
    ct = build_cluster_tables(scene)
    closest = make_cluster_closest_hit(ct, T_MIN)
    assert closest.handles_dead
    idx, t, valid = jax.jit(closest)(o, d)
    assert idx.shape == (128,) and t.shape == (128,) and valid.shape == (128,)


def test_march_rows_match_scene_rows():
    """The kernel-emitted winner rows equal the scene's packed hit fields
    (what hit_records_from_prims would gather)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("random"), 384, key=9)
    ct = build_cluster_tables(scene)
    idx, t, valid, rows = cluster_march(ct, o, d, T_MIN, with_rows=True)
    sc = ct.scene
    packed = np.concatenate([
        np.asarray(sc.prim_type, np.float32)[:, None],
        np.asarray(sc.v0), np.asarray(sc.e1), np.asarray(sc.e2),
        np.asarray(sc.radius)[:, None], np.asarray(sc.tri_normal),
        np.asarray(sc.prim_mat, np.float32)[:, None],
        np.zeros((sc.num_prims, 1), np.float32)], axis=1)
    hit = np.asarray(valid)
    # kernel rows are field-major (16, R)
    np.testing.assert_array_equal(np.asarray(rows).T[hit],
                                  packed[np.asarray(idx)[hit]])


def test_march_rows_cond_bit_identical(monkeypatch):
    """PT_CLUSTER_ROWSCOND=1 (skip the winner-rows extraction matmul on
    windows where no lane improved) is bit-identical to the default: a
    window with no improved lane contributes nothing through the selects,
    so skipping it entirely changes no value."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=5)
    ct = build_cluster_tables(scene, K=64)
    monkeypatch.setenv("PT_CLUSTER_ROWSCOND", "0")  # unconditional form
    ref = cluster_march(ct, o, d, T_MIN, with_rows=True)
    monkeypatch.setenv("PT_CLUSTER_ROWSCOND", "1")  # the default
    got = cluster_march(ct, o, d, T_MIN, with_rows=True)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_render_rows_path_matches_gather_path():
    """accel=cluster renders identically whether hit rows come from the
    kernel or the scene gather (integrator picks the kernel path)."""
    from pathtracer_tpu.render.renderer import render_image
    scene, cam = worlds.get_world("random")
    cfg = RenderConfig(width=40, height=24, spp=2, max_depth=4,
                       ray_chunk=40 * 24, scene="random", accel="cluster")
    img_c = np.asarray(render_image(scene, cam, cfg))
    img_t = np.asarray(render_image(scene, cam, cfg.replace(accel="tensor")))
    # a couple of grazing-hit pixels may pick a different (equal-t) winner
    bad = ~np.isclose(img_c, img_t, atol=1e-5)
    assert bad.sum() <= 2 * 3, (bad.sum(), np.abs(img_c - img_t).max())


def test_query_shadow_occlusion_matches_closest_hit():
    """The t_max=1 shadow query gives the same occlusion verdict as the
    full closest-hit (occluded iff some hit lands below t = 1 - eps), and
    identical t where both report a hit."""
    scene, cam = worlds.get_world("cornell")
    ct = build_cluster_tables(scene)
    closest = make_cluster_closest_hit(ct, T_MIN)
    key = jax.random.PRNGKey(11)
    n = 256
    o = jax.random.uniform(key, (n, 3)) * 400.0 + 70.0
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3)) * 300.0
    _, t0, v0 = closest(o, d)
    _, t1, v1 = closest.query_shadow(o, d)
    eps = 1e-3
    occ0 = np.asarray(v0 & (t0 < 1.0 - eps))
    occ1 = np.asarray(v1 & (t1 < 1.0 - eps))
    np.testing.assert_array_equal(occ0, occ1)
    both = np.asarray(v0) & np.asarray(v1)
    np.testing.assert_array_equal(np.asarray(t0)[both],
                                  np.asarray(t1)[both])
    # inactive lanes resolve as misses
    act = jnp.zeros((n,), bool)
    _, _, v2 = closest.query_shadow(o, d, act)
    assert not bool(v2.any())
    # non-chunk-aligned R with an active mask (pads must align too)
    m = 200
    act_m = jnp.arange(m) % 3 != 0
    _, t3, v3 = closest.query_shadow(o[:m], d[:m], act_m)
    occ3 = np.asarray(v3 & (t3 < 1.0 - eps))
    np.testing.assert_array_equal(occ3, occ0[:m] & np.asarray(act_m))


def test_march_wide_variants_bit_identical(monkeypatch):
    """Every march body variant — 1-wide, W-wide windows, the software
    pipeline — returns bit-identical (idx, t, valid): the W-wide window
    argmin reproduces sequential strict-better order, sentinel slots are
    masked, and the pipeline consumes the same sweep results in the same
    order (docs/DESIGN.md)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=3)
    ct = build_cluster_tables(scene)
    ref = None
    # Strict bit-identity is pinned under PT_SWEEP_PRECISION=highest: the
    # 6-pass enum sweep produces identical values at every window width,
    # so any t difference here is a STRUCTURAL march bug (masking,
    # ordering, sentinels, stream DMA). The production default ("fused6",
    # round 4) contracts 72 bf16 terms in one dot whose accumulation order
    # is shape-dependent on CPU (ulp-level) — its cross-variant agreement
    # is asserted value-level in test_march_wide_variants_fused6_agree.
    monkeypatch.setenv("PT_SWEEP_PRECISION", "highest")
    # Every variant pins GROUPED explicitly: since the default flipped to
    # grouped windows, bare WIDE=N would silently exercise the grouped body
    # and the per-slot W>1 march would lose its bit-identity coverage
    # (ADVICE r3). GROUPED=0 rows are the per-slot path; GROUPED=1 the
    # production grouped windows.
    for env in ({"PT_CLUSTER_WIDE": "1"},
                {"PT_CLUSTER_WIDE": "2", "PT_CLUSTER_GROUPED": "0"},
                {"PT_CLUSTER_WIDE": "3", "PT_CLUSTER_GROUPED": "0"},
                {"PT_CLUSTER_WIDE": "4", "PT_CLUSTER_GROUPED": "0"},
                {"PT_CLUSTER_WIDE": "2", "PT_CLUSTER_PIPE": "1",
                 "PT_CLUSTER_GROUPED": "0"},
                {"PT_CLUSTER_WIDE": "2", "PT_CLUSTER_GROUPED": "1"},
                {"PT_CLUSTER_WIDE": "4", "PT_CLUSTER_GROUPED": "1"},
                {"PT_CLUSTER_WIDE": "8", "PT_CLUSTER_GROUPED": "1"},
                {"PT_CLUSTER_WIDE": "4", "PT_CLUSTER_GROUPED": "1",
                 "PT_CLUSTER_PIPE": "1"},
                {"PT_CLUSTER_WIDE": "4", "PT_CLUSTER_GROUPED": "1",
                 "PT_CLUSTER_SPLIT": "1"},
                # streamed-table march: HBM-resident tables, per-window
                # DMA into double-buffered scratch — byte-identical blocks
                # so bit-identical results
                {"PT_CLUSTER_STREAM": "1"},
                {"PT_CLUSTER_STREAM": "1", "PT_CLUSTER_WIDE": "1"},
                {"PT_CLUSTER_STREAM": "1", "PT_CLUSTER_WIDE": "4",
                 "PT_CLUSTER_GROUPED": "1"},
                # HBM order rows, cluster tables resident (the SMEM
                # scalar-prefetch wall lift) — same order, same arithmetic
                {"PT_CLUSTER_ORDDMA": "1"},
                {"PT_CLUSTER_ORDDMA": "1", "PT_CLUSTER_WIDE": "4",
                 "PT_CLUSTER_GROUPED": "1"},
                # narrow-first window: one W1-wide head window before the
                # wide loop — identical tie rule (lowest order slot wins
                # in every partitioning), so still bit-identical
                {"PT_CLUSTER_WIDE": "4", "PT_CLUSTER_GROUPED": "1",
                 "PT_CLUSTER_NARROW": "1"},
                {"PT_CLUSTER_WIDE": "8", "PT_CLUSTER_GROUPED": "1",
                 "PT_CLUSTER_NARROW": "2"},
                {"PT_CLUSTER_WIDE": "8", "PT_CLUSTER_GROUPED": "1",
                 "PT_CLUSTER_NARROW": "2", "PT_CLUSTER_ORDDMA": "1"},
                # chunking-invariance: a 256-ray tile regroups chunks but
                # the march still finds each ray's exact min (same winning
                # visit, same arithmetic)
                {"PT_CLUSTER_WIDE": "2", "_RAY_TILE": "256"}):
        kw = {}
        if "_RAY_TILE" in env:
            kw["ray_tile"] = int(env.pop("_RAY_TILE"))
        # reset every knob between variants: monkeypatch.setenv persists for
        # the whole test, so without this a variant would inherit the
        # previous row's knobs (e.g. PIPE=1 leaking into the GROUPED rows)
        for k in ("PT_CLUSTER_WIDE", "PT_CLUSTER_PIPE", "PT_CLUSTER_GROUPED",
                  "PT_CLUSTER_SPLIT", "PT_CLUSTER_STREAM",
                  "PT_CLUSTER_ORDDMA", "PT_CLUSTER_NARROW"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        idx, t, valid = cluster_march(ct, o, d, T_MIN, **kw)
        if ref is None:
            ref = (np.asarray(idx), np.asarray(t), np.asarray(valid))
        else:
            np.testing.assert_array_equal(np.asarray(valid), ref[2], env)
            np.testing.assert_array_equal(np.asarray(t), ref[1], env)
            np.testing.assert_array_equal(np.asarray(idx), ref[0], env)
        for k in env:
            monkeypatch.delenv(k)


def test_march_wide_variants_fused6_agree(monkeypatch):
    """Cross-variant agreement under the PRODUCTION default (fused6): the
    72-term bf16 contraction's f32 accumulation order varies with window
    width on CPU, so t is rtol-tight rather than bit-equal across W —
    winners and validity must still match exactly (an idx/valid difference
    is a structural bug, not summation order)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=3)
    ct = build_cluster_tables(scene)
    ref = None
    for env in ({"PT_CLUSTER_WIDE": "1"},
                {"PT_CLUSTER_WIDE": "8", "PT_CLUSTER_GROUPED": "1"},
                {"PT_CLUSTER_STREAM": "1"}):
        for k in ("PT_CLUSTER_WIDE", "PT_CLUSTER_GROUPED",
                  "PT_CLUSTER_STREAM"):
            monkeypatch.delenv(k, raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        idx, t, valid = cluster_march(ct, o, d, T_MIN)
        if ref is None:
            ref = (np.asarray(idx), np.asarray(t), np.asarray(valid))
        else:
            np.testing.assert_array_equal(np.asarray(valid), ref[2], env)
            np.testing.assert_array_equal(np.asarray(idx), ref[0], env)
            hit = ref[2]
            np.testing.assert_allclose(np.asarray(t)[hit], ref[1][hit],
                                       rtol=2e-6, err_msg=str(env))


def test_march_small_k_split_matches(monkeypatch):
    """Small clusters (K=32/64) through the split-table grouped march give
    the same hits as the K=128 reference march. Raw indices differ across K
    (they address the reordered+padded table), so agreement is checked on
    the ORIGINAL prim id via ct.perm; accepted t must be bit-identical (the
    winning pair runs the same epilogue arithmetic at any K)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=3)

    ct128 = build_cluster_tables(scene, K=128)
    idx0, t0, v0 = cluster_march(ct128, o, d, T_MIN)
    orig0 = np.asarray(ct128.perm)[np.asarray(idx0)]

    monkeypatch.setenv("PT_CLUSTER_GROUPED", "1")
    monkeypatch.setenv("PT_CLUSTER_SPLIT", "1")
    for K, wide in ((32, 8), (32, 4), (64, 4), (64, 2)):
        monkeypatch.setenv("PT_CLUSTER_WIDE", str(wide))
        ct = build_cluster_tables(scene, K=K)
        idx, t, v = cluster_march(ct, o, d, T_MIN)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v0),
                                      (K, wide))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(t0),
                                      (K, wide))
        orig = np.asarray(ct.perm)[np.asarray(idx)]
        vmask = np.asarray(v0)
        np.testing.assert_array_equal(orig[vmask], orig0[vmask], (K, wide))


def test_huge_prim_clamp_beyond_k_res():
    """More huge primitives than the residual tile's K_RES capacity: the
    K_RES largest go residual, the rest demote to regular clusters
    (ops/clusters.py) — results must still match the dense sweep."""
    import numpy as np
    from pathtracer_tpu.ops.clusters import K_RES
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    from pathtracer_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambertian((0.5, 0.5, 0.5))
    rng = np.random.default_rng(5)
    # small prims establish the median extent
    for c in rng.uniform(-5, 5, (200, 3)):
        b.add_sphere(c, 0.1, m)
    # K_RES + 4 huge spheres (extent >> 16x median): clamp must demote 4
    for i in range(K_RES + 4):
        b.add_sphere((i * 40.0 - 200.0, -60.0, 0.0), 50.0 + i, m)
    scene = b.build()
    ct = build_cluster_tables(scene)

    k = jax.random.PRNGKey(2)
    o = jax.random.uniform(k, (384, 3)) * 30.0 - 15.0
    d = jax.random.normal(jax.random.fold_in(k, 1), (384, 3)) * 40.0
    _check_vs_brute(scene, ct, o, d, query=cluster_march)


def test_stream_march_beyond_vmem_scale(monkeypatch):
    """The streamed march's whole reason to exist: a scene whose cluster
    table exceeds the ~16 MB VMEM budget (the resident march's capacity
    wall, docs/DESIGN.md). 80k prims -> ~15.4 MB cols + rows/sph/valid on
    top; the streamed path must agree with brute force exactly."""
    import numpy as np
    from pathtracer_tpu.ops.cluster_sweep import BIG, cluster_march
    from pathtracer_tpu.ops import intersect
    from pathtracer_tpu.scene.scene import PRIM_SPHERE, Scene

    n = 80_000
    rng = np.random.default_rng(7)
    m = int(np.ceil(n ** (1.0 / 3.0)))
    g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                  axis=-1).reshape(-1, 3)[:n]).astype(np.float32)
    spacing = 20.0 / m
    centers = ((g + 0.5 + 0.35 * rng.standard_normal((n, 3))) * spacing
               - 10.0).astype(np.float32)
    radius = (0.25 * spacing) * np.ones(n, np.float32)
    z3 = np.zeros((n, 3), np.float32)
    bmin, bmax = centers - radius[:, None], centers + radius[:, None]
    scene = Scene(
        prim_type=jnp.full((n,), PRIM_SPHERE, jnp.int32),
        v0=jnp.asarray(centers), e1=jnp.asarray(z3), e2=jnp.asarray(z3),
        radius=jnp.asarray(radius), tri_normal=jnp.asarray(z3),
        prim_mat=jnp.zeros((n,), jnp.int32),
        box_min=jnp.asarray(bmin), box_max=jnp.asarray(bmax),
        mat_type=jnp.zeros((1,), jnp.int32),
        albedo=jnp.full((1, 3), 0.5, jnp.float32),
        fuzz=jnp.zeros((1,), jnp.float32), ir=jnp.zeros((1,), jnp.float32),
        emit=jnp.zeros((1, 3), jnp.float32),
        tex_id=jnp.full((1,), -1, jnp.int32),
        world_min=jnp.asarray(bmin.min(axis=0)),
        world_max=jnp.asarray(bmax.max(axis=0)),
        light_idx=jnp.zeros((0,), jnp.int32),
        textures=jnp.zeros((0, 8, 8, 3), jnp.float32))
    ct = build_cluster_tables(scene)
    assert ct.cols.size * 4 > 15e6  # genuinely beyond the resident wall

    monkeypatch.setenv("PT_CLUSTER_STREAM", "1")
    R = 128
    o = jnp.tile(jnp.array([[0.0, 0.0, -15.0]]), (R, 1))
    d = jax.random.normal(jax.random.PRNGKey(3), (R, 3))
    idx, t, valid = cluster_march(ct, o, d, T_MIN)
    idx_b, t_b, v_b = intersect.brute_force_closest(
        ct.scene, o, d, jnp.float32(T_MIN), BIG)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(v_b))
    vm = np.asarray(v_b)
    np.testing.assert_array_equal(np.asarray(idx)[vm], np.asarray(idx_b)[vm])
    np.testing.assert_allclose(np.asarray(t)[vm], np.asarray(t_b)[vm],
                               rtol=1e-4)


@pytest.mark.parametrize("world", ["bunny", "cornell"])
def test_render_image_cluster_stream_bit_identical(monkeypatch, world):
    """End-to-end render through the sorted-wavefront integrator with the
    streamed march == the resident march, bit for bit (extras + winner-row
    emission ride the streamed path; cornell adds NEE shadow queries with
    their t_max=1 march gate)."""
    import numpy as np
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image

    scene, cam = worlds.get_world(world)
    nee = world == "cornell"
    cfg = RenderConfig(width=48, height=48 if nee else 27, spp=2,
                       max_depth=3, accel="cluster",
                       ray_chunk=48 * (48 if nee else 27), scene=world,
                       sky=not nee, nee=nee)
    # bit-identity is pinned under highest (stream and resident then share
    # the exact same 6-pass arithmetic — any pixel difference is a DMA /
    # ordering bug); the fused6 default is checked allclose separately
    # below (its 72-term contraction order differs by window shape on CPU)
    monkeypatch.setenv("PT_SWEEP_PRECISION", "highest")
    ref = np.asarray(render_image(scene, cam, cfg, seed=5))
    monkeypatch.setenv("PT_CLUSTER_STREAM", "1")
    img = np.asarray(render_image(scene, cam, cfg, seed=5))
    np.testing.assert_array_equal(img, ref)
    monkeypatch.delenv("PT_SWEEP_PRECISION")
    img6 = np.asarray(render_image(scene, cam, cfg, seed=5))
    monkeypatch.delenv("PT_CLUSTER_STREAM")
    ref6 = np.asarray(render_image(scene, cam, cfg, seed=5))
    # under the fused6 default, stream (inline expansion) and resident
    # (pre-expanded) associate the 72-term contraction differently —
    # razor-edge winners may flip on isolated samples (big single-pixel
    # diffs at 2 spp); the images must agree everywhere else
    d6 = np.abs(img6 - ref6)
    assert (d6 > 2e-3).mean() < 0.005, (d6 > 2e-3).mean()


def test_supercluster_cull_matches(monkeypatch):
    """PT_CLUSTER_SUPER=G culls/bins/orders at G-group granularity and
    expands visited superclusters into member clusters for the march —
    results must agree with the default march (idx equal away from exact
    ties; here the bunny has none at these rays)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=7)
    ct = build_cluster_tables(scene)
    idx0, t0, v0 = cluster_march(ct, o, d, T_MIN)
    for env in ({"PT_CLUSTER_SUPER": "4"},
                {"PT_CLUSTER_SUPER": "8"},
                {"PT_CLUSTER_SUPER": "4", "PT_CLUSTER_STREAM": "1"},
                {"PT_CLUSTER_SUPER": "4", "PT_CLUSTER_WIDE": "4",
                 "PT_CLUSTER_GROUPED": "1"},
                # G beyond C_reg: a single supercluster (degenerate but
                # legal — every chunk marches the whole list)
                {"PT_CLUSTER_SUPER": "64"}):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        idx1, t1, v1 = cluster_march(ct, o, d, T_MIN)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0), env)
        hit = np.asarray(v0)
        np.testing.assert_allclose(np.asarray(t1)[hit],
                                   np.asarray(t0)[hit], rtol=1e-6,
                                   err_msg=str(env))
        assert (np.asarray(idx1)[hit] == np.asarray(idx0)[hit]).all(), env
        for k in env:
            monkeypatch.delenv(k)


def test_cull2_two_level_matches(monkeypatch):
    """PT_CLUSTER_CULL2=1: super-granularity per-ray cull (bin key from
    entries, stop gate from EXITS) + interval-arithmetic per-chunk member
    ordering (VERDICT r4 #3). Results must agree with the default march —
    the kernel is unchanged, only the order/gate inputs differ."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("bunny"), 512, key=7)
    ct = build_cluster_tables(scene)
    idx0, t0, v0 = cluster_march(ct, o, d, T_MIN)
    for env in ({"PT_CLUSTER_CULL2": "1", "PT_CLUSTER_SUPER": "4"},
                {"PT_CLUSTER_CULL2": "1", "PT_CLUSTER_SUPER": "8"},
                {"PT_CLUSTER_CULL2": "1", "PT_CLUSTER_SUPER": "4",
                 "PT_CLUSTER_STREAM": "1"},
                # auto group sizing (C_reg/512 -> sup=1: degenerate but
                # legal — supers ARE the members then)
                {"PT_CLUSTER_CULL2": "1"}):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        idx1, t1, v1 = cluster_march(ct, o, d, T_MIN)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0), env)
        hit = np.asarray(v0)
        np.testing.assert_allclose(np.asarray(t1)[hit],
                                   np.asarray(t0)[hit], rtol=1e-6,
                                   err_msg=str(env))
        assert (np.asarray(idx1)[hit] == np.asarray(idx0)[hit]).all(), env
        for k in env:
            monkeypatch.delenv(k)


def test_cull2_incoherent_dead_and_shadow(monkeypatch):
    """cull2 under the adversarial wavefront: random origins/directions
    (direction intervals span zero -> the bundle cull must stay
    conservative), dead lanes mixed in (excluded from bundle hulls), and
    the t_max'd shadow query (unsorted path + gate clamp)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, _ = worlds.random_world(seed=11)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    o = jax.random.uniform(k1, (512, 3), jnp.float32, -8.0, 8.0)
    d = jax.random.normal(k2, (512, 3), jnp.float32)
    d = jnp.where(((jnp.arange(512) % 5) == 0)[:, None], 0.0, d)
    ct = build_cluster_tables(scene)
    idx0, t0, v0 = cluster_march(ct, o, d, T_MIN)
    s_idx0, s_t0, s_v0 = cluster_march(ct, o, d, T_MIN, sort_rays=False,
                                       t_max=1.0)
    monkeypatch.setenv("PT_CLUSTER_CULL2", "1")
    monkeypatch.setenv("PT_CLUSTER_SUPER", "4")
    idx1, t1, v1 = cluster_march(ct, o, d, T_MIN)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    hit = np.asarray(v0)
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                               rtol=1e-6)
    dead = np.asarray((jnp.arange(512) % 5) == 0)
    assert not np.asarray(v1)[dead].any()
    # shadow-style query: unsorted, t_max=1 gate clamp
    s_idx1, s_t1, s_v1 = cluster_march(ct, o, d, T_MIN, sort_rays=False,
                                       t_max=1.0)
    np.testing.assert_array_equal(np.asarray(s_v1), np.asarray(s_v0))
    s_hit = np.asarray(s_v0)
    np.testing.assert_allclose(np.asarray(s_t1)[s_hit],
                               np.asarray(s_t0)[s_hit], rtol=1e-6)


def test_livegrid_ladder_matches(monkeypatch):
    """PT_CLUSTER_LIVEGRID=1: the march reruns on the smallest prefix
    grid covering the sorted live lanes; chunks past the prefix get the
    identity padding the kernel would have written — results must be
    BIT-identical (same kernel, same arithmetic, same order)."""
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    scene, o, d = _camera_rays(worlds.get_world("random"), 512, key=9)
    # kill 3/4 of lanes -> live prefix ~1 chunk of 4 -> a small rung fires
    d = jnp.where((jnp.arange(512) % 4 != 0)[:, None], 0.0, d)
    ct = build_cluster_tables(scene)
    idx0, t0, v0 = cluster_march(ct, o, d, T_MIN)
    monkeypatch.setenv("PT_CLUSTER_LIVEGRID", "1")
    idx1, t1, v1 = cluster_march(ct, o, d, T_MIN)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx0))
    # all-live wavefront picks the full rung — still identical
    idx2, t2, v2 = cluster_march(ct, o, jnp.where(d == 0.0, 1.0, d), T_MIN)
    assert np.isfinite(np.asarray(t2)[np.asarray(v2)]).all()


def test_livegrid_render_matches(monkeypatch):
    """End-to-end: the sorted-wavefront render under the grid ladder is
    bit-identical (later bounces shrink the live prefix, exercising the
    small rungs through the query_sorted/extras path)."""
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image
    scene, cam = worlds.get_world("bunny")
    cfg = RenderConfig(width=64, height=36, spp=2, max_depth=4,
                       accel="cluster", ray_chunk=64 * 36, scene="bunny")
    ref = np.asarray(render_image(scene, cam, cfg, seed=5))
    monkeypatch.setenv("PT_CLUSTER_LIVEGRID", "1")
    img = np.asarray(render_image(scene, cam, cfg, seed=5))
    np.testing.assert_array_equal(img, ref)


def test_sort_once_mode_matches(monkeypatch):
    """PT_SORT_ONCE=1 bins the wavefront on the camera bounce only; later
    bounces march in that order (resort=False). Exact winners — images
    agree to fp round-off (chunk regrouping can move a sphere-epilogue
    ulp; anything larger would mean a wrong winner)."""
    import numpy as np
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import render_image

    scene, cam = worlds.get_world("bunny")
    cfg = RenderConfig(width=64, height=36, spp=2, max_depth=4,
                       accel="cluster", ray_chunk=64 * 36, scene="bunny")
    ref = np.asarray(render_image(scene, cam, cfg, seed=5))
    monkeypatch.setenv("PT_SORT_ONCE", "1")
    img = np.asarray(render_image(scene, cam, cfg, seed=5))
    np.testing.assert_allclose(img, ref, atol=2e-6)
