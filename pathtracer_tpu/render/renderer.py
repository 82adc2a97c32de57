"""Top-level renderer: pixel grid -> rays -> integrator -> gamma'd image.

Replaces the reference render megakernel driver (``main.cu:271-294`` +
``renderToPng``, ``main.cu:462-487``). Execution shape is TPU-native:

- the image is flattened to a ray wavefront and processed in fixed-size
  chunks (``lax.map`` serializes chunks, bounding HBM working set),
- the spp loop is a ``lax.fori_loop`` accumulating into a framebuffer —
  one compilation, no per-sample relaunch,
- RNG is stateless: sample s of pixel p at bounce b derives from
  fold(seed, s, chunk, b) + array position (replaces curand state arrays,
  main.cu:262-269).

Pixel conventions match the reference: u = (col + xi)/W, v = (row + xi)/H
with row 0 at the *bottom* of the image (the PNG writer flips rows,
main.cu:477-483); writeback is gamma-2 ``sqrt(c/spp)`` (main.cu:290-293).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pathtracer_tpu import config as config_mod
from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.core import camera as camera_mod
from pathtracer_tpu.render import integrator
from pathtracer_tpu.scene.scene import Scene


def _pixel_grid(width: int, height: int):
    """(row, col) float arrays for the flattened framebuffer, row-major with
    curPixel = row * W + col (main.cu:275-280)."""
    rows = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
    cols = jnp.tile(jnp.arange(width, dtype=jnp.float32), (height,))
    return rows, cols


def _cluster_K(n_prims: int) -> int:
    """Cluster size for accel="cluster" (PT_CLUSTER_K overrides).

    K=64 since round 4: at equal window lanes (W=16 x K=64 vs W=8 x K=128),
    half-size clusters cull twice as selectively — +15% whole-render
    same-process (408 -> 354 ms, bunny bench). K<128 needs the split-table
    grouped march, which the STREAMED march does not support — scenes that
    will stream (tables above the resident budget, or PT_CLUSTER_STREAM=1
    forced) build K=128 tables instead (matching ops/cluster_sweep's
    auto-stream rule)."""
    import os
    kk = os.environ.get("PT_CLUSTER_K")
    if kk:
        return int(kk)
    budget = float(os.environ.get("PT_CLUSTER_RESIDENT_MB",
                                  "12")) * 1024 * 1024
    n_cl64 = -(-n_prims // 64)
    bytes64 = n_cl64 * (12 * 4 * 64 * 4 + 48 * 64 * 2 + 2 * 64 * 4)
    will_stream = (bytes64 > budget
                   or os.environ.get("PT_CLUSTER_STREAM") == "1")
    return 128 if will_stream else 64


# Bounded host-side cache of prebuilt cluster tables: bench/CLI call the
# jitted renderer several times with the SAME scene object — rebuild once.
_CT_CACHE: list = []  # [(id(scene), K, scene_ref, ct)] — strong refs, max 4


def prepare_cluster_tables(scene: Scene, accel: str = None):
    """Eagerly build cluster tables ON HOST for a concrete scene, or return
    None when the resolved accel isn't "cluster" (callers then follow the
    traced path).

    Host build matters at scale: the tables are one-time preprocessing made
    of dozens of eager ops, and the tunnel chip's ~24 ms per-call latency
    turns that into tens of minutes at 10^5+ prims (a 79k build that takes
    6 s on host never finished in 45 min eagerly on the chip, r4). Tracing
    the build into the jitted render is no better — the axon remote compile
    scales hard with program size (docs/DESIGN.md). So: build with numpy on
    the host CPU backend, ship the result to the device once, and pass it
    into the jitted render as an ARGUMENT (never a captured constant —
    embedded multi-MB constants blow up compile time the same way)."""
    if isinstance(scene.prim_type, jax.core.Tracer):
        return None
    if config_mod.resolve_accel(accel, scene.num_prims) != "cluster":
        return None
    from pathtracer_tpu.ops.cluster_sweep import build_cluster_tables
    import numpy as np
    K = _cluster_K(int(scene.num_prims))
    for sid, k_, _ref, ct in _CT_CACHE:
        if sid == id(scene) and k_ == K:
            return ct
    if jax.default_backend() != "cpu":
        cpu0 = jax.devices("cpu")[0]
        host_scene = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "dtype") else x, scene)
        with jax.default_device(cpu0):
            ct = jax.block_until_ready(
                build_cluster_tables(host_scene, K=K))
        ct = jax.device_put(ct, jax.devices()[0])
    else:
        ct = build_cluster_tables(scene, K=K)
    _CT_CACHE.append((id(scene), K, scene, ct))
    del _CT_CACHE[:-4]
    return ct


def _make_closest(scene: Scene, bvh, t_min: float, accel: str = None,
                  ct=None):
    """Pick the closest-hit query: the MXU tensor sweep (accel="tensor",
    TPU default), threaded-BVH traversal when a BVH is provided, or the
    linear scan (render_manager.h:71-84 fallback).

    accel="cluster" additionally *reorders the scene* (morton clustering,
    ops/clusters.py) and returns (closest, reordered_scene) — callers shade
    with the returned scene so hit indices stay consistent. ``ct`` is an
    optional prebuilt ClusterTables (prepare_cluster_tables — the host-built
    fast path); without it the build is traced (fine for small scenes and
    tracer callers like the sharded/differentiable paths)."""
    accel = config_mod.resolve_accel(accel, scene.num_prims)
    if accel == "cluster":
        import os
        from pathtracer_tpu.ops.cluster_sweep import (
            build_cluster_tables, make_cluster_closest_hit)
        # tuning knobs (experiment pattern like PT_SWEEP_PRECISION);
        # measured defaults live in ops/cluster_sweep.py
        kw = {}
        for k in ("ray_tile", "window", "max_rounds"):
            v = os.environ.get(f"PT_CLUSTER_{k.upper()}")
            if v:
                kw[k] = int(v)
        if os.environ.get("PT_CLUSTER_SORT", "1") == "0":
            kw["sort_rays"] = False
        st = os.environ.get("PT_CLUSTER_STRATEGY")
        if st:
            kw["strategy"] = st
        if ct is None:
            ct = build_cluster_tables(scene, K=_cluster_K(scene.num_prims))
        return make_cluster_closest_hit(ct, t_min, **kw), ct.scene
    if accel == "tensor":
        from pathtracer_tpu.ops.tensor_sweep import make_tensor_closest_hit
        return _with_shadow(make_tensor_closest_hit, scene, t_min), scene
    if accel == "pallas":
        from pathtracer_tpu.ops.pallas_sweep import make_pallas_closest_hit
        return _with_shadow(make_pallas_closest_hit, scene, t_min), scene
    if bvh is None:
        return (_with_shadow(integrator.make_brute_closest_hit, scene,
                             t_min), scene)
    from pathtracer_tpu.ops.traversal import make_bvh_closest_hit
    closest = make_bvh_closest_hit(scene, bvh, t_min)
    shadow = make_bvh_closest_hit(scene, bvh, config_mod.K_SHADOW_T_MIN)
    closest.query_shadow = lambda o, d, active=None: shadow(o, d)
    return closest, scene


def _with_shadow(factory, scene: Scene, t_min: float):
    """Attach a near-zero-t_min NEE shadow query to a closest-hit fn.

    Shadow segments are unnormalized (light at t == 1): the accel's
    parametric t_min is a proportional ignore window, so shadow queries use
    K_SHADOW_T_MIN instead — self-intersection is prevented by the absolute
    origin offset in render/lights.direct_lighting (config.py rationale)."""
    closest = factory(scene, t_min)
    shadow = factory(scene, config_mod.K_SHADOW_T_MIN)
    closest.query_shadow = lambda o, d, active=None: shadow(o, d)
    return closest


def _stratum_grid(spp: int) -> int:
    """Largest m with m^2 dividing spp (uniform stratified pixel filter)."""
    m = max(1, int(spp ** 0.5))
    while m > 1 and spp % (m * m) != 0:
        m -= 1
    return m


def render_sum(scene: Scene, bvh, cam: camera_mod.Camera, base_key,
               rows, cols, cfg: RenderConfig, spp: int,
               sample_offset=0, differentiable: bool = False,
               with_stats: bool = False, ct=None):
    """Radiance SUM over ``spp`` samples for a flat pixel wavefront.

    The shared core of the single-chip renderer, the sharded renderer
    (parallel/sharded.py) and the differentiable pass (render/diff.py):

    - ``rows``/``cols``: (P,) float32 pixel coordinates; P must be a multiple
      of ``cfg.ray_chunk`` (callers pre-pad). Chunks are serialized with
      ``lax.map`` to bound the HBM working set.
    - ``sample_offset``: global index of the first sample — spp-sharded
      callers pass their shard offset so every (pixel, sample) pair draws a
      unique stateless key regardless of the device layout.
    - chunk keys derive from the first pixel's *global* linear index, so a
      pixel's jitter sequence is invariant to how the wavefront is sharded
      across devices (determinism test: same seed => same image, SURVEY §5).

    Returns (P, 3) float32 — linear radiance, NOT averaged or gamma'd —
    or ((P, 3), executed_queries) when ``with_stats`` (the closest-hit
    query count the accel actually executed; see integrator.trace).
    """
    n_padded = rows.shape[0]
    chunk = min(cfg.ray_chunk, n_padded)
    n_chunks = n_padded // chunk
    assert n_chunks * chunk == n_padded, "wavefront must be chunk-aligned"
    rows_c = rows.reshape(n_chunks, chunk)
    cols_c = cols.reshape(n_chunks, chunk)
    w_inv = 1.0 / cfg.width
    h_inv = 1.0 / cfg.height

    closest, scene = _make_closest(scene, bvh, cfg.t_min, cfg.accel, ct=ct)
    # stratification grid (cfg.stratify): sample s jitters inside stratum
    # (s mod m^2) of an m x m sub-pixel grid — same marginal distribution,
    # lower variance. m is the largest integer with m^2 | spp so every
    # stratum is visited exactly spp/m^2 times; a plain floor(sqrt(spp))
    # would oversample the first (spp mod m^2) strata — a systematic
    # spatial bias in the pixel filter, not just extra variance. m derives
    # from the configured total spp so sharded / checkpointed runs with
    # sample offsets stay consistent.
    m_strat = _stratum_grid(cfg.spp) if cfg.stratify else 1
    inv_m = 1.0 / m_strat
    use_sobol = getattr(cfg, "sampler", "random") == "sobol"

    def sample_pass(s, acc):
        s_global = sample_offset + s
        skey = jax.random.fold_in(base_key, s_global)
        stratum = jnp.mod(s_global, m_strat * m_strat)
        sx = jnp.mod(stratum, m_strat).astype(jnp.float32)
        sy = (stratum // m_strat).astype(jnp.float32)

        def render_chunk(args):
            row, col = args
            pix0 = (row[0] * cfg.width + col[0]).astype(jnp.int32)
            ckey = jax.random.fold_in(skey, pix0)
            pkey, tkey, lkey1, lkey2 = jax.random.split(ckey, 4)
            # pixel jitter (main.cu:284-285), optionally stratified or
            # Owen-scrambled Sobol (core/sampling.sobol_owen_2d)
            if use_sobol:
                from pathtracer_tpu.core.sampling import sobol_owen_2d
                pix_id = (row * cfg.width + col).astype(jnp.int32)
                x0, x1 = sobol_owen_2d(s_global.astype(jnp.uint32),
                                       pix_id, cfg.seed)
                xi = jnp.stack([x0, x1])
            else:
                xi = jax.random.uniform(pkey, (2, chunk), jnp.float32)
                if m_strat > 1:
                    xi = jnp.stack([(sx + xi[0]) * inv_m,
                                    (sy + xi[1]) * inv_m])
            u = (col + xi[0]) * w_inv
            v = (row + xi[1]) * h_inv
            u_disk = jax.random.uniform(lkey1, (2, chunk), jnp.float32)
            u_time = jax.random.uniform(lkey2, (chunk,), jnp.float32)
            o, d, t = camera_mod.get_rays(cam, u, v, u_disk[0], u_disk[1],
                                          u_time)
            out = integrator.trace(
                scene, o, d, t, tkey, cfg.max_depth, closest,
                t_min=cfg.t_min, sky=cfg.sky,
                terminate_black=cfg.terminate_black,
                differentiable=differentiable, nee=cfg.nee,
                with_stats=with_stats, rr=cfg.rr, rr_depth=cfg.rr_depth)
            return out if with_stats else (out, jnp.zeros((3,), jnp.float32))

        acc, n_exec = acc
        radiance, chunk_exec = jax.lax.map(render_chunk, (rows_c, cols_c))
        # executed-query counters ride f32: the whole-render sum exceeds
        # int32 at production scale (1920x1080 x 512spp x depth 50 ~ 5e10
        # nominal) — the accumulator trades exactness above 2^24 for ~1e-7
        # relative error (a throughput statistic, not a checksum). Shape
        # (3,): [closest_hit, shadow, sweep_pair_tests] (integrator.trace).
        return (acc + radiance.reshape(n_padded, 3),
                n_exec + jnp.sum(chunk_exec, axis=0))

    acc, n_exec = jax.lax.fori_loop(
        0, spp, sample_pass,
        (jnp.zeros((n_padded, 3), jnp.float32), jnp.zeros((3,), jnp.float32)))
    return (acc, n_exec) if with_stats else acc


def padded_pixel_grid(cfg: RenderConfig, multiple: int):
    """(rows, cols) flat f32 grids padded to a multiple of ``multiple``."""
    rows, cols = _pixel_grid(cfg.width, cfg.height)
    n_pixels = cfg.num_pixels
    n_padded = -(-n_pixels // multiple) * multiple
    return (jnp.pad(rows, (0, n_padded - n_pixels)),
            jnp.pad(cols, (0, n_padded - n_pixels)))


def make_renderer(cfg: RenderConfig, with_bvh: bool,
                  with_stats: bool = False):
    """Build a jitted ``render(scene, bvh, camera, seed) -> (H, W, 3)``
    (or ``-> ((H, W, 3), executed_queries)`` when ``with_stats``).

    ``bvh`` must be None iff ``with_bvh`` is False (two cached variants).
    """
    n_pixels = cfg.num_pixels
    chunk = min(cfg.ray_chunk, n_pixels)
    rows0, cols0 = padded_pixel_grid(cfg, chunk)

    def render_core(scene: Scene, bvh, cam: camera_mod.Camera, seed, ct):
        base_key = jax.random.PRNGKey(seed)
        acc = render_sum(scene, bvh, cam, base_key, rows0, cols0, cfg,
                         cfg.spp, with_stats=with_stats, ct=ct)
        if with_stats:
            acc, n_exec = acc
        # gamma-2 writeback (main.cu:290-293)
        img = jnp.sqrt(jnp.maximum(acc[:n_pixels], 0.0) / cfg.spp)
        img = img.reshape(cfg.height, cfg.width, 3)
        return (img, n_exec) if with_stats else img

    jitted = jax.jit(render_core)

    def render(scene: Scene, bvh, cam: camera_mod.Camera, seed):
        # cluster tables are built eagerly ON HOST (tens of minutes if
        # eager on the tunnel, compile-time blowup if traced at 10^5+
        # prims) and ride into the jitted core as an ARGUMENT; ct=None
        # (non-cluster accels) falls through to the traced paths
        ct = prepare_cluster_tables(scene, cfg.accel)
        return jitted(scene, bvh, cam, seed, ct)

    return render


def _experiment_env_sig() -> tuple:
    """The PT_* experiment knobs are read at *trace* time (the documented
    env-gated A/B pattern), so they must participate in the renderer cache
    key — otherwise an in-process toggle after a same-cfg render silently
    hits the stale jitted renderer and no-ops."""
    import os
    return tuple(sorted((k, v) for k, v in os.environ.items()
                        if k.startswith(("PT_CLUSTER_", "PT_SWEEP_",
                                         "PT_RNG_", "PT_SORT_",
                                         "PT_GATHER"))))


@functools.lru_cache(maxsize=16)
def _cached_renderer(cfg: RenderConfig, with_bvh: bool, env_sig: tuple = ()):
    return make_renderer(cfg, with_bvh)


def render_image(scene: Scene, cam: camera_mod.Camera, cfg: RenderConfig,
                 seed: Optional[int] = None, bvh=None) -> jnp.ndarray:
    """Render with cfg.accel, returning (H, W, 3) f32 in scanline order
    row 0 = bottom (flip at save, like main.cu:477-483).

    When cfg.accel == "bvh" and no prebuilt ``bvh`` is passed, the LBVH is
    built on device first (one-time per scene; reference builds at scene
    upload, main.cu:194-195).
    """
    if cfg.accel == "bvh" and bvh is None:
        from pathtracer_tpu.accel.lbvh import build_lbvh
        bvh = build_lbvh(scene)
    if cfg.accel != "bvh":
        bvh = None
    render = _cached_renderer(cfg, bvh is not None, _experiment_env_sig())
    return render(scene, bvh, cam, cfg.seed if seed is None else seed)
