"""Per-scene validation of reduced-pass sweep precisions (VERDICT r3 #1).

PT_SWEEP_PRECISION=bf16x3 (3 MXU passes) and PT_SWEEP_FUSED6=1 (1 pass)
measured +12% whole-render on chip; before any default flip each mode must
be shown exact-enough PER SCENE. Two independent checks:

1. Winner fidelity: closest-hit winners/t of each mode (XLA tensor path,
   CPU — the explicit bf16 casts are the same arithmetic the Pallas kernel
   lowers) against a float64 ground truth (the NumPy oracle's factored
   formulas at f64). A mode passes if its winner-flip rate is within a
   small factor of HIGHEST's own flip rate (razor-edge ties flip under ANY
   f32 association order; systematic corruption flips orders of magnitude
   more — the documented large-extent sphere cancellation,
   ops/tensor_sweep.py:52-61).

2. Image deviation: a small render per (scene, mode) vs HIGHEST at the
   same seed; reports the fraction of pixels deviating > thresholds.
   Razor-edge flips look like MC noise (isolated pixels); corruption is
   structural (whole spheres shift).

Run: python tools/sweep_validate.py [--scenes test,triangle,random,bunny]
Emits one JSON line per (scene, mode) and a PASS/FAIL verdict.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json


def f64_closest(scene, o, d, t_min):
    """Ground truth: factored formulas at float64 (independent of the
    affine-feature decomposition under test)."""
    import numpy as np

    from pathtracer_tpu import oracle
    sn = oracle.scene_to_np(scene)
    sn64 = oracle.SceneNp(*[a.astype(np.float64)
                            if a.dtype == np.float32 else a for a in sn])
    return oracle.closest_hit(sn64, o.astype(np.float64),
                              d.astype(np.float64), t_min, 3.0e38)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default="test,triangle,random,bunny")
    p.add_argument("--modes", default="highest,bf16x3,fused6")
    p.add_argument("--rays", type=int, default=20000)
    p.add_argument("--render", action="store_true",
                   help="also render image-diff stats per mode (slower)")
    p.add_argument("--width", type=int, default=160)
    p.add_argument("--height", type=int, default=90)
    p.add_argument("--spp", type=int, default=8)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu import oracle
    from pathtracer_tpu.core.camera import get_rays
    from pathtracer_tpu.ops import tensor_sweep
    from pathtracer_tpu.scene import worlds

    results = []
    for scene_name in args.scenes.split(","):
        scene, cam = worlds.get_world(scene_name)
        rng = np.random.default_rng(11)
        n = args.rays
        # half camera rays, half synthetic bounce rays (origins near
        # geometry, random directions) — bounce rays stress the sweep away
        # from the camera's well-conditioned region
        u = rng.random(n // 2, dtype=np.float32)
        v = rng.random(n // 2, dtype=np.float32)
        o_cam, d_cam = oracle.get_rays(cam, u, v, rng)
        lo = np.asarray(scene.world_min, np.float32)
        hi = np.asarray(scene.world_max, np.float32)
        span = np.minimum(hi - lo, 50.0)
        ctr = (lo + hi) / 2
        o_b = (ctr + (rng.random((n - n // 2, 3), dtype=np.float32) - 0.5)
               * span).astype(np.float32)
        d_b = rng.standard_normal((n - n // 2, 3)).astype(np.float32)
        o = np.concatenate([o_cam, o_b])
        d = np.concatenate([d_cam, d_b])

        idx64, t64, val64 = f64_closest(scene, o, d, 1e-3)

        flips = {}
        for mode in args.modes.split(","):
            os.environ.pop("PT_SWEEP_FUSED6", None)
            if mode == "fused6":
                # the fused6 arithmetic (tensor_sweep.fused6_dot over
                # pre-expanded operands)
                phi6 = tensor_sweep.expand6_lhs(
                    tensor_sweep.ray_features(jnp.asarray(o),
                                              jnp.asarray(d)))
                tables = tensor_sweep.pack_sweep_tables(scene)
                cols6 = tensor_sweep.expand6_rhs(tables.cols, axis=1)
                a2 = jnp.sum(jnp.asarray(d) * jnp.asarray(d), axis=1)

                def tile_step(carry, inputs):
                    t_best, best = carry
                    cols, sph, valid_row, base = inputs
                    tile = tables.tile
                    S = tensor_sweep.fused6_dot(phi6, cols)
                    t_eff = tensor_sweep._epilogue(
                        S[:, 0:tile], S[:, tile:2 * tile],
                        S[:, 2 * tile:3 * tile], S[:, 3 * tile:4 * tile],
                        a2, sph, valid_row, jnp.float32(1e-3),
                        jnp.float32(3.0e38))
                    j = jnp.argmin(t_eff, axis=1).astype(jnp.int32)
                    t_tile = jnp.take_along_axis(t_eff, j[:, None],
                                                 axis=1)[:, 0]
                    better = t_tile < t_best
                    return (jnp.where(better, t_tile, t_best),
                            jnp.where(better, base + j, best)), None

                n_tiles = tables.cols.shape[0]
                bases = jnp.arange(n_tiles, dtype=jnp.int32) * tables.tile
                (t_m, best_m), _ = jax.lax.scan(
                    tile_step,
                    (jnp.full(n, 3.0e38, jnp.float32),
                     jnp.full(n, -1, jnp.int32)),
                    (cols6, tables.is_sphere, tables.valid_row, bases))
                idx_m = np.asarray(jnp.where(best_m >= 0, best_m, 0))
                val_m = np.asarray(best_m >= 0)
                t_m = np.asarray(t_m)
            else:
                os.environ["PT_SWEEP_PRECISION"] = mode
                tables = tensor_sweep.pack_sweep_tables(scene)
                idx_m, t_m, val_m = (np.asarray(x) for x in
                                     tensor_sweep.tensor_closest(
                                         tables, jnp.asarray(o),
                                         jnp.asarray(d), jnp.float32(1e-3),
                                         jnp.float32(3.0e38)))
            both = val64 & val_m
            flip = (np.mean(val64 != val_m)
                    + np.mean(idx_m[both] != idx64[both]) * both.mean())
            trel = np.abs(t_m[both] - t64[both]) / np.maximum(t64[both],
                                                              1e-3)
            rec = {"scene": scene_name, "mode": mode,
                   "winner_flip_rate": round(float(flip), 6),
                   "t_rel_err_p99": round(float(np.quantile(trel, 0.99)),
                                          8),
                   "t_rel_err_max": round(float(trel.max()), 6)}
            flips[mode] = flip
            results.append(rec)
            print(json.dumps(rec), flush=True)
        os.environ.pop("PT_SWEEP_PRECISION", None)

        # PASS needs BOTH: winner-flip rate at the razor-edge noise level
        # (<= max(3x highest's own rate, 1e-4) — HIGHEST itself flips vs
        # f64 on association-order ties), AND no p99 t-error inflation
        # (> 10x highest's p99 = systematic precision loss, e.g. the
        # large-extent sphere cancellation, not isolated edge ties).
        base = max(flips.get("highest", 0.0), 1e-5)
        p99s = {r["mode"]: r["t_rel_err_p99"] for r in results
                if r["scene"] == scene_name}
        base_p99 = max(p99s.get("highest", 0.0), 1e-7)
        for mode, fl in flips.items():
            if mode == "highest":
                continue
            ok = (fl <= max(3.0 * base, 1e-4)
                  and p99s[mode] <= 10.0 * base_p99)
            print(f"{scene_name}/{mode}: {'PASS' if ok else 'FAIL'} "
                  f"(flip {fl:.2e} vs highest {flips.get('highest', 0):.2e}"
                  f", p99 {p99s[mode]:.2e} vs {base_p99:.2e})",
                  flush=True)

    if args.render:
        from pathtracer_tpu.config import RenderConfig
        from pathtracer_tpu.render.renderer import make_renderer
        for scene_name in args.scenes.split(","):
            scene, cam = worlds.get_world(scene_name)
            imgs = {}
            for mode in args.modes.split(","):
                os.environ.pop("PT_SWEEP_FUSED6", None)
                os.environ.pop("PT_SWEEP_PRECISION", None)
                if mode == "fused6":
                    os.environ["PT_SWEEP_FUSED6"] = "1"
                    os.environ["PT_CLUSTER_WIDE"] = "8"
                elif mode != "highest":
                    os.environ["PT_SWEEP_PRECISION"] = mode
                cfg = RenderConfig(width=args.width, height=args.height,
                                   spp=args.spp, max_depth=4,
                                   accel="cluster",
                                   ray_chunk=args.width * args.height,
                                   scene=scene_name)
                imgs[mode] = np.asarray(
                    make_renderer(cfg, with_bvh=False)(scene, None, cam, 0))
            os.environ.pop("PT_SWEEP_FUSED6", None)
            os.environ.pop("PT_SWEEP_PRECISION", None)
            ref = imgs["highest"]
            for mode, im in imgs.items():
                if mode == "highest":
                    continue
                ad = np.abs(im - ref)
                print(json.dumps(
                    {"scene": scene_name, "mode": mode, "img": True,
                     "max": round(float(ad.max()), 4),
                     "frac_gt_002": round(float((ad > 0.02).mean()), 6),
                     "frac_gt_01": round(float((ad > 0.1).mean()), 6)}),
                    flush=True)


if __name__ == "__main__":
    main()
