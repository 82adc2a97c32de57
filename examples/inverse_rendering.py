"""Inverse rendering demo (BASELINE config 4): recover Cornell-box albedos
from a target image by gradient descent through the renderer.

Renders a target with the true materials, perturbs the wall/sphere albedos,
then optimizes them back with the differentiable pass (render/diff.py).
Writes target / initial / fitted PNGs plus a JSON loss history.

Usage:
    python examples/inverse_rendering.py [--steps 60] [--out-dir /tmp/inv]
    # CPU (always works):  --platform cpu  (a few minutes)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--out-dir", default="/tmp/inverse_rendering")
    p.add_argument("--platform", default=None)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--spp", type=int, default=8)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.io.png import write_png
    from pathtracer_tpu.render import diff
    from pathtracer_tpu.render import renderer as renderer_mod
    from pathtracer_tpu.scene.cornell import cornell_box

    os.makedirs(args.out_dir, exist_ok=True)
    scene, cam = cornell_box(variant="spheres")
    cfg = RenderConfig(width=args.size, height=args.size, spp=args.spp,
                       max_depth=2, sky=False, nee=True, accel="brute",
                       ray_chunk=args.size * args.size, scene="cornell")

    chunk = min(cfg.ray_chunk, cfg.num_pixels)
    rows, cols = renderer_mod.padded_pixel_grid(cfg, chunk)
    key = jax.random.PRNGKey(0)

    def linear_img(s):
        return diff.render_linear(s, None, cam, key, rows, cols, cfg,
                                  cfg.spp)[:cfg.num_pixels]

    def to_png(path, lin):
        img = np.sqrt(np.clip(np.asarray(lin), 0, None))
        write_png(path, img.reshape(cfg.height, cfg.width, 3))

    target = linear_img(scene)
    to_png(f"{args.out_dir}/target.png", target)

    # perturb every lambertian albedo (walls + spheres) toward grey
    true_albedo = np.asarray(scene.albedo)
    init_albedo = true_albedo * 0.3 + 0.45
    start = scene._replace(albedo=jnp.asarray(init_albedo, jnp.float32))
    to_png(f"{args.out_dir}/initial.png", linear_img(start))

    params, history = diff.fit(start, None, cam, target, cfg,
                               steps=args.steps, lr=args.lr,
                               param_fields=("albedo",), seed=0,
                               resample=False)
    fitted = diff.apply_params(start, params)
    to_png(f"{args.out_dir}/fitted.png", linear_img(fitted))

    err0 = float(np.abs(init_albedo - true_albedo).mean())
    err1 = float(np.abs(np.asarray(params["albedo"]) - true_albedo).mean())
    summary = {"loss_first": history[0], "loss_last": history[-1],
               "albedo_mae_initial": err0, "albedo_mae_fitted": err1}
    with open(f"{args.out_dir}/history.json", "w") as f:
        json.dump({"summary": summary, "loss": history}, f, indent=2)
    print(json.dumps(summary))
    print(f"wrote target/initial/fitted PNGs to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
