"""TPU validation: cluster accel vs pallas accel — image agreement + timing.

Run on the tunnel chip (background it; first compile is minutes):
    python tools/tpu_cluster_check.py [--scene bunny] [--chunk 57600]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="bunny")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--chunk", type=int, default=57600)
    p.add_argument("--accels", default="pallas,cluster")
    args = p.parse_args()

    import jax
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = get_world(args.scene)
    imgs = {}
    for accel in args.accels.split(","):
        cfg = RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.depth, accel=accel,
                           ray_chunk=min(args.chunk,
                                         args.width * args.height),
                           scene=args.scene)
        render = make_renderer(cfg, with_bvh=False)
        t0 = time.perf_counter()
        img = jax.block_until_ready(render(scene, None, cam, 0))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(3):
            img = render(scene, None, cam, i + 1)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / 3
        rays = cfg.num_pixels * cfg.spp * cfg.max_depth
        print(f"{accel}: compile+1 {t_compile:.1f}s steady {dt*1e3:.1f}ms "
              f"nominal {rays/dt/1e6:.2f} Mrays/s", flush=True)
        imgs[accel] = np.asarray(img)

    names = list(imgs)
    for i in range(1, len(names)):
        a, b = imgs[names[0]], imgs[names[i]]
        d = np.abs(a - b)
        print(f"diff {names[0]} vs {names[i]}: max {d.max():.2e} "
              f"mean {d.mean():.2e} frac>1e-3 {(d > 1e-3).mean():.4f}",
              flush=True)


if __name__ == "__main__":
    main()
