"""Scaling-efficiency benchmark: sharded render over N devices vs 1.

Prints one JSON line per mesh size plus an efficiency summary. On the
single-chip CI box this degenerates to N=1 (efficiency 1.0); on a pod slice
it measures the BASELINE ">=85% rays/s scaling efficiency" target. With
--platform cpu it smoke-tests the collective path on the virtual device mesh
(throughput numbers are then meaningless).

Usage:
    python bench_scaling.py [--devices 1 2 4 8] [--width 640] [--spp 8] ...
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="*", default=None,
                   help="mesh sizes to test (default: 1, 2, 4, ... up to "
                        "all local devices)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--scene", default="bunny")
    p.add_argument("--accel", default="pallas")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.parallel import make_mesh, make_sharded_renderer
    from pathtracer_tpu.scene.worlds import get_world

    n_avail = len(jax.devices())
    sizes = args.devices
    if not sizes:
        sizes, n = [], 1
        while n <= n_avail:
            sizes.append(n)
            n *= 2

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, accel=args.accel,
                       scene=args.scene)
    scene, cam = get_world(args.scene)
    queries = cfg.num_pixels * cfg.spp * cfg.max_depth

    results = {}
    for n in sizes:
        if n > n_avail:
            break
        mesh = make_mesh(jax.devices()[:n], spp_axis_size=1)
        render = make_sharded_renderer(cfg, mesh)
        img = jax.block_until_ready(render(scene, None, cam, 0))  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            img = render(scene, None, cam, i + 1)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / args.iters
        mrays = queries / dt / 1e6
        results[n] = mrays
        eff = mrays / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(json.dumps({"metric": "scaling", "devices": n,
                          "value": round(mrays, 3), "unit": "Mrays/s",
                          "efficiency": round(eff, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
