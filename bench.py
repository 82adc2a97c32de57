"""Benchmark: forward path-tracing throughput on the bunny LBVH scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = BASELINE config 3 shape (bunny mesh + mirror + glass spheres,
4 bounces). "value" is the *nominal-workload* throughput — pixels x spp x
max_depth queries over wall-clock — comparable across rounds and to the
200 Mrays/s/chip north star (BASELINE.md; the reference publishes no
numbers, SURVEY §6). The JSON line also reports the *executed* query count
(the integrator counts queries that actually did work: early-exit and
dead-ray compaction skip terminated lanes) and the Mrays/s over those, so
termination-rate changes cannot masquerade as speed.

Usage: python bench.py [--width W] [--height H] [--spp N] [--depth D]
                       [--scene bunny] [--iters K]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_MRAYS = 200.0  # BASELINE.md north star, Mrays/s/chip


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--scene", default="bunny")
    p.add_argument("--accel", default="cluster",
                   choices=["cluster", "tensor", "pallas", "bvh", "brute"])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--ray-chunk", type=int, default=57600)
    args = p.parse_args()

    import jax

    from pathtracer_tpu.accel.lbvh import build_lbvh
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, accel=args.accel,
                       ray_chunk=args.ray_chunk, scene=args.scene)
    scene, cam = get_world(args.scene)
    bvh = None
    if args.accel == "bvh":
        bvh = jax.block_until_ready(build_lbvh(scene))
    render = make_renderer(cfg, with_bvh=bvh is not None, with_stats=True)

    # warmup: compile + one steady-state run
    img, n_exec = render(scene, bvh, cam, 0)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    for i in range(args.iters):
        img, n_exec = render(scene, bvh, cam, i + 1)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / args.iters

    rays = cfg.num_pixels * cfg.spp * cfg.max_depth
    mrays = rays / dt / 1e6
    executed = int(n_exec)
    print(json.dumps({
        "metric": f"{args.scene}_forward_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "accel": args.accel,
        "nominal_queries": rays,
        "executed_queries": executed,
        "executed_mrays_per_s": round(executed / dt / 1e6, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
