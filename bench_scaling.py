"""Scaling-efficiency benchmark + single-chip proxy decomposition.

Real multi-chip hardware is not available in this environment (one tunnel
chip), so the BASELINE ">=85% rays/s scaling efficiency" target cannot be
measured directly. This tool does two things:

1. Default mode (real pod slice, when you have one): sharded render over
   N devices vs 1, one JSON line per mesh size. Timing is value-forced
   (np.asarray of the output), never bare block_until_ready — see
   bench.py for why that call cannot be trusted on this stack.

2. ``--proxy``: bound the multi-chip risk from one chip + the 8-device
   virtual CPU mesh by decomposing the efficiency target into its two
   loss terms and writing SCALING_proxy.json:

   - compute imbalance: the pixel wavefront is sharded contiguously
     across devices (parallel/sharded.py); per-shard EXECUTED query
     counts (integrator with_stats) measure how unevenly the scene's
     termination behavior loads the shards. Efficiency loss = 1 -
     mean/max (the slowest shard gates the step).
   - collective traffic: the compiled sharded renderer's HLO is scanned
     for collective ops (all-gather / all-reduce / reduce-scatter /
     collective-permute) and their output bytes summed — the actual
     wire bytes per frame. Projected collective overhead = bytes / ICI
     bandwidth vs the measured single-chip frame time (docs/bench_log).

   projected_efficiency = (mean/max imbalance) x compute_fraction —
   a *model*, clearly labeled as such in the JSON, not a measurement.

Usage:
    python bench_scaling.py [--devices 1 2 4 8] [--accel auto] ...
    python bench_scaling.py --proxy          # writes SCALING_proxy.json
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

# TPU v5e: 4 ICI links/chip at ~45 GB/s usable each way in a 2D torus
# ring; a conservative single-link figure for the proxy model.
ICI_GBPS = 45.0


def _collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of collective ops in an HLO dump (wire bytes per
    executed frame, counting each op once)."""
    sizes = {"all-gather": 0, "all-reduce": 0, "reduce-scatter": 0,
             "collective-permute": 0, "all-to-all": 0}
    dt_bytes = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2,
                "f16": 2, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}
    for m in re.finditer(
            r"=\s*(\w+)\[([\d,]*)\]\S*\s+(all-gather|all-reduce|"
            r"reduce-scatter|collective-permute|all-to-all)\(", hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes[op] += n * dt_bytes.get(dt, 4)
    sizes["total"] = sum(sizes.values())
    return sizes


def run_proxy(args) -> int:
    # the virtual device count must be set before the backend initializes
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.parallel import make_mesh, make_sharded_renderer
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    n_dev = len(jax.devices())
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.depth, accel=args.accel,
                       ray_chunk=args.width * args.height // n_dev,
                       scene=args.scene)
    scene, cam = get_world(args.scene)

    # --- collective bytes from the compiled sharded renderer's HLO ---
    mesh = make_mesh(jax.devices(), spp_axis_size=1)
    render = make_sharded_renderer(cfg, mesh)
    img = np.asarray(render(scene, None, cam, 0))
    hlo = jax.jit(lambda s, c: render(s, None, c, 0)).lower(
        scene, cam).compile().as_text()
    coll = _collective_bytes(hlo)

    # --- per-shard executed-query imbalance: each device's shard rendered
    # alone with stats, for BOTH assignments — contiguous raster bands
    # (the pre-r4 layout) and the production round-robin chunk interleave
    # (parallel/sharded.K_INTERLEAVE) ---
    from pathtracer_tpu.parallel import sharded as sharded_mod
    from pathtracer_tpu.render import renderer as renderer_mod
    rays_size, _, _, per_dev, chunk = sharded_mod._shard_plan(cfg, mesh)
    n_padded = per_dev * rays_size
    rows, cols = renderer_mod.padded_pixel_grid(cfg, n_padded)
    per_dev_chunks = per_dev // chunk

    def shard_counts(interleave: bool) -> list:
        counts = []
        rs = np.asarray(rows).reshape(-1, chunk)
        cs = np.asarray(cols).reshape(-1, chunk)
        for d in range(n_dev):
            if interleave:
                sel = np.array([k * rays_size + d
                                for k in range(per_dev_chunks)])
            else:
                sel = np.arange(d * per_dev_chunks,
                                (d + 1) * per_dev_chunks)
            acc = renderer_mod.render_sum(
                scene, None, cam, jax.random.PRNGKey(0),
                rs[sel].reshape(-1), cs[sel].reshape(-1),
                cfg.replace(ray_chunk=chunk), cfg.spp, with_stats=True)
            counts.append(float(np.asarray(acc[1])[0]))
        return counts

    counts_contig = np.array(shard_counts(False))
    counts = np.array(shard_counts(True))
    imbal_contig = (counts_contig.mean() / counts_contig.max()
                    if counts_contig.max() else 1.0)
    imbalance = counts.mean() / counts.max() if counts.max() else 1.0

    # --- compute fraction vs projected collective time ---
    # frame time: the latest committed real-chip bench line for this scene
    frame_ms = None
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "bench_log.jsonl")) as f:
            for ln in f:
                r = json.loads(ln)
                if (r.get("metric") == f"{args.scene}_forward_throughput"
                        and not r.get("suspect") and not r.get("stale")
                        and "env" not in r):
                    frame_ms = (r["nominal_queries"] / (r["value"] * 1e6)
                                * 1e3)
    except OSError:
        pass
    coll_ms = coll["total"] / (ICI_GBPS * 1e9) * 1e3
    compute_fraction = (frame_ms / (frame_ms + coll_ms)
                        if frame_ms else None)
    projected = (round(imbalance * compute_fraction, 4)
                 if compute_fraction else None)

    out = {
        "model": "proxy (single chip + 8-device virtual CPU mesh); "
                 "projected_efficiency = imbalance x compute_fraction — "
                 "a model, NOT a pod measurement",
        "scene": args.scene, "devices": n_dev,
        "per_shard_executed_queries": counts.tolist(),
        "imbalance_efficiency": round(float(imbalance), 4),
        "imbalance_efficiency_contiguous": round(float(imbal_contig), 4),
        "collective_bytes_per_frame": coll,
        "ici_gbps_assumed": ICI_GBPS,
        "collective_ms_projected": round(coll_ms, 4),
        "single_chip_frame_ms": round(frame_ms, 2) if frame_ms else None,
        "compute_fraction": (round(compute_fraction, 5)
                             if compute_fraction else None),
        "projected_efficiency": projected,
        "target": 0.85,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALING_proxy.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


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
    p.add_argument("--accel", default="auto",
                   help="production default (resolves per scene size); "
                        "was 'pallas' before r4 — NOT the production path")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--proxy", action="store_true",
                   help="single-chip proxy decomposition -> "
                        "SCALING_proxy.json (8-device virtual CPU mesh)")
    args = p.parse_args()

    if args.proxy:
        return run_proxy(args)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

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
        np.asarray(render(scene, None, cam, 0))  # compile + settle
        dts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            img = render(scene, None, cam, i + 1)
            np.asarray(img)        # value-forced (see module docstring)
            dts.append(time.perf_counter() - t0)
        dt = sum(dts) / len(dts)
        mrays = queries / dt / 1e6
        results[n] = mrays
        eff = mrays / (results[1] * n) if 1 in results and n > 1 else 1.0
        print(json.dumps({"metric": "scaling", "devices": n,
                          "value": round(mrays, 3), "unit": "Mrays/s",
                          "efficiency": round(eff, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
