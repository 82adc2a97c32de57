"""Per-window cost decomposition of the grouped march kernel.

The round-4 knockout attribution puts the per-visit march at ~195 ms of the
402 ms bench render (tools/tpu_knockout.py); this tool splits ONE window's
cost into its stages via in-kernel knockouts (PT_CLUSTER_KNOCK) under a
fixed window count (PT_CLUSTER_FIXWIN), so the stop rule cannot react to
the knocked-out garbage values:

  full    the production window body
  rows    winner-rows extraction skipped (one-hot + (48,WK)@(WK,n) matmul)
  epi     epilogue skipped (sweep matmul + mask concats stay live)
  mm      sweep matmul skipped (block gather/concat kept live via a reduce)
  mmcat   block gather/concat AND matmul skipped

  full-rows = rows extraction;   full-epi = epilogue;
  epi-mm ~ matmul;               mm-mmcat = window operand gather/concat;
  mmcat = loop + bookkeeping + argmin floor.

Timing is value-forced (np.asarray of a reduced output), NOT
block_until_ready — under some compiled programs the axon tunnel's
block_until_ready returns before execution completes (the r3 44,632
Mrays/s artifact; PT_CLUSTER_PARSEM reproduces it deterministically).

Run on the chip:  python tools/tpu_window_parts.py [--fixwin 4] [--iters 8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fixwin", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rays", type=int, default=57600)
    p.add_argument("--variants", default="full,rows,epi,mm,mmcat")
    p.add_argument("--wide", default=None, help="override PT_CLUSTER_WIDE")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pathtracer_tpu.core.camera import get_rays
    from pathtracer_tpu.ops import cluster_sweep as cs
    from pathtracer_tpu.ops.clusters import build_cluster_tables
    from pathtracer_tpu.scene import worlds

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = worlds.get_world("bunny")
    ct = build_cluster_tables(scene)
    n = args.rays
    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (4, n), jnp.float32)
    o, d, _ = get_rays(cam, u[0], u[1], u[2], u[3],
                       jnp.zeros(n, jnp.float32))
    os.environ["PT_CLUSTER_FIXWIN"] = str(args.fixwin)
    if args.wide:
        os.environ["PT_CLUSTER_WIDE"] = args.wide
    n_chunks = n // cs.DEF_RAY_TILE
    windows = n_chunks * args.fixwin

    results = {}
    for name in args.variants.split(","):
        os.environ["PT_CLUSTER_KNOCK"] = "" if name == "full" else name

        @jax.jit
        def q(o, d):
            def body(i, acc):
                # production shape: with_rows=True (the sorted-wavefront
                # integrator always extracts winner rows); perturb d by i
                # so the tunnel cannot cache identical executions
                idx, t, valid, rows = cs.cluster_march(
                    ct, o, d * (1.0 + 1e-7 * i), 1e-3, with_rows=True)
                return acc + t.sum() + rows.sum() + idx.sum()
            return jax.lax.fori_loop(0, args.iters, body,
                                     jnp.zeros((), jnp.float32))

        t0 = time.perf_counter()
        v = float(np.asarray(q(o, d)))           # value-forced
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        v = float(np.asarray(q(o, d)))
        dt = (time.perf_counter() - t0) / args.iters
        per_win = dt / windows * 1e6
        print(f"{name}: compile+1 {tc:.0f}s steady {dt*1e3:.2f} ms/query "
              f"({per_win:.2f} us/window x {windows})", flush=True)
        results[name] = dt
    os.environ.pop("PT_CLUSTER_KNOCK", None)
    os.environ.pop("PT_CLUSTER_FIXWIN", None)

    f = results.get("full")
    if f:
        for name, v in results.items():
            if name != "full":
                print(f"attribution: full - {name} = {(f - v)*1e3:.2f} ms "
                      f"({(f - v)/windows*1e6:.2f} us/window)", flush=True)


if __name__ == "__main__":
    main()
