"""TPU timing decomposition: march query vs full render per-bounce cost.

One process (same chip state), three jitted programs:
  1. query_sorted alone, N back-to-back calls inside one jit (fori_loop)
  2. full bunny render, depth 1
  3. full bunny render, depth 4 (bench shape)

(3)-(2) / 3 ~ marginal per-bounce cost; (1) isolates the closest-hit query
incl. its sort/cull/residual. The gap between the marginal bounce and the
query is shading + RNG + carry traffic.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def t(f, *a):
    import jax
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


def main():
    import jax
    import jax.numpy as jnp
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.core.camera import get_rays
    from pathtracer_tpu.ops.cluster_sweep import (build_cluster_tables,
                                                  make_cluster_closest_hit)
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene import worlds

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = worlds.get_world("bunny")
    n = 57600
    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (4, n), jnp.float32)
    o, d, _ = get_rays(cam, u[0], u[1], u[2], u[3],
                       jnp.zeros(n, jnp.float32))
    ct = build_cluster_tables(scene)
    closest = make_cluster_closest_hit(ct, 1e-3)
    act = jnp.ones((n,), bool)
    extras = (jnp.zeros((n,), jnp.float32), jnp.arange(n, dtype=jnp.int32))

    N = 8

    @jax.jit
    def q_loop(o, d):
        def body(i, carry):
            o_, d_, s = carry
            idx, tt, v, rows, o_, d_, a_, ex, _pt = closest.query_sorted(
                o_, d_, act, extras)
            return o_, d_, s + jnp.sum(tt * 0 + 1)
        return jax.lax.fori_loop(0, N, body, (o, d, 0.0))[2]

    dt_q = t(q_loop, o, d) / N
    print(f"query_sorted (57.6k, rows+2 extras): {dt_q*1e3:.2f} ms",
          flush=True)

    for depth in (1, 4):
        cfg = RenderConfig(width=640, height=360, spp=8, max_depth=depth,
                           accel="cluster", ray_chunk=57600, scene="bunny")
        render = make_renderer(cfg, with_bvh=False)
        dt = t(render, scene, None, cam, 0)
        print(f"render depth={depth}: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
