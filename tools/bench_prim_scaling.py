"""Prim-count scaling: cluster march vs dense tensor sweep, query-level.

The reference's LBVH exists to make per-ray cost ~O(log N)
(/root/reference/utils/render_manager.h:86-135); the cluster march fills
that role with TPU-native means (ray binning by sort + bounded cluster
windows). This times raw closest-hit queries on synthetic N-sphere scenes
(jittered grid cloud) and prints ms/query for both paths plus the ratio —
the dense sweep is O(R*N); the march should grow far slower.

Capacity note: the march keeps its cluster tables VMEM-resident
(cols 24 KB + metadata ~1 KB per 128-prim cluster; +12 KB rows only for
with_rows marches), bounding a single kernel at roughly ~500 clusters
(~65k prims) for query-only marches on a 16 MB-VMEM chip. The streamed
march (PT_CLUSTER_STREAM=1, ops/cluster_sweep.py) lifts the wall to HBM
scale: tables stay in HBM and only *visited* clusters are DMA'd into a
double-buffered VMEM scratch, so DMA traffic tracks clusters marched,
not scene size. Use it for sizes beyond ~65k:

    PT_CLUSTER_STREAM=1 python tools/bench_prim_scaling.py \
        --sizes 5000,20000,45000,100000,200000

Run on the real chip: python tools/bench_prim_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="5000,20000,45000")
    p.add_argument("--rays", type=int, default=57600)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--bunny", action="store_true",
                   help="real-geometry mode: --sizes are 4:1 midpoint "
                        "subdivision LEVELS of the bunny mesh (0 -> 4,971"
                        " prims, 1 -> 19.9k, 2 -> 79.5k, 3 -> 318k; same "
                        "surface every level). Levels >= 2 exceed the "
                        "resident march's VMEM wall — run with "
                        "PT_CLUSTER_STREAM=1.")
    args = p.parse_args()
    if args.bunny:
        if args.sizes == "5000,20000,45000":   # cloud-mode default
            args.sizes = "0,1,2,3"
        levels = [int(s) for s in args.sizes.split(",")]
        if max(levels) > 6:
            p.error(f"--bunny sizes are subdivision LEVELS (got "
                    f"{max(levels)}; level 6 is already 20M prims)")

    import jax
    if os.environ.get("PT_FORCE_CPU") == "1":
        # CPU smoke runs (the axon sitecustomize overrides JAX_PLATFORMS,
        # so the config-level update is the only reliable off-switch —
        # CLAUDE.md); never point this tool at the chip accidentally
        # while a measurement queue holds it
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pathtracer_tpu.ops import intersect, tensor_sweep
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    from pathtracer_tpu.ops.clusters import build_cluster_tables
    from pathtracer_tpu.scene.scene import PRIM_SPHERE, Scene

    print("backend:", jax.default_backend(), flush=True)
    r = args.rays
    n_it = args.iters

    def sphere_cloud(n: int) -> Scene:
        """n spheres on a jittered grid in [-10, 10]^3 (numpy, host)."""
        rng = np.random.default_rng(7)
        m = int(np.ceil(n ** (1.0 / 3.0)))
        g = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                      axis=-1).reshape(-1, 3)[:n]).astype(np.float32)
        spacing = 20.0 / m
        centers = (g + 0.5 + 0.35 * rng.standard_normal((n, 3))) \
            * spacing - 10.0
        radius = (0.25 * spacing) * np.ones(n, np.float32)
        zeros3 = np.zeros((n, 3), np.float32)
        bmin = centers - radius[:, None]
        bmax = centers + radius[:, None]
        return Scene(
            prim_type=jnp.full((n,), PRIM_SPHERE, jnp.int32),
            v0=jnp.asarray(centers), e1=jnp.asarray(zeros3),
            e2=jnp.asarray(zeros3), radius=jnp.asarray(radius),
            tri_normal=jnp.asarray(zeros3),
            prim_mat=jnp.zeros((n,), jnp.int32),
            box_min=jnp.asarray(bmin),
            box_max=jnp.asarray(bmax),
            mat_type=jnp.zeros((1,), jnp.int32),
            albedo=jnp.full((1, 3), 0.5, jnp.float32),
            fuzz=jnp.zeros((1,), jnp.float32),
            ir=jnp.zeros((1,), jnp.float32),
            emit=jnp.zeros((1, 3), jnp.float32),
            tex_id=jnp.full((1,), -1, jnp.int32),
            world_min=jnp.asarray(bmin.min(axis=0)),
            world_max=jnp.asarray(bmax.max(axis=0)),
            light_idx=jnp.zeros((0,), jnp.int32),
            textures=jnp.zeros((0, 8, 8, 3), jnp.float32),
        )

    # camera-like wavefront: origins on a plane behind the scene,
    # directions at jittered targets inside it (coherent like primary
    # rays, so the binning sort has real structure to exploit — same as a
    # render's wavefront)
    k = jax.random.PRNGKey(1)
    if args.bunny:
        # aim inside the bunny's bbox from the bunny camera's side
        u = jax.random.uniform(k, (r, 3), jnp.float32)
        tgt = jnp.stack([u[:, 0] * 5.0 - 2.5, u[:, 1] * 5.0,
                         u[:, 2] * 4.0 - 2.0], axis=1)
        org = jnp.stack([tgt[:, 0] * 0.2, tgt[:, 1] * 0.2 + 3.0,
                         jnp.full((r,), 9.0)], axis=1)
    else:
        tgt = jax.random.uniform(k, (r, 3), jnp.float32) * 20.0 - 10.0
        org = jnp.stack([tgt[:, 0] * 0.2, tgt[:, 1] * 0.2,
                         jnp.full((r,), -30.0)], axis=1)
    dirs = tgt - org

    # dispatch latency anchor (subtracted from every loop timing)
    trivial = jax.jit(lambda x: x * 2.0)
    jax.block_until_ready(trivial(jnp.ones(128)))
    t0 = time.perf_counter()
    jax.block_until_ready(trivial(jnp.ones(128)))
    dispatch = time.perf_counter() - t0

    def timed(f, tabs):
        # table ARRAYS ride as jit arguments, not closed-over constants:
        # embedding a big scene's tables in the module (~60 MB of cols at
        # 318k prims) made the axon remote compile exceed 40 min; as
        # parameters the module stays small and compile time stops
        # scaling with scene size. Non-array leaves (SweepTables carries
        # plain-int tile/num_prims) must stay STATIC — slicing with a
        # traced int is an error — so partition: arrays as args, the
        # rest re-attached inside the trace.
        leaves, treedef = jax.tree_util.tree_flatten(tabs)
        arr_idx = [i for i, l in enumerate(leaves)
                   if hasattr(l, "shape") and hasattr(l, "dtype")]

        def wrapped(arrs, o, d):
            ls = list(leaves)
            for j, i in enumerate(arr_idx):
                ls[i] = arrs[j]
            return f(jax.tree_util.tree_unflatten(treedef, ls), o, d)

        arrs = [leaves[i] for i in arr_idx]
        run = jax.jit(wrapped)
        jax.block_until_ready(run(arrs, org, dirs))
        t0 = time.perf_counter()
        jax.block_until_ready(run(arrs, org, dirs))
        return max(0.0, time.perf_counter() - t0 - dispatch) / n_it

    for n in (int(s) for s in args.sizes.split(",")):
        if args.bunny:
            from pathtracer_tpu.scene.bunny import bunny_world
            scene, _ = bunny_world(subdivide=n)
            n = int(scene.num_prims)
        else:
            scene = sphere_cloud(n)
        ct = build_cluster_tables(scene)
        tables = tensor_sweep.pack_sweep_tables(scene)

        def march(tabs, o, d):
            def step(i, acc):
                oo = o + acc * 1e-30
                _, t, v = cluster_march(tabs, oo, d, 1e-3)
                return acc + jnp.sum(jnp.minimum(t, 1.0)) * 1e-30 + 1.0
            return jax.lax.fori_loop(0, n_it, step, jnp.float32(0.0))

        def dense(tabs, o, d):
            def step(i, acc):
                oo = o + acc * 1e-30
                _, t, v = tensor_sweep.tensor_closest(
                    tabs, oo, d, jnp.float32(1e-3), intersect.BIG_T)
                return acc + jnp.sum(jnp.minimum(t, 1.0)) * 1e-30 + 1.0
            return jax.lax.fori_loop(0, n_it, step, jnp.float32(0.0))

        # correctness spot-check at each size (hit agreement)
        i1, t1, v1 = cluster_march(ct, org, dirs, 1e-3)
        i2, t2, v2 = tensor_sweep.tensor_closest(
            tables, org, dirs, jnp.float32(1e-3), intersect.BIG_T)
        agree = float(jnp.mean((v1 == v2).astype(jnp.float32)))
        m_ms = timed(march, ct) * 1e3
        d_ms = timed(dense, tables) * 1e3
        print(f"N={n:6d} C_reg={ct.C_reg:4d}: march {m_ms:7.2f} ms/query  "
              f"dense {d_ms:7.2f} ms/query  ratio {d_ms / max(m_ms, 1e-9):5.1f}x  "
              f"valid-agree {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
