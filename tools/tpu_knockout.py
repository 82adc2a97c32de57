"""Whole-render knockout timing: decision-grade cost attribution.

Microbenchmarks on the axon tunnel are unreliable (bimodal per-dispatch
latency AND erratic in-program throughput flips — see docs/DESIGN.md), but
whole renders at steady state have been reproducible all round. This tool
renders the bench workload in ONE process under a set of knockouts and
attributes per-bounce cost by subtraction:

  full          the production render (baseline)
  kernel-stub   march pallas_call skipped, its XLA feeders kept alive
                (full - kernel-stub ~ the kernel's true cost incl. launch)
  gate-stub     kernel launches + DMAs tables but marches zero visits
                (full - gate-stub ~ pure per-visit cost;
                 gate-stub - kernel-stub ~ launch + table-DMA cost)
  sort-off      binning sort disabled (PT_CLUSTER_SORT=0): unsorted
                wavefront, query_rows path — sort + keep-sorted protocol
  query-stub    query_sorted replaced by a shape-correct no-op: the
                integrator floor (shading + RNG + records + epilogue)

Images are wrong under every knockout except full — timing only.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="full,kernel-stub,query-stub")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--chunk", type=int, default=57600)
    args = p.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.ops import cluster_sweep
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = get_world("bunny")
    rays = args.width * args.height * args.spp * args.depth

    orig_factory = cluster_sweep.make_cluster_closest_hit

    def run(name):
        os.environ.pop("PT_CLUSTER_STUB", None)
        os.environ.pop("PT_CLUSTER_SORT", None)
        cluster_sweep.make_cluster_closest_hit = orig_factory
        if name == "kernel-stub":
            os.environ["PT_CLUSTER_STUB"] = "kernel"
        elif name == "gate-stub":
            os.environ["PT_CLUSTER_STUB"] = "gate"
        elif name == "sort-off":
            os.environ["PT_CLUSTER_SORT"] = "0"
        elif name == "query-stub":
            def stub_factory(ct, t_min, **kw):
                closest = orig_factory(ct, t_min, **kw)

                # the stub must report HITS (valid=True) or the bounce
                # while_loop exits after one iteration and the "floor"
                # measures a single bounce instead of max_depth of them
                def q_sorted(o, d, active, extras):
                    r = o.shape[0]
                    return (jnp.zeros((r,), jnp.int32),
                            jnp.full((r,), 1.0, jnp.float32),
                            jnp.ones((r,), bool),
                            jnp.zeros((16, r), jnp.float32),
                            o, d, active, tuple(extras),
                            jnp.zeros((), jnp.float32))
                closest.query_sorted = q_sorted

                def q_rows(o, d):
                    r = o.shape[0]
                    return (jnp.zeros((r,), jnp.int32),
                            jnp.full((r,), 1.0, jnp.float32),
                            jnp.ones((r,), bool),
                            jnp.zeros((16, r), jnp.float32))
                closest.query_rows = q_rows
                return closest
            cluster_sweep.make_cluster_closest_hit = stub_factory

        cfg = RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.depth,
                           accel="cluster", ray_chunk=args.chunk,
                           scene="bunny")
        render = make_renderer(cfg, with_bvh=False)
        # Force a VALUE, not block_until_ready: under PT_CLUSTER_PARSEM
        # (default-on) the axon tunnel's block_until_ready returns before
        # execution completes (the r3 44,632 Mrays/s artifact). An 8-byte
        # host reduction cannot lie — same discipline as bench.py.
        import numpy as _np

        def force(x):
            return float(_np.asarray(jnp.sum(x)))

        t0 = time.perf_counter()
        force(render(scene, None, cam, 0))
        tc = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            force(render(scene, None, cam, 0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: compile+1 {tc:.0f}s steady(min of 3) "
              f"{best*1e3:.1f} ms  {rays/best/1e6:.2f} Mrays/s", flush=True)
        return best

    results = {}
    for name in args.variants.split(","):
        results[name] = run(name)
    cluster_sweep.make_cluster_closest_hit = orig_factory
    if "full" in results:
        base = results["full"]
        for name, v in results.items():
            if name != "full":
                print(f"attribution: full - {name} = "
                      f"{(base - v)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
