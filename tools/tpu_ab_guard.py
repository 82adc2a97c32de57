"""Same-process A/B of march-kernel variants (chip state held constant).

Run-to-run chip variance on the axon tunnel is ~±15%, so cross-process
bench comparisons cannot resolve 10-30% kernel effects; this renders the
bench workload with every (guard, key2) combination inside ONE process and
reports steady-state times.

    python tools/tpu_ab_guard.py [--combos 00,10,01,11]
"""
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--combos", default="00,10,01,11",
                   help="list of <guard><key2> bits")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.ops import cluster_sweep
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = get_world("bunny")
    rays = args.width * args.height * args.spp * args.depth

    orig = cluster_sweep.cluster_march
    import numpy as np
    imgs = {}
    for combo in args.combos.split(","):
        g, k2 = combo[0] == "1", combo[1] == "1"

        def patched(*a, **kw):
            kw["guard"] = g
            kw["key2"] = k2
            return orig(*a, **kw)
        cluster_sweep.cluster_march = patched

        cfg = RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.depth,
                           accel="cluster", ray_chunk=57600, scene="bunny")
        render = make_renderer(cfg, with_bvh=False)
        t0 = time.perf_counter()
        img = jax.block_until_ready(render(scene, None, cam, 0))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(3):
            img = render(scene, None, cam, 0)
        jax.block_until_ready(img)
        dt = (time.perf_counter() - t0) / 3
        print(f"guard={int(g)} key2={int(k2)}: compile+1 {tc:.0f}s "
              f"steady {dt*1e3:.1f} ms  {rays/dt/1e6:.2f} Mrays/s",
              flush=True)
        imgs[combo] = np.asarray(img)
    cluster_sweep.cluster_march = orig
    names = list(imgs)
    for nm in names[1:]:
        d = np.abs(imgs[nm] - imgs[names[0]])
        print(f"img {nm} vs {names[0]}: max {d.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
