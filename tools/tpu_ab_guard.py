"""Same-process A/B of march-kernel variants (chip state held constant).

Run-to-run chip variance on the axon tunnel is ~±15%, so cross-process
bench comparisons cannot resolve 10-30% kernel effects; this renders the
bench workload with every requested variant inside ONE process and reports
steady-state times + image diffs vs the first variant.

    python tools/tpu_ab_guard.py [--combos 00,10,01,11]
    python tools/tpu_ab_guard.py --sweep-modes highest,bf16x3
    python tools/tpu_ab_guard.py --chunks 57600,115200
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--combos", default="00,10,01,11",
                   help="list of <guard><key2> bits")
    p.add_argument("--sweep-modes", default=None,
                   help="A/B tensor_sweep.SWEEP_MODE instead (e.g. "
                        "highest,bf16x3); overrides --combos")
    p.add_argument("--chunks", default=None,
                   help="A/B cfg.ray_chunk values instead (e.g. "
                        "57600,115200); overrides --combos")
    p.add_argument("--envs", default=None,
                   help="A/B PT_* env variants instead: comma-separated "
                        "variants, each a ;-separated KEY=VAL list "
                        "(empty variant = baseline env), e.g. "
                        "',PT_CLUSTER_PARSEM=1' — the renderer cache key "
                        "includes PT_* so each variant re-traces; "
                        "overrides --combos")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--chunk", type=int, default=57600,
                   help="cfg.ray_chunk for --envs/--combos/--sweep-modes "
                        "variants (so env knobs compose with a chunk size)")
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
    if args.envs is not None:
        # the pseudo-key CHUNK=N sets that variant's cfg.ray_chunk (so a
        # whole default-set can be A/B'd against another in one process)
        variants = []
        for v in args.envs.split(","):
            spec = {"env": ";".join(kv for kv in v.split(";")
                                    if not kv.startswith("CHUNK="))}
            for kv in v.split(";"):
                if kv.startswith("CHUNK="):
                    spec["chunk"] = int(kv.split("=", 1)[1])
            variants.append(("env[" + v + "]", spec))
    elif args.sweep_modes:
        variants = [("mode=" + m, {"sweep_mode": m})
                    for m in args.sweep_modes.split(",")]
    elif args.chunks:
        variants = [("chunk=" + c, {"chunk": int(c)})
                    for c in args.chunks.split(",")]
    else:
        variants = [(f"guard={c[0]} key2={c[1]}",
                     {"guard": c[0] == "1", "key2": c[1] == "1"})
                    for c in args.combos.split(",")]
    env_keys = {kv.split("=", 1)[0]
                for _, v in variants if "env" in v
                for kv in v["env"].split(";") if kv}
    env_saved = {k: os.environ.get(k) for k in env_keys}
    try:
        _run_variants(variants, env_saved, args, imgs, orig)
    finally:
        # restore the baseline env after the LAST variant too — without
        # this, everything after the loop in this process sees the final
        # variant's knobs (ADVICE r3)
        for k, old in env_saved.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        cluster_sweep.cluster_march = orig
    names = list(imgs)
    for nm in names[1:]:
        d = np.abs(imgs[nm] - imgs[names[0]])
        print(f"img {nm} vs {names[0]}: max {d.max():.2e}", flush=True)


def _run_variants(variants, env_saved, args, imgs, orig):
    import os
    import time

    import jax
    import numpy as np
    from pathtracer_tpu.config import RenderConfig
    from pathtracer_tpu.ops import cluster_sweep
    from pathtracer_tpu.render.renderer import make_renderer
    from pathtracer_tpu.scene.worlds import get_world

    scene, cam = get_world("bunny")
    rays = args.width * args.height * args.spp * args.depth
    for name, v in variants:
        if "env" in v:
            # reset this axis's keys to the baseline, then apply the
            # variant's assignments (the renderer cache key covers PT_*)
            for k, old in env_saved.items():
                if old is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = old
            for kv in v["env"].split(";"):
                if kv:
                    k, val = kv.split("=", 1)
                    os.environ[k] = val
        if "guard" in v:
            def patched(*a, _g=v["guard"], _k=v["key2"], **kw):
                kw["guard"] = _g
                kw["key2"] = _k
                return orig(*a, **kw)
            cluster_sweep.cluster_march = patched
        if "sweep_mode" in v:
            # PT_SWEEP_PRECISION is read at trace time (tensor_sweep.
            # sweep_mode); set the env and rebuild the renderer (fresh jit)
            # for a same-process A/B
            os.environ["PT_SWEEP_PRECISION"] = v["sweep_mode"]

        cfg = RenderConfig(width=args.width, height=args.height,
                           spp=args.spp, max_depth=args.depth,
                           accel="cluster",
                           ray_chunk=v.get("chunk", args.chunk),
                           scene="bunny")
        render = make_renderer(cfg, with_bvh=False)
        t0 = time.perf_counter()
        try:
            img = jax.block_until_ready(render(scene, None, cam, 0))
        except Exception as e:  # noqa: BLE001 — a variant that fails to
            # compile (VMEM OOM etc.) must not abort the rest of the batch
            print(f"{name}: FAILED {str(e).splitlines()[0][:160]}",
                  flush=True)
            continue
        tc = time.perf_counter() - t0
        # per-iteration VALUE forcing (not block_until_ready): under some
        # compiled programs the axon tunnel's block_until_ready returns
        # before execution completes (PT_CLUSTER_PARSEM reproduces the r3
        # 44,632 Mrays/s artifact deterministically, image still correct);
        # materializing a 4-byte reduction of the output cannot lie
        import jax.numpy as jnp
        dts = []
        for i in range(3):
            t0 = time.perf_counter()
            img = render(scene, None, cam, i)
            _ = float(np.asarray(jnp.sum(img)))
            dts.append(time.perf_counter() - t0)
        dt = sum(dts) / len(dts)
        print(f"{name}: compile+1 {tc:.0f}s "
              f"steady {dt*1e3:.1f} ms  {rays/dt/1e6:.2f} Mrays/s",
              flush=True)
        imgs[name] = np.asarray(img)


if __name__ == "__main__":
    main()
