"""TPU debug: cluster_march vs tensor_closest, query-level (no render).

Isolates whether an on-chip divergence comes from the march kernel itself
(pure-type switch, rows carry) or the XLA residual merge.

    python tools/tpu_march_debug.py [--force-mixed] [--rows]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="bunny")
    p.add_argument("--n", type=int, default=57600)
    p.add_argument("--force-mixed", action="store_true",
                   help="ctype := 0 everywhere (every visit takes the "
                        "mixed-epilogue switch branch)")
    p.add_argument("--rows", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pathtracer_tpu.core.camera import get_rays
    from pathtracer_tpu.ops import intersect, tensor_sweep
    from pathtracer_tpu.ops.cluster_sweep import cluster_march
    from pathtracer_tpu.ops.clusters import build_cluster_tables
    from pathtracer_tpu.scene import worlds

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = worlds.get_world(args.scene)
    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (4, args.n), jnp.float32)
    o, d, _ = get_rays(cam, u[0], u[1], u[2], u[3],
                       jnp.zeros(args.n, jnp.float32))
    ct = build_cluster_tables(scene)
    if args.force_mixed:
        ct = ct.__class__(**{**{f.name: getattr(ct, f.name)
                                for f in ct.__dataclass_fields__.values()},
                             "ctype": jnp.zeros_like(ct.ctype)})
    K, C_reg = ct.K, ct.C_reg

    march = jax.jit(lambda o, d: cluster_march(
        ct, o, d, 1e-3, with_rows=args.rows))
    out = jax.block_until_ready(march(o, d))
    idx_c, t_c, v_c = out[0], out[1], out[2]

    tables = tensor_sweep.pack_sweep_tables(ct.scene)
    tc = jax.jit(lambda o, d: tensor_sweep.tensor_closest(
        tables, o, d, jnp.float32(1e-3), intersect.BIG_T))
    idx_t, t_t, v_t = jax.block_until_ready(tc(o, d))

    idx_c, t_c, v_c = map(np.asarray, (idx_c, t_c, v_c))
    idx_t, t_t, v_t = map(np.asarray, (idx_t, t_t, v_t))
    print("valid agree:", (v_c == v_t).mean(), flush=True)
    hit = v_c & v_t
    dt = np.abs(t_c[hit] - t_t[hit]) / np.maximum(np.abs(t_t[hit]), 1e-30)
    print("t relative: max", dt.max(), "frac>1e-4", (dt > 1e-4).mean(),
          "bitexact", (t_c[hit] == t_t[hit]).mean(), flush=True)
    res = hit & (idx_c >= C_reg * K)
    reg = hit & ~res
    for name, m in [("residual", res), ("regular", reg)]:
        if m.any():
            d2 = np.abs(t_c[m] - t_t[m]) / np.maximum(np.abs(t_t[m]), 1e-30)
            print(f"{name}: n={m.sum()} bitexact "
                  f"{(t_c[m] == t_t[m]).mean():.4f} maxrel {d2.max():.2e} "
                  f"winner-agree {(idx_c[m] == idx_t[m]).mean():.4f}",
                  flush=True)
    # disagreement rows
    bad = hit & (np.abs(t_c - t_t) > 1e-4 * np.abs(t_t))
    if bad.any():
        i = np.flatnonzero(bad)[:5]
        print("sample disagreements (idx_c, idx_t, t_c, t_t):",
              list(zip(idx_c[i].tolist(), idx_t[i].tolist(),
                       t_c[i].tolist(), t_t[i].tolist())), flush=True)
    vb = v_c != v_t
    if vb.any():
        print("valid mismatches:", vb.sum(), "cluster-valid:",
              v_c[vb].mean(), flush=True)


if __name__ == "__main__":
    main()
