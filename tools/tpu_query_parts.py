"""In-program timing of cluster_march's XLA-side parts (one process).

The march query costs ~6.5-7 ms per 57.6k-ray bounce on chip while the
Pallas kernel itself is ~1-1.5 ms; this breaks the XLA side into parts,
each timed as a fori_loop(N) inside one jit at steady state:

  cull        one _cull pass (R, C) slab tests
  key         two-level bin key from a precomputed entry
  sort        the 14-payload binning sort
  chunkent    post-sort gate + per-chunk entry ordering
  residual    XLA residual sweep + epilogue + argmin + row extraction
  kernel      the march pallas_call with precomputed inputs
  full        cluster_march(with_rows, extras) end to end
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


DISPATCH_MS = [0.0]   # measured once; subtracted from every timing


def timeit(f, *a, n=8):
    """Per-iteration steady-state time of an n-iteration in-program loop,
    with the (~24 ms on this tunnel) per-program dispatch latency
    subtracted — without the subtraction every number carries
    +dispatch/n of bias."""
    import jax
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*a))
    dt = time.perf_counter() - t0
    return max(0.0, dt - DISPATCH_MS[0] * 1e-3) / n


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pathtracer_tpu.core import vec
    from pathtracer_tpu.core.camera import get_rays
    from pathtracer_tpu.ops import cluster_sweep as cs
    from pathtracer_tpu.ops import tensor_sweep
    from pathtracer_tpu.ops.tensor_sweep import BIG, FEAT, OUTS, ray_features
    from pathtracer_tpu.scene import worlds

    print("backend:", jax.default_backend(), flush=True)
    scene, cam = worlds.get_world("bunny")
    ct = cs.build_cluster_tables(scene)
    r = 57600
    ray_tile = 128
    n_chunks = r // ray_tile
    C_reg, K = ct.C_reg, ct.K
    k = jax.random.PRNGKey(0)
    u = jax.random.uniform(k, (5, r), jnp.float32)
    o, d, _ = get_rays(cam, u[0], u[1], u[2], u[3], u[4])
    active = jnp.ones((r,), bool)
    rid = jnp.arange(r, dtype=jnp.int32)
    N = 8

    # Pre-sort the wavefront once: every part below sees march-order rays,
    # exactly like a steady-state sorted-wavefront bounce (unsorted random
    # rays make chunk candidate sets unions over 128 random lanes — the
    # kernel then marches ~all clusters and the numbers mean nothing).
    _closest0 = cs.make_cluster_closest_hit(ct, 1e-3)
    _srt = jax.jit(lambda o_, d_: _closest0.query_sorted(
        o_, d_, active, (rid,)))
    _, _, _, _, o, d, _, (srt_rid,), _pt = jax.block_until_ready(_srt(o, d))

    # Calibration anchor: a fixed elementwise sweep whose steady-state cost
    # is known from a good-state process; if this reads far off, the whole
    # process is in the bad dispatch state — discard the run.
    big = jnp.zeros((4096, 4096), jnp.float32)

    @jax.jit
    def _cal(x):
        def step(i, acc):
            return acc * 0.5 + 1.0
        return jax.lax.fori_loop(0, 8, step, x)[0, 0]
    # per-program dispatch latency (a ~trivial program, timed whole): on
    # this tunnel it is ~24 ms in the common state — subtract it from every
    # in-program timing below instead of treating it as a "bad state"
    tiny = jnp.zeros((8, 128), jnp.float32)
    disp = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(disp(tiny))
    ds = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(disp(tiny))
        ds.append(time.perf_counter() - t0)
    DISPATCH_MS[0] = sorted(ds)[len(ds) // 2] * 1e3
    print(f"dispatch latency (median of 5): {DISPATCH_MS[0]:.2f} ms",
          flush=True)

    jax.block_until_ready(_cal(big))
    t0 = time.perf_counter()
    jax.block_until_ready(_cal(big))
    cal = (time.perf_counter() - t0 - DISPATCH_MS[0] * 1e-3) / 8 * 1e3
    print(f"calib (8x 16M elementwise, expect ~0.1-0.2 ms/pass): "
          f"{cal:.3f} ms", flush=True)
    if cal > 1.5:
        # genuinely bad in-program throughput — numbers would be garbage
        print("BAD STATE — timings unusable; exit 42", flush=True)
        raise SystemExit(42)

    def loop(body):
        # s * 1e-30 (not s * 0): XLA folds mul(s, 0) -> 0 and then hoists
        # the loop-invariant body — several parts measured 0.00 ms that way
        @jax.jit
        def f(o, d):
            def step(i, s):
                return s + body(o + s * 1e-30, d)
            return jax.lax.fori_loop(0, N, step, 0.0)
        return f

    # --- cull (both orientations) ---
    cull = loop(lambda o_, d_: jnp.sum(
        cs._cull(o_, d_, active, ct.cmin, ct.cmax, 1e-3)[:, 0]))
    print(f"cull(R,C): {timeit(cull, o, d, n=N)*1e3:6.2f} ms", flush=True)
    cull_t = loop(lambda o_, d_: jnp.sum(
        cs._cull_T(o_, d_, active, ct.cmin, ct.cmax, 1e-3)[0, :]))
    print(f"cull(C,R): {timeit(cull_t, o, d, n=N)*1e3:6.2f} ms", flush=True)

    entry0 = cs._cull_T(o, d, active, ct.cmin, ct.cmax, 1e-3)

    # --- key (transposed orientation, matches production) ---
    def key_body(o_, d_):
        entry = entry0 + o_[0, 0] * 1e-30
        touched = entry < BIG * 0.5
        kmin = jnp.argmin(entry, axis=0).astype(jnp.int32)
        any_t = jnp.any(touched, axis=0)
        klast = (C_reg - 1 - jnp.argmax(touched[::-1, :], axis=0)
                 .astype(jnp.int32))
        key = jnp.where(any_t, kmin * (C_reg + 1) + klast,
                        jnp.int32(C_reg * (C_reg + 2)))
        return jnp.sum(key).astype(jnp.float32)
    print(f"key:       {timeit(loop(key_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # --- sort (14 payloads, like the sorted-wavefront bounce) ---
    extras = [u[0], u[1], u[2], rid, rid] + [u[3], u[4], u[0]]
    key0 = jnp.argmin(entry0, axis=0).astype(jnp.int32)

    def sort_body(o_, d_):
        ops = jax.lax.sort(
            [key0 + (o_[0, 0] * 1e30).astype(jnp.int32) % 2,
             o_[:, 0], o_[:, 1], o_[:, 2],
             d_[:, 0], d_[:, 1], d_[:, 2], rid,
             active.astype(jnp.int32)] + extras[:5],
            num_keys=1)
        return ops[1][0]
    print(f"sort14:    {timeit(loop(sort_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # --- post-sort: gate + chunk entry ordering ---
    def chunkent_body(o_, d_):
        entry = cs._cull_T(o_, d_, active, ct.cmin, ct.cmax, 1e-3)
        gate = jnp.max(jnp.where(entry >= BIG * 0.5, -BIG, entry), axis=0)
        gate = gate * (1.0 + 1e-5) + 1e-5
        chunk_entry = entry.reshape(C_reg, n_chunks, ray_tile).min(axis=2).T
        iota = jnp.broadcast_to(jnp.arange(C_reg, dtype=jnp.int32),
                                (n_chunks, C_reg))
        ents_s, ids_s = jax.lax.sort_key_val(chunk_entry, iota, dimension=1)
        return jnp.sum(gate) + jnp.sum(ents_s[:, 0])
    print(f"cull+gate+chunksort: {timeit(loop(chunkent_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # --- residual ---
    def residual_body(o_, d_):
        phi = ray_features(o_, d_)
        a = vec.dot(d_, d_)
        a = jnp.where(a == 0.0, 1.0, a)
        S_res = tensor_sweep.sweep_dot(phi, ct.cols[C_reg])
        t_eff = tensor_sweep._epilogue(
            S_res[:, 0:K], S_res[:, K:2 * K], S_res[:, 2 * K:3 * K],
            S_res[:, 3 * K:4 * K], a, ct.is_sphere[C_reg, 0] != 0,
            ct.valid_row[C_reg, 0] != 0, 1e-3, BIG)
        j_res = jnp.argmin(t_eff, axis=1).astype(jnp.int32)
        t_res = jnp.min(t_eff, axis=1)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (K, r), 0)
              == j_res[None, :]).astype(jnp.bfloat16)
        r48 = jax.lax.dot_general(ct.rows[C_reg], oh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rows = (r48[0:16] + r48[16:32]) + r48[32:48]
        return jnp.sum(t_res) + jnp.sum(rows[:, 0])
    print(f"residual:  {timeit(loop(residual_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # --- kernel only (precomputed inputs, march pallas_call per iter) ---
    entry = entry0
    gate = jnp.max(jnp.where(entry >= BIG * 0.5, -BIG, entry), axis=0)
    gate = gate * (1.0 + 1e-5) + 1e-5
    chunk_entry = entry.reshape(C_reg, n_chunks, ray_tile).min(axis=2).T
    iota = jnp.broadcast_to(jnp.arange(C_reg, dtype=jnp.int32),
                            (n_chunks, C_reg))
    ents_s, ids_s = jax.lax.sort_key_val(chunk_entry, iota, dimension=1)
    ids = jnp.concatenate([ids_s, jnp.zeros((n_chunks, 1), jnp.int32)], 1)
    ents = jnp.concatenate(
        [ents_s, jnp.full((n_chunks, 1), BIG, jnp.float32)], 1)
    phi0 = ray_features(o, d)
    a0 = vec.dot(d, d)

    def kernel_body(o_, d_):
        phi = phi0 + o_[0, 0] * 1e-30
        a3 = a0.reshape(n_chunks, 1, ray_tile)
        gate3 = gate.reshape(n_chunks, 1, ray_tile)
        kernel = functools.partial(cs._march_kernel, K=K, M=C_reg,
                                   t_min=1e-3, t_max=cs.BIG,
                                   with_rows=True, guard=False,
                                   fused6=False, wide=1, pipe=False,
                                   grouped=False)
        C_tot = ct.cols.shape[0]

        def blk(shape, index=None):
            if index is None:
                return pl.BlockSpec(shape, lambda i, *_: (i,) + (0,) * (
                    len(shape) - 1))
            return pl.BlockSpec(shape, lambda i, *_: index)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_chunks,),
            in_specs=[
                blk((ray_tile, FEAT)), blk((1, 1, ray_tile)),
                blk((1, 1, ray_tile)),
                blk((C_tot, FEAT, OUTS * K), (0, 0, 0)),
                blk((C_tot, 1, K), (0, 0, 0)),
                blk((C_tot, 1, K), (0, 0, 0)),
                blk((C_tot, 48, K), (0, 0, 0)),
            ],
            out_specs=[blk((1, 1, ray_tile)), blk((1, 1, ray_tile)),
                       blk((1, 16, ray_tile)), blk((1, 1, ray_tile))],
        )
        t_b, best, rows_k, wins_k = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks, 1, ray_tile), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, 1, ray_tile), jnp.int32),
                jax.ShapeDtypeStruct((n_chunks, 16, ray_tile), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, 1, ray_tile), jnp.int32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(ids, ents, ct.ctype, phi, a3, gate3, ct.cols, ct.is_sphere,
          ct.valid_row, ct.rows)
        return jnp.sum(t_b[:, 0, 0]) + jnp.sum(rows_k[0, :, 0])
    print(f"kernel:    {timeit(loop(kernel_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # --- full query_sorted ---
    closest = cs.make_cluster_closest_hit(ct, 1e-3)
    ex = tuple(extras[:5])

    def full_body(o_, d_):
        out = closest.query_sorted(o_, d_, active, ex)
        return jnp.sum(out[1])
    print(f"full(q_sorted): {timeit(loop(full_body), o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # chained variant (decompose-style): outputs feed the next query, like
    # the integrator's sorted wavefront
    @jax.jit
    def chain(o_, d_):
        def step(i, carry):
            o2, d2, s = carry
            out = closest.query_sorted(o2, d2, active, ex)
            return out[4], out[5], s + jnp.sum(out[1])
        return jax.lax.fori_loop(0, N, step, (o_, d_, 0.0))[2]
    print(f"full(chained): {timeit(chain, o, d, n=N)*1e3:6.2f} ms",
          flush=True)

    # does a pallas custom-call inside fori_loop pay a per-iteration
    # tunnel roundtrip? N-scaling: per-iter time constant across N => yes
    for n_iter in (4, 32):
        @jax.jit
        def k_loop(o_, d_, _n=n_iter):
            def step(i, s):
                r = kernel_body(o_ + s * 1e-30, d_)
                return s + r * 1e-30
            return jax.lax.fori_loop(0, _n, step, 0.0)
        print(f"kernel xN={n_iter}: {timeit(k_loop, o, d, n=n_iter)*1e3:6.2f}"
              " ms/iter", flush=True)

    # re-check the chip/host state after the run: if this drifted, the
    # numbers above straddle a state change — discard
    t0 = time.perf_counter()
    jax.block_until_ready(_cal(big))
    print(f"calib end: {(time.perf_counter()-t0)/8*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
