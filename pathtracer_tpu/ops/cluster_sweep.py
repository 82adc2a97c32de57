"""Cluster-culled closest-hit: ray binning by sort + an in-kernel march.

This is the TPU answer to the reference's sub-linear BVH traversal
(``utils/render_manager.h:86-135``): instead of a per-ray stack walk
(serialized pointer-chasing on TPU, docs/DESIGN.md), rays are *binned by
sort* against morton clusters of primitives (ops/clusters.py) and each
128-ray chunk sweeps only the clusters that can matter, using the fused
matmul+epilogue kernel per cluster — the dense O(R*N) sweep becomes
~O(R * (C + clusters-that-matter * K)).

Default strategy — ``cluster_march`` (single pass):

1. cull: slab-test every ray against the C cluster AABBs ((R, C) dense VPU
   work, C is tiny), giving conservative entry distances;
2. bin: one optional ``lax.sort`` groups rays by nearest cluster (this is
   load-bearing: sorted chunks march 2.5 clusters on average on the bunny,
   unsorted ~34, because a chunk's candidate set is the union over its
   lanes); terminated (d == 0) rays resolve instantly and sort into idle
   chunks — inter-bounce wavefront compaction falls out of the same sort;
3. march: ONE Pallas launch; each chunk walks its clusters in ascending
   chunk-entry order (tiny per-chunk sort, scalar-prefetched) inside a
   ``lax.while_loop``, halting once every lane's ``min(best hit, own
   farthest touched entry)`` precedes the next cluster's entry. The
   residual tile (huge prims) is swept for every ray as one fused XLA
   matmul outside the kernel and merged after (backdrop-only chunks march
   zero clusters). Exact: a remaining cluster's per-ray entry is
   lower-bounded by its chunk entry, and entries ascend (ulp margin
   applied in the cull);
4. unsort by ray id.

``cluster_closest`` (strategy="rounds") is the earlier multi-round
sort/cull/window pipeline with per-ray processed bitsets and an exact
full-width fallback — same results, ~40% slower on chip (per-round XLA
overhead); kept for cross-checking and A/B.

Ties between *different* primitives at bit-equal t may pick a different
winner than the dense sweep's lowest-index rule (measure zero).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.core import vec
from pathtracer_tpu.ops import tensor_sweep
from pathtracer_tpu.ops.clusters import (K_RES, ClusterTables,
                                          build_cluster_tables)
from pathtracer_tpu.ops.tensor_sweep import BIG, FEAT, OUTS, ray_features

DEF_RAY_TILE = 128
DEF_WINDOW = 4       # clusters per march-round window
DEF_MAX_ROUNDS = 6
_RESOLVED_KEY = jnp.int32(0x3FFFFFFF)

# Conservative shrink applied to cluster entry distances before they gate
# resolution: slab-test and matmul-epilogue arithmetic differ at ulp level,
# so a hit exactly on a cluster boundary could otherwise be ordered wrongly.
_ENTRY_MARGIN = 1e-4


def _window_kernel(starts_ref, skips_ref, phi_ref, a_ref, cols_ref, sph_ref,
                   valid_ref, t_ref, best_ref, *, K, W, t_min):
    """Sweep W consecutive clusters (starting at starts[i]) for ray chunk i.

    Outputs are the chunk's best (t, reordered-prim index) over the window
    only; the caller merges across rounds. Skipped chunks write the identity
    (BIG, -1)."""
    i = pl.program_id(0)
    t_ref[0, 0] = jnp.full((phi_ref.shape[0],), BIG, jnp.float32)
    best_ref[0, 0] = jnp.full((phi_ref.shape[0],), -1, jnp.int32)

    @pl.when(skips_ref[i] == 0)
    def _():
        phi = phi_ref[:]
        a = a_ref[0, 0]
        start = starts_ref[i]

        def step(j, carry):
            t_acc, b_acc = carry
            c = start + j
            blk = cols_ref[pl.ds(c, 1), :, :][0]
            S = tensor_sweep.sweep_dot(phi, blk, in_kernel=True)
            sph = sph_ref[pl.ds(c, 1), :, :][0, 0]
            valid = valid_ref[pl.ds(c, 1), :, :][0, 0]
            t_eff = tensor_sweep._epilogue(
                S[:, 0:K], S[:, K:2 * K], S[:, 2 * K:3 * K],
                S[:, 3 * K:4 * K], a, sph != 0, valid != 0, t_min, BIG)
            local_j = jnp.argmin(t_eff, axis=1).astype(jnp.int32)
            local_t = jnp.min(t_eff, axis=1)
            better = local_t < t_acc
            b_acc = jnp.where(better, c * K + local_j, b_acc)
            t_acc = jnp.where(better, local_t, t_acc)
            return t_acc, b_acc

        t0 = jnp.full((phi_ref.shape[0],), BIG, jnp.float32)
        b0 = jnp.full((phi_ref.shape[0],), -1, jnp.int32)
        t_acc, b_acc = jax.lax.fori_loop(0, W, step, (t0, b0))
        t_ref[0, 0] = t_acc
        best_ref[0, 0] = b_acc


def _window_pass(ct: ClusterTables, phi, a, starts, skips, W, t_min,
                 ray_tile):
    """One pallas launch of the windowed kernel over all chunks."""
    n_chunks = starts.shape[0]
    K = ct.K
    a3 = a.reshape(n_chunks, 1, ray_tile)
    C_tot = ct.cols.shape[0]

    kernel = functools.partial(_window_kernel, K=K, W=W, t_min=float(t_min))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((ray_tile, FEAT), lambda i, s, k: (i, 0)),
            pl.BlockSpec((1, 1, ray_tile), lambda i, s, k: (i, 0, 0)),
            pl.BlockSpec((C_tot, FEAT, OUTS * K),
                         lambda i, s, k: (0, 0, 0)),
            pl.BlockSpec((C_tot, 1, K), lambda i, s, k: (0, 0, 0)),
            pl.BlockSpec((C_tot, 1, K), lambda i, s, k: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ray_tile), lambda i, s, k: (i, 0, 0)),
            pl.BlockSpec((1, 1, ray_tile), lambda i, s, k: (i, 0, 0)),
        ],
    )
    t_w, b_w = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, 1, ray_tile), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(starts, skips, phi, a3, ct.cols, ct.is_sphere, ct.valid_row)
    return t_w.reshape(-1), b_w.reshape(-1)


def _cull(o, d, active, cmin, cmax, t_min):
    """Conservative per-(ray, cluster) entry distances, (R, C_reg) f32.

    BIG where the ray's slab test misses the cluster AABB (or the ray is
    inactive). Entry distances are clamped below by t_min and shrunk by a
    small margin so they remain a strict lower bound on any accepted hit t
    inside the cluster (see module docstring). NaN-dropping running selects
    reproduce the reference aabb semantics (utils/aabb.h:21-34) so d == 0
    components are safe."""
    inv = 1.0 / d                                     # (R, 3), +-inf ok
    shape = (o.shape[0], cmin.shape[0])
    tn = jnp.full(shape, t_min, jnp.float32)
    tf = jnp.full(shape, BIG, jnp.float32)
    # per-axis (R, C) temporaries only — never materialize (R, C, 3)
    for ax in range(3):
        inv_ax = inv[:, ax:ax + 1]
        lo = (cmin[None, :, ax] - o[:, ax:ax + 1]) * inv_ax
        hi = (cmax[None, :, ax] - o[:, ax:ax + 1]) * inv_ax
        swap = inv_ax < 0.0
        near = jnp.where(swap, hi, lo)
        far = jnp.where(swap, lo, hi)
        tn = jnp.where(near > tn, near, tn)
        tf = jnp.where(far < tf, far, tf)
    hit = ~(tf < tn) & active[:, None]
    entry = tn - (_ENTRY_MARGIN * jnp.abs(tn) + 1e-6)
    return jnp.where(hit, entry, BIG)


def _cull_T(o, d, active, cmin, cmax, t_min, with_exit: bool = False):
    """Transposed :func:`_cull`: (C_reg, R) f32, rays on the lane dim.

    Bit-identical entries (same op order per element); the layout is the
    point — C_reg is far below the 128-lane register width, so the (R, C)
    orientation pads every elementwise pass 128/C x, while (C, R) keeps
    lanes full (R is chunk-aligned) and pads only sublanes (C -> next
    multiple of 8).

    ``with_exit``: also return the raw slab EXIT distances (tf; -BIG where
    the slab test misses) — the two-level (cull2) march gates each lane on
    its farthest touched SUPERCLUSTER exit: any hit the lane can still find
    lies inside some touched super's [entry, exit] interval, so beyond the
    farthest exit nothing remains (the member-granularity entries the
    per-ray gate used are never computed per ray at scale)."""
    inv = 1.0 / d                                     # (R, 3), +-inf ok
    shape = (cmin.shape[0], o.shape[0])
    tn = jnp.full(shape, t_min, jnp.float32)
    tf = jnp.full(shape, BIG, jnp.float32)
    for ax in range(3):
        inv_ax = inv[None, :, ax]
        lo = (cmin[:, ax:ax + 1] - o[None, :, ax]) * inv_ax
        hi = (cmax[:, ax:ax + 1] - o[None, :, ax]) * inv_ax
        swap = inv_ax < 0.0
        near = jnp.where(swap, hi, lo)
        far = jnp.where(swap, lo, hi)
        tn = jnp.where(near > tn, near, tn)
        tf = jnp.where(far < tf, far, tf)
    hit = ~(tf < tn) & active[None, :]
    entry = tn - (_ENTRY_MARGIN * jnp.abs(tn) + 1e-6)
    entry = jnp.where(hit, entry, BIG)
    if with_exit:
        return entry, jnp.where(hit, tf, -BIG)
    return entry


def _chunk_interval_cull(o, d, active, cmin, cmax, t_min, n_chunks,
                         ray_tile):
    """Conservative per-(chunk, cluster) entry lower bounds,
    (n_chunks, C) f32 — the cull2 march's member-granularity ordering.

    Interval-arithmetic slab test of each chunk's ray BUNDLE (the box
    hull of its active lanes' origins x the interval hull of their
    directions) against every cluster AABB. The result lower-bounds every
    active lane's margined per-ray entry (so the march-order/stop-rule
    proofs hold unchanged), and is BIG where every lane provably misses.
    Cost is O(n_chunks x C) — ray_tile x cheaper than the dense (R, C)
    per-ray cull whose intermediate reaches GB scale at 10^6 prims
    (VERDICT r4 #3/weak #4); pruning power rests on the binning sort
    having grouped coherent rays (the same locality the march itself
    needs). Axes whose direction interval spans zero contribute no bound
    (their `inv` interval is unbounded) — conservative, never wrong."""
    big = jnp.float32(BIG)
    o3 = o.reshape(n_chunks, ray_tile, 3)
    d3 = d.reshape(n_chunks, ray_tile, 3)
    m = active.reshape(n_chunks, ray_tile, 1)
    o_lo = jnp.min(jnp.where(m, o3, big), axis=1)     # (n_chunks, 3)
    o_hi = jnp.max(jnp.where(m, o3, -big), axis=1)
    d_lo = jnp.min(jnp.where(m, d3, big), axis=1)
    d_hi = jnp.max(jnp.where(m, d3, -big), axis=1)
    any_live = jnp.any(m[:, :, 0], axis=1)            # (n_chunks,)
    C = cmin.shape[0]
    tn = jnp.full((n_chunks, C), t_min, jnp.float32)  # LB over lanes of tn
    tf = jnp.full((n_chunks, C), BIG, jnp.float32)    # UB over lanes of tf
    for ax in range(3):
        dl = d_lo[:, ax:ax + 1]
        dh = d_hi[:, ax:ax + 1]
        # a direction interval touching zero makes 1/d unbounded — the
        # axis then bounds nothing (eps also guards subnormal 1/d inf)
        span0 = (dl <= 1e-30) & (dh >= -1e-30)
        ia = 1.0 / dh
        ib = 1.0 / dl
        inv_lo = jnp.minimum(ia, ib)
        inv_hi = jnp.maximum(ia, ib)
        pl_lo = cmin[None, :, ax] - o_hi[:, ax:ax + 1]   # (n_chunks, C)
        pl_hi = cmin[None, :, ax] - o_lo[:, ax:ax + 1]
        ph_lo = cmax[None, :, ax] - o_hi[:, ax:ax + 1]
        ph_hi = cmax[None, :, ax] - o_lo[:, ax:ax + 1]

        def ip_lo(a_lo, a_hi):
            return jnp.minimum(
                jnp.minimum(a_lo * inv_lo, a_lo * inv_hi),
                jnp.minimum(a_hi * inv_lo, a_hi * inv_hi))

        def ip_hi(a_lo, a_hi):
            return jnp.maximum(
                jnp.maximum(a_lo * inv_lo, a_lo * inv_hi),
                jnp.maximum(a_hi * inv_lo, a_hi * inv_hi))

        # per-ray near = min(A, B), far = max(A, B) (the sign swap in
        # _cull is exactly this min/max since cmax >= cmin)
        near_lb = jnp.minimum(ip_lo(pl_lo, pl_hi), ip_lo(ph_lo, ph_hi))
        far_ub = jnp.maximum(ip_hi(pl_lo, pl_hi), ip_hi(ph_lo, ph_hi))
        tn = jnp.maximum(tn, jnp.where(span0, -big, near_lb))
        tf = jnp.minimum(tf, jnp.where(span0, big, far_ub))
    miss = tf < tn                    # certificate: every lane misses
    ent = tn - (_ENTRY_MARGIN * jnp.abs(tn) + 1e-6)
    return jnp.where(miss | ~any_live[:, None], BIG, ent)


def _expand_mask(words, C_reg):
    """(R, nw) uint32 bitset -> (R, C_reg) bool of processed clusters."""
    rep = jnp.repeat(words, 32, axis=1)[:, :C_reg]
    shifts = jnp.tile(jnp.arange(32, dtype=jnp.uint32),
                      words.shape[1])[:C_reg]
    return ((rep >> shifts[None, :]) & jnp.uint32(1)) != 0


def _window_bits(start, W, nw):
    """uint32 words with bits [start, start+W) set; start is (R,) int32."""
    out = []
    for w in range(nw):
        lo = jnp.clip(start - 32 * w, 0, 32)
        hi = jnp.clip(start + W - 32 * w, 0, 32)

        def below(n):
            full = n >= 32
            return jnp.where(full, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << jnp.clip(n, 0, 31)
                              .astype(jnp.uint32)) - jnp.uint32(1))

        out.append(below(hi) ^ below(lo))
    return jnp.stack(out, axis=1)


def _key_and_resolved(entry, processed, t_best):
    """Nearest unprocessed beatable cluster per ray (+ resolved flag)."""
    cand = jnp.where(processed | (entry >= t_best[:, None]), BIG, entry)
    m = jnp.min(cand, axis=1)
    key = jnp.argmin(cand, axis=1).astype(jnp.int32)
    resolved = m >= BIG * 0.5
    return jnp.where(resolved, _RESOLVED_KEY, key), resolved


def cluster_closest(ct: ClusterTables, o, d, t_min,
                    ray_tile: int = DEF_RAY_TILE,
                    window: int = DEF_WINDOW,
                    max_rounds: int = DEF_MAX_ROUNDS,
                    sort_rays: bool = True,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Culled closest-hit: (prim_idx, t, valid), each (R,).

    ``prim_idx`` indexes the *reordered* scene in ``ct.scene`` (use it with
    that scene; ``ct.perm`` maps back to original rows). Rays with d == 0
    resolve instantly as misses — callers use this to retire terminated
    wavefront lanes (render/integrator.py).
    """
    if ct.K % 128 != 0:
        raise ValueError("rounds strategy needs K % 128 == 0 (lane slices "
                         "at K granularity); small K is march+split only")
    r = o.shape[0]
    C_reg = ct.C_reg
    W = min(window, C_reg)
    r_pad = -(-r // ray_tile) * ray_tile
    n_chunks = r_pad // ray_tile
    nw = -(-C_reg // 32)

    if r_pad != r:
        o = jnp.pad(o, ((0, r_pad - r), (0, 0)))
        d = jnp.pad(d, ((0, r_pad - r), (0, 0)))

    active = jnp.any(d != 0.0, axis=1)
    active0 = active  # caller order
    t_min = float(t_min)

    def phi_a(o_, d_):
        phi = ray_features(o_, d_)
        a = vec.dot(d_, d_)
        # inactive rays: phi rows are harmless, but a == 0 would NaN the
        # sphere roots; a = 1 with d = 0 makes every test reject cleanly
        # (same trick as ops/pallas_sweep padding).
        return phi, jnp.where(a == 0.0, 1.0, a)

    # ---- phase 1: residual tile, every ray exactly once -------------------
    phi, a = phi_a(o, d)
    res_starts = jnp.full((n_chunks,), C_reg, jnp.int32)
    chunk_dead = jnp.all(~active.reshape(n_chunks, ray_tile), axis=1)
    t_best, best = _window_pass(ct, phi, a, res_starts,
                                chunk_dead.astype(jnp.int32), 1, t_min,
                                ray_tile)

    # ---- phase 2: cull + march --------------------------------------------
    entry = _cull(o, d, active, ct.cmin, ct.cmax, t_min)
    words0 = jnp.zeros((r_pad, nw), jnp.uint32)
    key, resolved = _key_and_resolved(entry, jnp.zeros_like(entry, bool),
                                      t_best)
    rid = jnp.arange(r_pad, dtype=jnp.int32)

    def round_body(state):
        rounds, o_, d_, t_b, b_, words, rid_, key_, resolved_ = state
        if sort_rays:
            ops = jax.lax.sort(
                [key_, o_[:, 0], o_[:, 1], o_[:, 2],
                 d_[:, 0], d_[:, 1], d_[:, 2], t_b, b_, rid_]
                + [words[:, w] for w in range(nw)],
                num_keys=1, is_stable=True)
            key_ = ops[0]
            o_ = jnp.stack(ops[1:4], axis=1)
            d_ = jnp.stack(ops[4:7], axis=1)
            t_b, b_, rid_ = ops[7], ops[8], ops[9]
            words = jnp.stack(ops[10:10 + nw], axis=1)

        key_c = key_.reshape(n_chunks, ray_tile)
        chunk_min = jnp.min(key_c, axis=1)
        skip = (chunk_min >= _RESOLVED_KEY).astype(jnp.int32)
        starts = jnp.clip(chunk_min, 0, max(C_reg - W, 0))

        phi_, a_ = phi_a(o_, d_)
        t_w, b_w = _window_pass(ct, phi_, a_, starts, skip, W, t_min,
                                ray_tile)
        better = t_w < t_b
        t_b = jnp.where(better, t_w, t_b)
        b_ = jnp.where(better, b_w, b_)

        start_r = jnp.repeat(starts, ray_tile)
        upd = jnp.repeat(skip == 0, ray_tile)
        words = jnp.where(upd[:, None],
                          words | _window_bits(start_r, W, nw), words)

        entry_ = _cull(o_, d_, jnp.any(d_ != 0.0, axis=1), ct.cmin,
                       ct.cmax, t_min)
        key_, resolved_ = _key_and_resolved(entry_, _expand_mask(words,
                                                                 C_reg),
                                            t_b)
        return (rounds + 1, o_, d_, t_b, b_, words, rid_, key_, resolved_)

    def round_cond(state):
        rounds = state[0]
        resolved_ = state[-1]
        return (rounds < max_rounds) & jnp.any(~resolved_)

    state = (jnp.int32(0), o, d, t_best, best, words0, rid, key, resolved)
    _, o, d, t_best, best, words, rid, key, resolved = jax.lax.while_loop(
        round_cond, round_body, state)

    # ---- phase 3: exact fallback for stragglers ---------------------------
    def fallback(args):
        o_, d_, t_b, b_, rid_, resolved_ = args
        skey = resolved_.astype(jnp.int32)
        if sort_rays:
            # compact unresolved rays into leading chunks
            ops = jax.lax.sort(
                [skey, o_[:, 0], o_[:, 1], o_[:, 2],
                 d_[:, 0], d_[:, 1], d_[:, 2], t_b, b_, rid_],
                num_keys=1, is_stable=True)
            skey = ops[0]
            o_ = jnp.stack(ops[1:4], axis=1)
            d_ = jnp.stack(ops[4:7], axis=1)
            t_b, b_, rid_ = ops[7], ops[8], ops[9]
        skip = jnp.all(skey.reshape(n_chunks, ray_tile) == 1,
                       axis=1).astype(jnp.int32)
        phi_, a_ = phi_a(o_, d_)
        t_w, b_w = _window_pass(ct, phi_, a_,
                                jnp.zeros((n_chunks,), jnp.int32), skip,
                                C_reg, t_min, ray_tile)
        better = t_w < t_b
        return (jnp.where(better, t_w, t_b), jnp.where(better, b_w, b_),
                rid_)

    t_best, best, rid = jax.lax.cond(
        jnp.any(~resolved), fallback,
        lambda args: (args[2], args[3], args[4]),
        (o, d, t_best, best, rid, resolved))

    # ---- unsort back to caller ray order ----------------------------------
    if sort_rays:  # unsorted mode never permutes (fallback included)
        rid, t_best, best = jax.lax.sort([rid, t_best, best], num_keys=1)
    t_best = t_best[:r]
    best = best[:r]
    # dead-ray pseudo-hits masked (see cluster_march)
    found = (best >= 0) & active0[:r]
    return jnp.where(found, best, 0), t_best, found


def _march_kernel(*refs, K, M, t_min, t_max, with_rows, guard, fused6,
                  wide, pipe, grouped, split=False, C_tot=0, stream=False,
                  knock="", fixwin=0, rows_cond=False, orddma=False,
                  narrow=0, orddma2=True):
    _ROWS_COND = rows_cond
    """In-kernel cluster march for ray chunk i.

    Walks the chunk's regular clusters in ascending chunk-entry order
    (ids/ents are scalar-prefetched, computed by the caller; the residual
    tile is swept in XLA by the caller and merged after — chunks whose
    lanes touch no cluster march zero iterations). Iteration j halts once
    every lane's best hit is at or before the next cluster's entry — no
    remaining cluster can beat any lane (entries ascend, and each lane's
    own entry to a cluster >= the chunk's). All march state lives in
    registers/VMEM; the only XLA-side work per query is one cull and one
    tiny per-chunk sort.

    Per-visit slab guard (``guard=True``, OFF by default — measured
    NEGATIVE on chip): re-slab the 128 rays against the cluster's AABB and
    ``lax.cond``-skip the visit when no live lane can improve. Exact (any
    accepted hit is lower-bounded by the margined entry; images
    bit-identical), and it does cut matmul visits ~16-37%%, but the
    per-iteration cond breaks Mosaic's ability to overlap the next
    cols-block DMA with compute: same-process A/B on the bunny bench
    measured 7.69 -> 6.08 Mrays/s with the guard on. Kept env-gated
    (PT_CLUSTER_GUARD=1) as infrastructure — a future Mosaic with cheaper
    divergence or manual double-buffering could flip the sign. The guard's
    two extra inputs (cluster AABB corners, per-chunk ray o/d blocks) are
    only part of the kernel signature when guard=True — the default kernel
    neither relayouts nor DMAs them."""
    if stream:
        # Streamed-table march (PT_CLUSTER_STREAM=1): the cluster tables
        # live in HBM (memory_space ANY); only *visited* clusters ever
        # cross into VMEM, via double-buffered per-window async DMAs —
        # capacity becomes HBM-bound (millions of prims) instead of the
        # ~65k-prim VMEM wall, and sub-linearity is preserved because DMA
        # traffic is proportional to clusters MARCHED, not scene size.
        # The per-chunk ids/ents order rows also live in HBM and are
        # DMA'd into SMEM scratch at chunk start (the scalar-prefetch
        # SMEM tables grow as n_chunks x C_reg and stop fitting long
        # before the cols do — the DESIGN.md "SMEM growth" open risk).
        (ctype_ref, ids_hbm, ents_hbm, phi_ref, a_ref, gate_ref,
         cols_hbm, sph_ref, valid_ref, rows_hbm,
         t_ref, best_ref, rows_out, win_ref, ids_s, ents_s, tab_sem,
         cols_buf, cols_sem, *rest) = refs
        if with_rows:
            rows_buf, rows_sem = rest
        ids_ref = ents_ref = cols_ref = rows_ref = None
    elif guard:
        (ids_ref, ents_ref, ctype_ref, cbox_ref, phi_ref, a_ref,
         gate_ref, od_ref, cols_ref, sph_ref, valid_ref, rows_ref,
         t_ref, best_ref, rows_out, win_ref) = refs
    elif orddma:
        # resident tables + HBM order rows (the streamed march's order-DMA
        # pattern without streaming the cols): lifts the n_chunks x M SMEM
        # scalar-prefetch wall, unlocking whole-image chunks (the axon
        # remote compile aborts around n_chunks x M x 8 B ~ 1.25 MB)
        (ctype_ref, ids_hbm, ents_hbm, phi_ref, a_ref,
         gate_ref, cols_ref, sph_ref, valid_ref, rows_ref,
         t_ref, best_ref, rows_out, win_ref, ids_s, ents_s,
         tab_sem) = refs
        ids_ref = ents_ref = None
    else:
        (ids_ref, ents_ref, ctype_ref, phi_ref, a_ref,
         gate_ref, cols_ref, sph_ref, valid_ref, rows_ref,
         t_ref, best_ref, rows_out, win_ref) = refs
    i = pl.program_id(0)
    if orddma and not orddma2:
        # single-buffered order DMA (PT_CLUSTER_ORDDMA2=0 — the r4 form,
        # kept for A/B): both DMAs start and are waited at chunk start
        cp_i = pltpu.make_async_copy(ids_hbm.at[i], ids_s, tab_sem.at[0])
        cp_e = pltpu.make_async_copy(ents_hbm.at[i], ents_s, tab_sem.at[1])
        cp_i.start()
        cp_e.start()
        cp_i.wait()
        cp_e.wait()

        def ids_at(j):
            return ids_s[j // 128, j % 128]

        def ents_at(j):
            return ents_s[j // 128, j % 128]
    elif orddma:
        # Cross-step double-buffered order DMA (r5): chunk i+1's order rows
        # are prefetched DURING step i, so the wait at step i+1 returns
        # ~immediately — the two serial DMA latencies that every chunk step
        # (including the ~80% that march zero windows) used to pay at its
        # start are hidden behind the previous step's work. Requires
        # in-order grid steps, which the orddma path already assumes
        # (PARSEM stays off — the scratch is shared across steps). The
        # last step's speculative prefetch (clamped to the last row — a
        # harmless refetch) is drained below so no DMA semaphore leaks
        # out of the kernel.
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def _start(row, s):
            pltpu.make_async_copy(ids_hbm.at[row], ids_s.at[s],
                                  tab_sem.at[s]).start()
            pltpu.make_async_copy(ents_hbm.at[row], ents_s.at[s],
                                  tab_sem.at[s]).start()

        def _wait(s):
            pltpu.make_async_copy(ids_hbm.at[0], ids_s.at[s],
                                  tab_sem.at[s]).wait()
            pltpu.make_async_copy(ents_hbm.at[0], ents_s.at[s],
                                  tab_sem.at[s]).wait()

        pl.when(i == 0)(lambda: _start(jnp.int32(0), slot))
        _start(jnp.minimum(i + 1, n_steps - 1), nxt)
        _wait(slot)
        # drain the last step's speculative prefetch (one full-latency wait
        # once per launch — the semaphore must not leak out of the kernel)
        pl.when(i == n_steps - 1)(lambda: _wait(nxt))

        def ids_at(j):
            return ids_s[slot, j // 128, j % 128]

        def ents_at(j):
            return ents_s[slot, j // 128, j % 128]
    if stream:
        # chunk i's march order -> SMEM (scalar reads in cond/body below)
        cp_i = pltpu.make_async_copy(ids_hbm.at[i], ids_s, tab_sem.at[0])
        cp_e = pltpu.make_async_copy(ents_hbm.at[i], ents_s, tab_sem.at[1])
        cp_i.start()
        cp_e.start()
        cp_i.wait()
        cp_e.wait()

        # order tables are rank-3 (n_chunks, M_pad//128, 128): slicing a
        # ROW of a rank-2 (n_chunks, M_pad) table is a dynamic size-1
        # slice of the sublane dim, which device Mosaic rejects once
        # M_pad spans >1 lane tile ("Slice shape along dimension 0 must
        # be aligned to tiling (8)"); a leading UNtiled dim makes the
        # per-chunk DMA a whole tiled block (the cols-table pattern)
        def ids_at(j):
            return ids_s[j // 128, j % 128]

        def ents_at(j):
            return ents_s[j // 128, j % 128]

        def issue_window(p):
            """Start the async fetch of window p's W cluster blocks into
            buffer slot p%2 (speculative past the stop point is safe: the
            caller pads 2W sentinel slots whose ids are 0 — a harmless
            re-fetch whose result is never read)."""
            slot = jax.lax.rem(p, 2)
            for w in range(wide):
                c = ids_at(wide * p + w)
                pltpu.make_async_copy(
                    cols_hbm.at[c], cols_buf.at[slot, w],
                    cols_sem.at[slot]).start()
                if with_rows:
                    pltpu.make_async_copy(
                        rows_hbm.at[c], rows_buf.at[slot, w],
                        rows_sem.at[slot]).start()

        def wait_window(p):
            slot = jax.lax.rem(p, 2)
            for w in range(wide):
                pltpu.make_async_copy(
                    cols_hbm.at[0], cols_buf.at[slot, w],
                    cols_sem.at[slot]).wait()
                if with_rows:
                    pltpu.make_async_copy(
                        rows_hbm.at[0], rows_buf.at[slot, w],
                        rows_sem.at[slot]).wait()
    elif not orddma:
        def ids_at(j):
            return ids_ref[i, j]

        def ents_at(j):
            return ents_ref[i, j]
    phi = phi_ref[:]
    a = a_ref[0, 0]
    gate = gate_ref[0, 0]
    n = phi.shape[0]
    if guard:
        od = od_ref[0]                 # (6, n): o xyz rows then d xyz
        inv_d = 1.0 / od[3:6]          # (3, n), +-inf where d == 0
        # live-lane mask for the guard: lanes with >= 1 touched cluster
        # have gate = (positive entry)*(1+1e-5)+1e-5 > 0; inactive and
        # cluster-less lanes sit at ~-BIG and must not force visits
        lane_live = gate > 0.0

    def lane_entry(c):
        """Conservative per-lane entry to cluster c (same arithmetic as
        the XLA _cull; BIG where the slab test misses)."""
        tn = jnp.full((n,), t_min, jnp.float32)
        tf = jnp.full((n,), BIG, jnp.float32)
        for ax in range(3):
            lo = (cbox_ref[c * 6 + ax] - od[ax]) * inv_d[ax]
            hi = (cbox_ref[c * 6 + 3 + ax] - od[ax]) * inv_d[ax]
            swap = inv_d[ax] < 0.0
            near = jnp.where(swap, hi, lo)
            far = jnp.where(swap, lo, hi)
            tn = jnp.where(near > tn, near, tn)
            tf = jnp.where(far < tf, far, tf)
        ent = tn - (_ENTRY_MARGIN * jnp.abs(tn) + 1e-6)
        return jnp.where(tf < tn, BIG, ent)

    # A genuine while_loop (single body instance) rather than a fori+cond
    # unroll: Mosaic unrolls static fori trip counts, and M copies of
    # matmul+epilogue made the kernel take minutes to compile. The cond
    # reads ents[j] for j in [0, M] — the caller pads slot M with +BIG so
    # the bounds probe is safe and the loop always terminates there.
    #
    # Per-lane stop gate: a lane stops needing clusters once the next entry
    # exceeds min(best-so-far, gate), where gate = the lane's OWN farthest
    # touched-cluster entry (beyond it, every cluster the lane touches has
    # already been processed — their chunk entries sort earlier). This
    # keeps miss lanes (t stays BIG) from dragging a mixed chunk through
    # the whole list.
    def sweep(x, blk):
        # fused6: phi/blk are the pre-expanded bf16 6-block operands —
        # ONE DEFAULT matmul computes HIGHEST's six bf16 passes
        # (tensor_sweep.fused6_dot; ulp-level summation-order diff only)
        return (tensor_sweep.fused6_dot(x, blk) if fused6
                else tensor_sweep.sweep_dot(x, blk, in_kernel=True))

    def _teff_by_type(wt, B, C0, D, E, valid, sph_fn):
        """Effective t over a (n, width) pair block, branching on the type
        scalar ``wt`` (0 mixed, 1 all-sphere, 2 all-triangle): pure blocks
        skip the unused epilogue half — every mesh cluster is all-triangle,
        and the sphere sqrt/two-root chain is the single most expensive
        part of the epilogue. Every branch composes the SAME _epilogue
        halves, so accepted t values are bit-identical whichever runs.
        ``sph_fn`` defers the sphere-mask load to the mixed branch only.
        The ONE shared implementation serves both the per-cluster visit
        (cluster_teff) and the grouped window — edit once.

        ``valid`` (and ``sph_fn``'s result) may be rank-1 ``(width,)``
        (per-slot path) or rank-2 ``(1, width)`` — the grouped window
        builds its masks by rank-2 lane-dim concat because Mosaic rejects
        rank-1 tpu.concatenate past the first 128-lane tile."""
        vrow = (valid if valid.ndim == 2 else valid[None, :]) != 0

        def t_mixed():
            return tensor_sweep._epilogue(B, C0, D, E, a, sph_fn() != 0,
                                          vrow, t_min, t_max)

        def t_sph_only():
            t_s, hit = tensor_sweep._epilogue_sphere(B, C0, a[:, None],
                                                     t_min, t_max)
            return jnp.where(hit & vrow, t_s, BIG)

        def t_tri_only():
            t_t, hit = tensor_sweep._epilogue_tri(B, C0, D, E, t_min,
                                                  t_max)
            return jnp.where(hit & vrow, t_t, BIG)

        return jax.lax.switch(wt, [t_mixed, t_sph_only, t_tri_only])

    def cluster_teff(c, S):
        """Per-cluster effective t (n, K) from the cluster's S block
        (n, OUTS*K), branching on the scalar-prefetched cluster type."""
        valid = valid_ref[pl.ds(c, 1), :, :][0, 0]
        return _teff_by_type(
            ctype_ref[c], S[:, 0:K], S[:, K:2 * K],
            S[:, 2 * K:3 * K], S[:, 3 * K:4 * K], valid,
            lambda: sph_ref[pl.ds(c, 1), :, :][0, 0])

    def cond(state):
        j, t_acc = state[0], state[1]
        return jnp.max(jnp.minimum(t_acc, gate)) > ents_at(j)

    # Wide visits (``wide`` = W > 1): iteration p sweeps clusters
    # Wp .. Wp+W-1 of the chunk's order as ONE concatenated matmul + ONE
    # fused rows-extraction — per-MXU-issue overhead (~1.5 us on this
    # chip, docs/DESIGN.md) is the dominant per-visit cost, and widening
    # divides the issues per cluster by W (measured +40% whole-render at
    # W=2). Bit-identical to the 1-wide march: output columns of a
    # concatenated matmul accumulate independently; the window argmin's
    # lowest-index tie rule equals the sequential strict-better rule;
    # sentinel slots (entry +BIG) are masked to BIG by scalar selects; and
    # any cluster the 1-wide march would have stopped before cannot beat
    # any lane (its margined per-lane entry is at or beyond every lane's
    # min(best, own-gate) — the stop proof in the module docstring applies
    # per lane).
    def make_window_fns(width, slot0):
        """cond/body/window_S for marching ``width``-wide windows over
        order slots [slot0, ...) — window p covers slots slot0 + width*p
        .. +width-1. ``width``/``slot0`` are static. The default march is
        make_window_fns(wide, 0) (bit-identical to the historic fixed
        body); the narrow-first variant additionally runs ONE
        (narrow, 0) window before a (wide, narrow) main loop — most live
        chunks stop within a few clusters, and a quarter-width first
        window spares them ~3/4 of the window's epilogue/rows/matmul
        lanes (sentinel padding was ~70% at W=16 x ~2.5 marched).
        Exact: windows partition the same ascending-entry order, and the
        stop proof (module docstring) is per-slot, not per-window."""

        def cond_w(state):
            p = state[0]
            if fixwin:
                # timing-decomposition mode (PT_CLUSTER_FIXWIN, images
                # wrong): every chunk marches exactly fixwin windows so
                # in-kernel knockouts (PT_CLUSTER_KNOCK) are comparable —
                # the real stop rule would react to garbage t values
                return p < fixwin
            t_acc = state[2] if pipe else state[1]
            return jnp.max(jnp.minimum(t_acc, gate)) > ents_at(
                slot0 + width * p)

        def window_S(p):
            """The window's concatenated sweep result (n, W*OUTS*K).

            Layouts: per-slot (default) concatenates whole cluster
            blocks, so S is [B C D E | B C D E | ...] per slot; *grouped*
            re-orders the rhs columns by output type at load time — tiny
            (FEAT, K) slice concats — so S arrives as
            [B_all | C_all | D_all | E_all] and the epilogue can run ONCE
            over the full (n, W*K) window (one instantiation per ctype
            branch instead of one lax.switch per slot), making kernel
            code size independent of W. Column values are untouched (a
            matmul's output columns are independent), only their order
            changes."""
            if stream:
                # blocks were DMA'd into this window's buffer slot (the
                # body waits the slot's semaphore before calling window_S)
                slotbuf = cols_buf[pl.ds(jax.lax.rem(p, 2), 1)][0]
                blks = [slotbuf[w] for w in range(width)]
                if grouped:
                    blk = jnp.concatenate(
                        [b[:, k * K:(k + 1) * K] for k in range(OUTS)
                         for b in blks], axis=1)
                else:
                    blk = jnp.concatenate(blks, axis=1)
                return sweep(phi, blk)
            if knock == "mmcat":
                # knockout: no block gather/concat, no matmul — a lane-dim
                # broadcast stands in for S (timing decomposition only)
                return jnp.broadcast_to(phi[:, 0:1].astype(jnp.float32),
                                        (n, width * OUTS * K))
            cs = [ids_at(slot0 + width * p + w) for w in range(width)]
            if split:
                # type-major table (OUTS*C_tot, FEAT, K): part k of
                # cluster c is a whole (FEAT, K) sublane-indexed block —
                # no sub-128 lane slicing even for K < 128
                blk = jnp.concatenate(
                    [cols_ref[pl.ds(k * C_tot + c, 1), :, :][0]
                     for k in range(OUTS) for c in cs], axis=1)
            elif grouped:
                blks = [cols_ref[pl.ds(c, 1), :, :][0] for c in cs]
                blk = jnp.concatenate(
                    [b[:, k * K:(k + 1) * K] for k in range(OUTS)
                     for b in blks], axis=1)
            else:
                blk = jnp.concatenate(
                    [cols_ref[pl.ds(c, 1), :, :][0] for c in cs], axis=1)
            if knock == "mm":
                # knockout: keep the block gather/concat (a VPU max reads
                # every element so nothing dead-codes), skip the matmul
                keep = jnp.max(blk.astype(jnp.float32), axis=0,
                               keepdims=True)
                return phi[:, 0:1].astype(jnp.float32) * keep
            return sweep(phi, blk)

        body_w = _make_window_body(width, slot0, window_S)
        return cond_w, body_w, window_S

    def _make_window_body(width, slot0, window_S):
      def body_w(state):
        if pipe:
            # software pipeline: this window's S rides the carry (issued
            # LAST iteration, overlapping the MXU matmul with that
            # iteration's VPU epilogue); issue the NEXT window's S at the
            # tail. The speculative fetch past the stop point reads
            # sentinel slots (2W of them) and its result is simply unused.
            p, S, t_acc, b_acc, r_acc = state
        else:
            p, t_acc, b_acc, r_acc = state
            if stream:
                # start the NEXT window's DMAs before waiting this one —
                # the fetch overlaps this window's matmul + epilogue
                issue_window(p + 1)
                wait_window(p)
            S = window_S(p)                           # (n, W*OUTS*K)
        cs = [ids_at(slot0 + width * p + w) for w in range(width)]
        if grouped:
            # one wide epilogue over the whole window (S is type-grouped,
            # see window_S). The window's ctype is decided from the live
            # slots' scalar-prefetched ctypes: all-tri / all-sph windows
            # take the pure branch — bit-identical accepted t either way
            # (the branches compose the same _epilogue halves) — so the
            # switch runs once per window, not once per slot. Sentinel
            # slots fold into the valid mask (their columns go BIG,
            # exactly like the per-slot where the v1 body applied).
            WK = width * K
            live = [ents_at(slot0 + width * p + w) < BIG * 0.5
                    for w in range(width)]
            # rank-2 (1, K) pieces on the lane dim: rank-1 concat past the
            # first tile is an unimplemented tpu.concatenate (measured on
            # the axon Mosaic backend at W=4)
            valid_all = jnp.concatenate(
                [jnp.where(live[w],
                           valid_ref[pl.ds(cs[w], 1), :, :][0], 0)
                 for w in range(width)], axis=1)      # (1, W*K)
            B, C0 = S[:, 0:WK], S[:, WK:2 * WK]
            D, E = S[:, 2 * WK:3 * WK], S[:, 3 * WK:4 * WK]
            nlive = live[0].astype(jnp.int32)
            tri_ct = (live[0] & (ctype_ref[cs[0]] == 2)).astype(jnp.int32)
            sph_ct = (live[0] & (ctype_ref[cs[0]] == 1)).astype(jnp.int32)
            for w in range(1, width):
                nlive += live[w].astype(jnp.int32)
                tri_ct += (live[w]
                           & (ctype_ref[cs[w]] == 2)).astype(jnp.int32)
                sph_ct += (live[w]
                           & (ctype_ref[cs[w]] == 1)).astype(jnp.int32)
            wt = jnp.where(tri_ct == nlive, 2,
                           jnp.where(sph_ct == nlive, 1, 0))
            if knock == "epi":
                # knockout: skip the epilogue (matmul + masks stay live)
                t_win = B + jnp.where(valid_all != 0, 0.0, BIG) \
                    + wt.astype(jnp.float32)
            else:
                t_win = _teff_by_type(
                    wt, B, C0, D, E, valid_all,
                    lambda: jnp.concatenate(
                        [sph_ref[pl.ds(cs[w], 1), :, :][0]
                         for w in range(width)], axis=1))  # (1, W*K)
        else:
            ts = []
            for w, c in enumerate(cs):
                t_w = cluster_teff(c, S[:, w * 4 * K:(w + 1) * 4 * K])
                if w > 0:                             # sentinel slots
                    live = ents_at(slot0 + width * p + w) < BIG * 0.5
                    t_w = jnp.where(live, t_w, BIG)
                ts.append(t_w)
            t_win = jnp.concatenate(ts, axis=1)       # (n, W*K)
        local_j = jnp.argmin(t_win, axis=1).astype(jnp.int32)
        local_t = jnp.min(t_win, axis=1)
        better = local_t < t_acc
        glob = cs[0] * K + local_j
        for w in range(1, width):
            glob = jnp.where(local_j >= w * K,
                             cs[w] * K + (local_j - w * K), glob)
        if with_rows and knock == "rows":
            # knockout: skip the winner-rows extraction (one-hot + 48xWK
            # matmul); keep local_j alive through glob above
            pass
        elif with_rows:
            def extract_rows(r_prev):
                oh_t = (jax.lax.broadcasted_iota(jnp.int32,
                                                 (width * K, n), 0)
                        == local_j[None, :]).astype(jnp.bfloat16)
                if stream:
                    rbuf = rows_buf[pl.ds(jax.lax.rem(p, 2), 1)][0]
                    blk48 = jnp.concatenate(
                        [rbuf[w] for w in range(width)], axis=1)
                else:
                    blk48 = jnp.concatenate(
                        [rows_ref[pl.ds(c, 1), :, :][0] for c in cs],
                        axis=1)                       # (48, W*K)
                new_rows = jax.lax.dot_general(
                    blk48, oh_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (48, n)
                return jnp.where(better[None, :], new_rows, r_prev)

            if _ROWS_COND:
                # Skip the whole extraction (one-hot build + 48xWK matmul
                # + select) when NO lane improved this window — common on
                # every window after a chunk's first (the march visits
                # clusters in ascending entry order, so most lanes lock
                # their winner early). Values are identical: with no
                # improved lane every select keeps r_prev. The cond is
                # per-window, like the stop check itself — unlike the
                # per-visit slab guard it wraps only the rows tail, so the
                # sweep matmul pipeline is untouched. DEFAULT-ON since
                # round 4: +12-14% whole-render same-process on the bunny
                # bench (376.3 -> 337.2 ms and 396.3 -> 348.3 ms in two
                # independent processes), image bit-identical on chip
                # (PT_CLUSTER_ROWSCOND=0 restores the unconditional form).
                r_acc = jax.lax.cond(jnp.any(better), extract_rows,
                                     lambda r_prev: r_prev, r_acc)
            else:
                r_acc = extract_rows(r_acc)
        out = (jnp.where(better, local_t, t_acc),
               jnp.where(better, glob, b_acc),
               r_acc)
        if pipe:
            return (p + 1, window_S(p + 1)) + out
        return (p + 1,) + out
      return body_w


    def body(state):
        j, t_acc, b_acc, r_acc = state
        c = ids_at(j)

        def visit(carry):
            t_acc, b_acc, r_acc = carry
            blk = cols_ref[pl.ds(c, 1), :, :][0]
            S = sweep(phi, blk)
            t_eff = cluster_teff(c, S)
            local_j = jnp.argmin(t_eff, axis=1).astype(jnp.int32)
            local_t = jnp.min(t_eff, axis=1)
            better = local_t < t_acc
            if with_rows:
                # emit the winner's hit-field row right here — a one-hot
                # contraction against the cluster's field block — so the
                # integrator never gathers scene rows per bounce (the
                # serialized TPU gather cost ~4 ms per 57.6k queries).
                # The block stores each f32 field as an exact 3-way bf16
                # split (ops/clusters.py); the hi/mid/lo components ride
                # the carry *unsummed* as one (48, n) block and are
                # folded into the f32 fields after the loop, so each
                # visit pays ONE DEFAULT-precision (48, K) @ (K, n)
                # matmul instead of three (16, K) ones — on chip the
                # extraction cost is per-matmul issue overhead (~0.5 us
                # each), not FLOPs. One-hot built already transposed,
                # (K, n): contracting the lane dim of an (n, K) one-hot
                # needs a Mosaic transpose.
                oh_t = (jax.lax.broadcasted_iota(jnp.int32, (K, n), 0)
                        == local_j[None, :]).astype(jnp.bfloat16)
                blk48 = rows_ref[pl.ds(c, 1), :, :][0]   # (48, K) bf16
                new_rows = jax.lax.dot_general(
                    blk48, oh_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (48, n)
                r_acc = jnp.where(better[None, :], new_rows, r_acc)
            return (jnp.where(better, local_t, t_acc),
                    jnp.where(better, c * K + local_j, b_acc),
                    r_acc)

        if guard:
            need = lane_live & (lane_entry(c) < t_acc)
            t_acc, b_acc, r_acc = jax.lax.cond(
                jnp.any(need), visit, lambda carry: carry,
                (t_acc, b_acc, r_acc))
        else:
            t_acc, b_acc, r_acc = visit((t_acc, b_acc, r_acc))
        return (j + 1, t_acc, b_acc, r_acc)

    t0 = jnp.full((n,), BIG, jnp.float32)
    b0 = jnp.full((n,), -1, jnp.int32)
    r0 = jnp.zeros((48 if with_rows else 16, n), jnp.float32)
    # main loop: wide windows over slots [narrow, ...); slot0 == 0 unless
    # the narrow-first window below handled the head. Built for every mode
    # — stream and pipe use the window machinery even at wide == 1.
    cond_wide, body_wide, window_S = make_window_fns(wide, narrow)
    # Narrow-first window (PT_CLUSTER_NARROW=W1, grouped wide march only):
    # ONE conditional width-W1 window over slots [0, W1) before the wide
    # loop — most live chunks stop within a few clusters, so their whole
    # march runs at W1*K lanes instead of wide*K (the r4 window-padding
    # finding: ~70% sentinel lanes at W=16 x ~2.5 marched clusters).
    # Exact: same ascending slot order, just partitioned differently.
    nsl0 = jnp.int32(0)
    if narrow:
        _, body_narrow, _ = make_window_fns(narrow, 0)
        marches_n = jnp.max(jnp.minimum(t0, gate)) > ents_at(0)

        def _run_narrow():
            _, t1, b1, r1 = body_narrow((jnp.int32(0), t0, b0, r0))
            return t1, b1, r1

        t0, b0, r0 = jax.lax.cond(marches_n, _run_narrow,
                                  lambda: (t0, b0, r0))
        nsl0 = jnp.where(marches_n, jnp.int32(narrow), 0)
    if pipe:
        # prime the pipeline: window 0's S, only when the chunk marches at
        # all (zero-visit chunks — all-sky / all-dead — must not pay a
        # speculative matmul; this cond runs once per chunk, not per visit)
        marches0 = jnp.max(jnp.minimum(t0, gate)) > ents_at(0)
        S0 = jax.lax.cond(
            marches0, lambda: window_S(jnp.int32(0)),
            lambda: jnp.zeros((n, wide * OUTS * K), jnp.float32))
        p_end, _, t_acc, b_acc, r_acc = jax.lax.while_loop(
            cond_wide, body_wide, (jnp.int32(0), S0, t0, b0, r0))
    elif stream:
        # prime window 0's DMAs only when the chunk marches at all, and
        # drain the one always-outstanding window after the loop (every
        # body issues p+1 and waits p, so exactly window p_end is in
        # flight at exit — its sentinel fetch must be waited or the DMA
        # semaphore leaks into the next grid step)
        marches0 = jnp.max(jnp.minimum(t0, gate)) > ents_at(0)
        pl.when(marches0)(lambda: issue_window(jnp.int32(0)))
        p_end, t_acc, b_acc, r_acc = jax.lax.while_loop(
            cond_wide, body_wide, (jnp.int32(0), t0, b0, r0))
        pl.when(marches0)(lambda: wait_window(p_end))
    else:
        p_end, t_acc, b_acc, r_acc = jax.lax.while_loop(
            cond_wide if wide > 1 else cond,
            body_wide if wide > 1 else body,
            (jnp.int32(0), t0, b0, r0))
    t_ref[0, 0] = t_acc
    best_ref[0, 0] = b_acc
    # order SLOTS marched (= loop windows x width + the narrow window's
    # slots) — the MFU/roofline accounting's executed-work counter
    # (bench.py): pair tests = slots x K x ray_tile. Broadcast to the
    # lane-wide block (a (1,1,1) i32 output block would sit below the
    # 128-lane tile).
    slots = p_end * jnp.int32(wide) + nsl0
    win_ref[0, 0] = jnp.full((n,), slots, jnp.int32)
    if with_rows:
        # fold the exact bf16 3-way split: (hi + mid) + lo, the same f32
        # addition order the per-visit variant used — bit-identical rows
        rows_out[0] = (r_acc[0:16] + r_acc[16:32]) + r_acc[32:48]


def cluster_march(ct: ClusterTables, o, d, t_min,
                  ray_tile: int = DEF_RAY_TILE,
                  sort_rays: bool = True,
                  with_rows: bool = False,
                  active=None,
                  extras=None,
                  guard: bool = None,
                  key2: bool = None,
                  t_max: float = None):
    """Single-pass culled closest-hit: (prim_idx, t, valid), each (R,).

    The march-in-kernel strategy (default): rays are optionally binned by
    one sort on nearest-cluster id, each 128-chunk gets its clusters in
    ascending entry-distance order, and one Pallas launch walks that order
    with early termination per chunk. Exactness: the walk only stops once
    every lane's best hit provably precedes all unvisited clusters; misses
    process exactly the clusters they touch. Same contract/result as
    :func:`cluster_closest` with far lower per-query overhead (no
    per-round sorts/culls/bitsets).

    ``active`` ((R,) bool, optional): lanes to query; inactive lanes are
    treated exactly like d == 0 lanes (resolve instantly as misses) but the
    *true* d is preserved in the sorted outputs — callers that keep the
    wavefront sorted need the last real direction for the sky lookup.

    ``extras`` (tuple of (R,) arrays, optional — requires ``with_rows`` and
    ``sort_rays`` and R % ray_tile == 0): the caller's per-ray state rides
    the binning sort and the call *stays in sorted order* (no unsort at
    all). Returns ``(idx, t, valid, rows, o_s, d_s, active_s, extras_s,
    pair_tests)`` — ``pair_tests`` is an f32 scalar counting executed
    (ray, prim-slot) sweep tests, the bench MFU numerator — everything in
    march order — the sorted-wavefront integrator mode
    (render/integrator.py): one sort per bounce carries the whole carry,
    replacing the per-query sort + 19-payload unsort, and the bounce's
    cluster binning doubles as dead-lane compaction (BASELINE's
    "sorted-ray compaction batches" north star).

    ``t_max`` (static float, default BIG): hits at or beyond it are
    rejected AND clusters entered beyond it are never marched (the per-lane
    gate is clamped to it). Shadow queries pass 1.0 — the NEE segment is
    unnormalized so the light sits at t == 1 for every ray — which both
    skips beyond-light geometry and stops the march early."""
    import os as _os
    if guard is None:
        guard = _os.environ.get("PT_CLUSTER_GUARD", "0") == "1"
    if key2 is None:
        key2 = _os.environ.get("PT_CLUSTER_KEY2", "1") != "0"
    # fused6 sweep (see tensor_sweep.fused6_dot): HIGHEST's six bf16 passes
    # as one pre-expanded DEFAULT matmul per visit. Values match HIGHEST to
    # f32 summation order (ulp); resolved to default-ON below once the
    # composition flags are known.
    fused6_env = _os.environ.get("PT_SWEEP_FUSED6", "")
    fused6 = fused6_env == "1"
    # wide visits: W clusters per march iteration, ONE sweep matmul + ONE
    # rows extraction per window (bit-identical; see _march_kernel).
    # Measured on chip (bunny bench): W=2 per-slot 12.87, W=4 grouped
    # 16.74, W=8 grouped 19.12/19.00 Mrays/s (round-3 queue) — W=8
    # grouped is the production default. W*K lanes above 1024 abort at
    # the 16 MB scoped-VMEM budget (W=16 resident and W=8 x K=256 both
    # hit ~18.5M); PT_CLUSTER_VMEM_MB raises the budget for experiments.
    # The guard path keeps the 1-wide body (guard is default-off).
    # W default scales with K to keep 1024-lane windows (the measured
    # sweet spot: wider aborts at the scoped-VMEM budget for K=128, and
    # K=64 x W=16 beats K=128 x W=8 by +15% — finer culling at equal
    # window lanes; K=64 x W=32 is at parity with W=16, r4 queue)
    wide = int(_os.environ.get("PT_CLUSTER_WIDE",
                               "16" if ct.K < 128 else "8"))
    if guard:
        wide = 1
    # software-pipelined march (wide > 1 only): the carry holds the next
    # window's sweep result so the MXU matmul overlaps the VPU epilogue
    pipe = (_os.environ.get("PT_CLUSTER_PIPE", "0") == "1") and wide > 1
    # type-grouped window layout (wide > 1 only): rhs columns re-grouped
    # by output type at load time so ONE epilogue instantiation covers the
    # whole window — kernel code size (and Mosaic compile time) becomes
    # independent of W, unlocking W >= 4 (the per-slot body's 3W epilogue
    # instantiations hit a >10-min compile wall at W=4; docs/DESIGN.md).
    # Default-on: required by the default W=8 (bit-identical to per-slot
    # at every W — test_cluster), and neutral at W=2 (12.872 vs 12.87
    # measured).
    grouped = (_os.environ.get("PT_CLUSTER_GROUPED", "1") == "1"
               and wide > 1)
    # split-table windows (grouped only): the cols table is re-laid out
    # type-major as (OUTS*C_tot, FEAT, K) so each window part is a whole
    # sublane-indexed (FEAT, K) block — the enabler for small clusters
    # (K < 128 cuts pair tests per ray; the window still sweeps
    # wide*K >= 128 lanes densely)
    split = (_os.environ.get("PT_CLUSTER_SPLIT",
                             "1" if ct.K % 128 else "0") == "1") and grouped
    # streamed-table march (PT_CLUSTER_STREAM=1): cluster cols/rows stay
    # in HBM and only *visited* clusters are DMA'd into a double-buffered
    # VMEM scratch — lifts the ~65k-prim VMEM capacity wall (and the
    # n_chunks x C_reg SMEM prefetch-table wall) to HBM scale while
    # keeping DMA traffic proportional to clusters marched. Exact same
    # results as the resident march (the blocks are byte-identical).
    resident_budget = (float(_os.environ.get("PT_CLUSTER_RESIDENT_MB",
                                             "12")) * 1024 * 1024)
    stream_env = _os.environ.get("PT_CLUSTER_STREAM", "auto")
    if stream_env in ("auto", ""):
        # Resident-vs-streamed AUTO rule (VERDICT r3 #5): keep the cluster
        # tables VMEM-resident while they fit a conservative budget, spill
        # to the HBM-streamed march above it. Measured: resident and
        # streamed are at parity at bench scale (12.65 vs 12.54 Mrays/s
        # r3), so the rule only needs to be safe, not precise. The
        # budget excludes the fused6 expansion (computed below) — a scene
        # whose fused6 tables overflow falls back to the 6-pass resident
        # sweep before it falls to streaming.
        c_tot_est = ct.cols.shape[0]
        per_cluster = (ct.cols.shape[1] * ct.cols.shape[2] * 4   # cols f32
                       + (48 * ct.K * 2 if with_rows else 0)     # rows bf16
                       + 2 * ct.K * 4)                           # masks
        stream = c_tot_est * per_cluster > resident_budget
    else:
        stream = stream_env == "1"
    # fused6 DEFAULT-ON since round 4 (PT_SWEEP_PRECISION defaults to
    # "fused6", tensor_sweep.sweep_mode): validated per-scene against a
    # float64 oracle (tools/sweep_validate.py — winner flips <= 5e-5 with
    # NO p99 t-error inflation on test/triangle/random/bunny, i.e. exactly
    # HIGHEST's own razor-edge tie behavior; bf16x3 by contrast FAILS
    # triangle/bunny) and measured +12% whole-render on chip (402 -> 367 ms
    # bunny bench, r4 A/B). The production shape (grouped wide windows,
    # resident tables) PRE-expands the operands once per query — 3x the
    # resident cols VMEM, no per-visit expansion; every other shape
    # (stream/split/guard/pipe) gets the identical arithmetic via
    # sweep_dot's on-the-fly fused6 expansion, so cross-variant
    # bit-identity holds either way. PT_SWEEP_FUSED6=0 forces the
    # pre-expanded route off (sweep_dot still follows PT_SWEEP_PRECISION).
    # ... and only while the 3x-expanded table still fits the resident
    # budget — a mid-size scene falls back to the 6-pass resident sweep
    # before it falls to streaming (resident-highest beats streamed at
    # parity-scale, r3 table).
    fused6_bytes = ct.cols.shape[0] * (
        6 * FEAT * ct.cols.shape[2] * 2
        + (48 * ct.K * 2 if with_rows else 0) + 2 * ct.K * 4)
    if (fused6_env == "" and grouped
            and not (stream or split or guard or pipe)
            and fused6_bytes <= resident_budget
            and tensor_sweep.sweep_mode() == "fused6"):
        fused6 = True
    if stream and (guard or pipe or split or fused6):
        raise ValueError("PT_CLUSTER_STREAM composes with wide/grouped "
                         "only (not guard/pipe/split/fused6)")
    if ct.K % 128 != 0:
        if not (grouped and split):
            raise ValueError("K < 128 cluster tables need the grouped "
                             "split-table march (PT_CLUSTER_GROUPED=1 "
                             "PT_CLUSTER_SPLIT=1, PT_CLUSTER_WIDE > 1)")
        if (wide * ct.K) % 128 != 0:
            raise ValueError("wide * K must be a multiple of 128 lanes")
    if t_max is None:
        t_max = BIG
    # timing knockouts (tools/tpu_knockout.py — images are WRONG under
    # either): PT_CLUSTER_STUB=kernel skips the march pallas_call
    # entirely; =gate forces every lane's stop gate to -BIG so the kernel
    # launches, DMAs its tables, and immediately exits each chunk's while
    # loop — the difference isolates per-visit cost from launch+DMA cost
    stub_kernel = _os.environ.get("PT_CLUSTER_STUB") == "kernel"
    stub_gate = _os.environ.get("PT_CLUSTER_STUB") == "gate"
    r = o.shape[0]
    C_reg = ct.C_reg
    r_pad = -(-r // ray_tile) * ray_tile
    n_chunks = r_pad // ray_tile
    keep_sorted = extras is not None
    if keep_sorted:
        # sort_rays=False is legal here: extras pass through untouched and
        # the wavefront keeps its incoming order (the PT_SORT_ONCE
        # integrator mode re-bins on the camera bounce only)
        assert with_rows and r_pad == r, (
            "extras mode needs with_rows and chunk-aligned R")

    if r_pad != r:
        o = jnp.pad(o, ((0, r_pad - r), (0, 0)))
        d = jnp.pad(d, ((0, r_pad - r), (0, 0)))
        if active is not None:
            active = jnp.pad(active, (0, r_pad - r))

    if active is None:
        active = jnp.any(d != 0.0, axis=1)
    else:
        active = active & jnp.any(d != 0.0, axis=1)
    active0 = active  # caller order — masks dead-ray pseudo-hits below
    t_min = float(t_min)
    rid = jnp.arange(r_pad, dtype=jnp.int32)

    # Supercluster cull (PT_CLUSTER_SUPER=G > 1): the XLA cull is dense
    # O(R x C) — fine while C is tiny, ~2 ms/query at 200k prims
    # (C=1563). Grouping G morton-consecutive clusters under a union AABB
    # culls/bins/orders at C/G granularity (G x cheaper cull + binning
    # sort key), then each visited supercluster expands to its G member
    # clusters for the march — which the existing wide-window kernel
    # sweeps as ordinary window slots. Exact: a supercluster's entry
    # lower-bounds every member's entry, expanded entries stay
    # non-decreasing, and the per-lane gate argument holds at
    # supercluster granularity (beyond the lane's farthest touched
    # supercluster entry, every supercluster it touches has been
    # processed). Members of a partial trailing group pad by duplicating
    # the last cluster — a duplicate window slot can never beat the
    # first instance. Visit ORDER within a supercluster is id order (not
    # per-cluster entry order), so exact-tie winners may differ from
    # sup=1 (measure zero); t values agree to the usual contract.
    # Two-level cull ("cull2", PT_CLUSTER_CULL2=auto|1|0) — the
    # HBM-scale hierarchical cull (VERDICT r4 #3): the dense per-ray cull
    # is an O(R x C_reg) intermediate (2.3 GB at 1.27M prims), and the
    # flat supercluster workaround (members inherit their group's entry)
    # loosens the stop rule to ~240 marched clusters/ray. cull2 instead
    # (a) per-ray culls at SUPER granularity only (bin key from super
    # entries; per-lane stop gate from super EXITS — any remaining hit
    # lies inside a touched super's [entry, exit], see _cull_T), and
    # (b) orders members per CHUNK by the interval-arithmetic bundle
    # cull (_chunk_interval_cull) — member-granularity ascending entries
    # with an O(n_chunks x C_reg) footprint. The march kernel is
    # unchanged. Auto-enables above PT_CLUSTER_CULL2_C clusters (default
    # 2048) so the 10^6-prim path needs no env knob (VERDICT weak #4).
    sup_env = _os.environ.get("PT_CLUSTER_SUPER", "")
    cull2_env = _os.environ.get("PT_CLUSTER_CULL2", "auto")
    if cull2_env in ("auto", ""):
        cull2 = C_reg >= int(_os.environ.get("PT_CLUSTER_CULL2_C",
                                             "2048"))
    else:
        cull2 = cull2_env == "1"
    if cull2:
        # super grouping sized so the dense per-ray super cull stays
        # ~O(R x 512); explicit PT_CLUSTER_SUPER overrides (tests force
        # tiny groups to exercise the path at toy scale)
        sup = int(sup_env) if sup_env else max(1, -(-C_reg // 512))
    else:
        sup = int(sup_env) if sup_env else 1
    if sup > 1:
        pad = -(-C_reg // sup) * sup - C_reg
        cull_min = jnp.concatenate(
            [ct.cmin, jnp.full((pad, 3), BIG, jnp.float32)]
        ).reshape(-1, sup, 3).min(axis=1)
        cull_max = jnp.concatenate(
            [ct.cmax, jnp.full((pad, 3), -BIG, jnp.float32)]
        ).reshape(-1, sup, 3).max(axis=1)
        C_cull = cull_min.shape[0]
    else:
        cull_min, cull_max, C_cull = ct.cmin, ct.cmax, C_reg

    entry = _cull_T(o, d, active, cull_min, cull_max, t_min,
                    with_exit=cull2 and not sort_rays)
    exit_ = None
    n_live_chunks = None
    if cull2 and not sort_rays:
        entry, exit_ = entry
    if sort_rays:
        # two-level bin key (nearest touched cluster, last touched
        # cluster): rays sharing the nearest cluster but spanning
        # different depth ranges stop dragging each other through their
        # union (measured ~15% fewer marched clusters on bounce
        # wavefronts). Untouched (and dead) lanes sort strictly last.
        touched = entry < BIG * 0.5
        kmin = jnp.argmin(entry, axis=0).astype(jnp.int32)
        any_t = jnp.any(touched, axis=0)
        # live-prefix length for the grid ladder (see PT_CLUSTER_LIVEGRID):
        # after this sort, touched lanes occupy positions [0, sum(any_t))
        n_live_chunks = (jnp.sum(any_t.astype(jnp.int32))
                         + ray_tile - 1) // ray_tile
        if key2:
            klast = (C_cull - 1 - jnp.argmax(touched[::-1, :], axis=0)
                     .astype(jnp.int32))
            key = jnp.where(any_t,
                            kmin * (C_cull + 1) + klast,
                            jnp.int32(C_cull * (C_cull + 2)))
        else:
            key = jnp.where(any_t, kmin, jnp.int32(C_cull))
        # keep_sorted callers never unsort here (their extras carry the
        # persistent ray id), so the march-internal rid payload is dropped
        n_extra = len(extras) if keep_sorted else 0
        base = [key, o[:, 0], o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2],
                active.astype(jnp.int32)]
        ops = jax.lax.sort(
            base + ([jnp.asarray(e) for e in extras] if keep_sorted
                    else [rid]),
            num_keys=1)
        o = jnp.stack(ops[1:4], axis=1)
        d = jnp.stack(ops[4:7], axis=1)
        active = ops[7] != 0
        if keep_sorted:
            extras = tuple(ops[8:8 + n_extra])
        else:
            rid = ops[8]
        entry = _cull_T(o, d, active, cull_min, cull_max, t_min,
                        with_exit=cull2)
        if cull2:
            entry, exit_ = entry

    d_eff = jnp.where(active[:, None], d, 0.0)
    phi = ray_features(o, d_eff)
    a = vec.dot(d_eff, d_eff)
    a = jnp.where(a == 0.0, 1.0, a)
    # per-lane stop gate: the lane's farthest touched-cluster entry (cull2:
    # farthest touched-SUPER exit — any remaining hit lies within a touched
    # super's [entry, exit] interval, so beyond the farthest exit nothing
    # remains; exits are only ever inflated, keeping the stop conservative).
    # The nudge keeps the gate strictly above the entry it equals (its own
    # last cluster must still process). Lanes touching no regular cluster
    # (and inactive lanes) gate at -BIG — the residual tile is handled
    # outside the kernel (below), so such lanes drive zero march iterations.
    if cull2:
        gate = jnp.max(jnp.where(entry >= BIG * 0.5, -BIG, exit_), axis=0)
    else:
        gate = jnp.max(jnp.where(entry >= BIG * 0.5, -BIG, entry), axis=0)
    gate = gate * (1.0 + 1e-5) + 1e-5
    if t_max < BIG * 0.5:
        # clusters entered at or beyond t_max cannot yield accepted hits
        # (the epilogue rejects t >= t_max) — stop the march there
        gate = jnp.minimum(gate, jnp.float32(t_max))
    gate = jnp.where(active, gate, -BIG)
    if stub_gate:
        gate = jnp.minimum(gate, -BIG)

    # per-chunk ascending cluster order by entry distance
    if cull2:
        # member-granularity order: the interval bundle cull refines each
        # member's entry, COMBINED (max — both are lower bounds) with its
        # super's per-ray chunk entry. The combine is load-bearing for
        # incoherent bounce chunks, where direction intervals span zero
        # and the bundle cull alone degenerates to t_min for everything
        # (measured 4.5x the pair tests of the flat SUPER=16 cull before
        # the combine): members of supers NO lane touches inherit BIG and
        # prune outright, members of touched supers at least inherit the
        # flat cull's ordering, and coherent chunks get the full interval
        # refinement on top.
        ivl_entry = _chunk_interval_cull(o, d, active, ct.cmin, ct.cmax,
                                         t_min, n_chunks, ray_tile)
        sup_chunk = entry.reshape(C_cull, n_chunks,
                                  ray_tile).min(axis=2).T  # (n_chunks, Cs)
        sup_m = jnp.repeat(sup_chunk, sup, axis=1)[:, :C_reg]
        chunk_entry = jnp.maximum(ivl_entry, sup_m)
        iota = jnp.broadcast_to(jnp.arange(C_reg, dtype=jnp.int32),
                                (n_chunks, C_reg))
        ents_sorted, ids_sorted = jax.lax.sort_key_val(chunk_entry, iota,
                                                       dimension=1)
    else:
        chunk_entry = entry.reshape(C_cull, n_chunks,
                                    ray_tile).min(axis=2).T
        iota = jnp.broadcast_to(jnp.arange(C_cull, dtype=jnp.int32),
                                (n_chunks, C_cull))
        ents_sorted, ids_sorted = jax.lax.sort_key_val(chunk_entry, iota,
                                                       dimension=1)
    if sup > 1 and not cull2:
        # expand each supercluster slot to its G member clusters (id
        # order), every member inheriting the supercluster entry (a valid
        # lower bound); trailing-group padding duplicates the last cluster
        ids_sorted = jnp.minimum(
            ids_sorted[:, :, None] * sup
            + jnp.arange(sup, dtype=jnp.int32)[None, None, :],
            C_reg - 1).reshape(n_chunks, -1)
        ents_sorted = jnp.repeat(ents_sorted, sup, axis=1)
    # terminal sentinel entries +BIG: the while cond max(t_best) > ents[j]
    # is false there (t_best <= BIG), guaranteeing termination at j == M.
    # Wide marches read slots Wp .. Wp+W-1, so they carry W sentinel slots
    # (the last live window may straddle M-1; the probe at the following
    # window then reads up to slot M+W-1). The pipelined march
    # speculatively fetches one window further: 2W sentinels.
    n_sent = 2 * wide if (pipe or stream) else wide
    ids = jnp.concatenate(
        [ids_sorted, jnp.zeros((n_chunks, n_sent), jnp.int32)], axis=1)
    ents = jnp.concatenate(
        [ents_sorted, jnp.full((n_chunks, n_sent), BIG, jnp.float32)],
        axis=1)
    M = ids_sorted.shape[1]
    K = ct.K

    # ---- residual tile in XLA, not in the march --------------------------
    # The huge prims (backdrop spheres) concern EVERY ray, so their sweep
    # runs once per query here rather than as an in-kernel visit per chunk
    # (previously ~28% of all visits; backdrop-only chunks now march zero
    # clusters). It is *skinny and transposed*: huge prims sort to the very
    # END of the residual tile (ops/clusters.py clamps their count to
    # K_RES = 8), so only the last K_RES columns are tested, as a
    # (OUTS*K_RES, FEAT) @ (FEAT, R) matmul + (K_RES, R) epilogue with rays
    # on the lane dim — a (R, K_RES) orientation would pad 8 -> 128 lanes
    # (16x wasted VPU work), and the old full-width sweep paid the whole
    # (R, K) epilogue for <= 8 real prims. Same sweep_dot/_epilogue-half
    # arithmetic => per-prim t bit-identical; argmin tie order among the
    # kept prims is preserved. Merge semantics below reproduce the old
    # residual-first visit order: a cluster hit must beat the residual
    # strictly.
    phi_T = jnp.stack([
        d_eff[:, 0], d_eff[:, 1], d_eff[:, 2],
        o[:, 0], o[:, 1], o[:, 2],
        o[:, 1] * d_eff[:, 2] - o[:, 2] * d_eff[:, 1],
        o[:, 2] * d_eff[:, 0] - o[:, 0] * d_eff[:, 2],
        o[:, 0] * d_eff[:, 1] - o[:, 1] * d_eff[:, 0],
        vec.dot(o, d_eff), vec.dot(o, o),
        jnp.ones((r_pad,), jnp.float32)], axis=0)        # (FEAT, R)
    colsK = ct.cols[C_reg]                               # (FEAT, OUTS*K)
    res_cols = jnp.concatenate(
        [colsK[:, k * K + K - K_RES: (k + 1) * K] for k in range(OUTS)],
        axis=1).T                                        # (OUTS*K_RES, FEAT)
    S_res = tensor_sweep.sweep_dot(res_cols, phi_T)      # (OUTS*K_RES, R)
    t_eff_res = tensor_sweep._epilogue_T(
        S_res[0:K_RES], S_res[K_RES:2 * K_RES],
        S_res[2 * K_RES:3 * K_RES], S_res[3 * K_RES:4 * K_RES], a,
        ct.is_sphere[C_reg, 0, K - K_RES:] != 0,
        ct.valid_row[C_reg, 0, K - K_RES:] != 0, t_min, float(t_max))
    j_res = jnp.argmin(t_eff_res, axis=0).astype(jnp.int32)
    t_res = jnp.min(t_eff_res, axis=0)
    b_res = jnp.where(t_res < BIG * 0.5,
                      C_reg * K + (K - K_RES) + j_res, -1)

    C_tot = ct.cols.shape[0]
    a3 = a.reshape(n_chunks, 1, ray_tile)
    gate3 = gate.reshape(n_chunks, 1, ray_tile)
    # timing-decomposition knobs (tools/tpu_window_parts.py — images are
    # WRONG under either): PT_CLUSTER_KNOCK skips one stage of the grouped
    # window body (mm / mmcat / epi / rows); PT_CLUSTER_FIXWIN=N makes
    # every chunk march exactly N windows so knocked variants stay
    # comparable (the real stop rule would react to garbage t values)
    knock = _os.environ.get("PT_CLUSTER_KNOCK", "")
    fixwin = int(_os.environ.get("PT_CLUSTER_FIXWIN", "0"))
    if fixwin:
        fixwin = max(1, min(fixwin, M // max(wide, 1)))
    # HBM order rows for the RESIDENT march (PT_CLUSTER_ORDDMA,
    # DEFAULT-ON since round 4): the scalar-prefetch ids/ents tables live
    # in SMEM, are re-uploaded per launch (n_chunks x (M + sentinels) x
    # 8 B), and abort the axon remote compile around ~1.25 MB (chunk
    # 230,400 at bunny scale). With ORDDMA the order tables are HBM
    # rank-3 blocks and each chunk DMAs its own rows into SMEM scratch at
    # chunk start — the streamed march's order pattern with the cols
    # still VMEM-resident. Measured: bit-identical images and a
    # DETERMINISTIC 357.7-360 ms bunny bench across four processes, where
    # the scalar-prefetch program is bimodal per process (335 or 390+ ms,
    # tunnel-state dependent) — the flip trades ~6% off the lucky mode
    # for eliminating the 17% slow tail (docs/DESIGN.md wave 3).
    # PT_CLUSTER_ORDDMA=0 restores scalar prefetch.
    orddma = (not stream and not guard
              and _os.environ.get("PT_CLUSTER_ORDDMA", "1") != "0")
    # PT_CLUSTER_ORDDMA2=1: cross-step double-buffered order DMA —
    # measured NEGATIVE on chip (403.1 vs 353.5 ms same-process, r5): the
    # speculative prefetch + per-slot semaphores evidently break Mosaic's
    # own step overlapping rather than extend it, the same lesson as the
    # per-visit slab guard ("predictable streaming beats work-skipping
    # when the skipped work rode a pipelined DMA", DESIGN.md). Default
    # stays the r4 single-buffered form; the knob remains for future
    # Mosaic versions.
    orddma2 = _os.environ.get("PT_CLUSTER_ORDDMA2", "0") == "1"
    # narrow-first window (PT_CLUSTER_NARROW=W1): one conditional
    # W1-wide window over slots [0, W1) before the wide loop — grouped
    # wide marches only; W1*K must stay 128-lane aligned. Measured
    # NEGATIVE on chip (r5): W=16+narrow fails the axon device compile
    # outright (HTTP 500 — per-kernel code size), and W=8+NARROW=2 runs
    # 1969.6 ms vs 363.7 same-process (~5.4x SLOWER, image
    # bit-identical) — the head window's lax.cond stalls Mosaic's block
    # pipeline exactly like the r2 per-visit slab guard did. Kept
    # env-gated as infrastructure; default permanently 0.
    # Live-chunk grid ladder (PT_CLUSTER_LIVEGRID=1, sorted queries
    # only): precompile the march at prefix grid sizes (n, n/2, n/4,
    # n/8) and lax.switch on the live-chunk count — dead chunks past the
    # sorted live prefix stop paying the per-grid-step fixed cost
    # altogether (they marched zero windows anyway).
    livegrid = (_os.environ.get("PT_CLUSTER_LIVEGRID", "0") == "1"
                and sort_rays and not stub_kernel)
    ladder = None
    if livegrid and n_live_chunks is not None:
        ladder = [n_chunks]
        for _div in (2, 4, 8):
            _s = max(1, -(-n_chunks // _div))
            if _s < ladder[-1]:
                ladder.append(_s)
        if len(ladder) == 1:
            ladder = None
    narrow = int(_os.environ.get("PT_CLUSTER_NARROW", "0"))
    if narrow and not (wide > 1 and grouped and not pipe and not stream
                       and not guard and not fixwin and not stub_gate
                       and 0 < narrow < wide
                       and (narrow * K) % 128 == 0):
        narrow = 0
    kernel = functools.partial(_march_kernel, K=K, M=M, t_min=t_min,
                               t_max=float(t_max), with_rows=with_rows,
                               guard=guard, fused6=fused6, wide=wide,
                               pipe=pipe, grouped=grouped, split=split,
                               C_tot=C_tot, stream=stream, knock=knock,
                               fixwin=fixwin, orddma=orddma,
                               narrow=narrow, orddma2=orddma2,
                               rows_cond=_os.environ.get(
                                   "PT_CLUSTER_ROWSCOND", "1") == "1")
    n_pref = 1 if (stream or orddma) else (4 if guard else 3)
    feat_in = 6 * FEAT if fused6 else FEAT
    phi_in = tensor_sweep.expand6_lhs(phi) if fused6 else phi
    if split:
        # type-major re-layout (XLA, once per query — the table is a jit
        # constant in practice): output k of cluster c at row k*C_tot + c
        cols_base = (ct.cols.reshape(C_tot, FEAT, OUTS, K)
                     .transpose(2, 0, 1, 3).reshape(OUTS * C_tot, FEAT, K))
    else:
        cols_base = ct.cols
    cols_in = (tensor_sweep.expand6_rhs(cols_base, axis=1) if fused6
               else cols_base)
    if stream and feat_in % 8:
        # Device Mosaic DMA slices need 8-aligned sublane extents ("Slice
        # shape along dimension 1 must be aligned to tiling (8), but is
        # 12") — pad the cols FEAT dim 12 -> 16 with zero rows and phi's
        # contraction dim to match: the extra sweep-matmul terms are
        # 0 * 0, so results are exact. (fused6 is excluded from stream.)
        feat_st = -(-feat_in // 8) * 8
        cols_in = jnp.concatenate(
            [cols_in, jnp.zeros((cols_in.shape[0], feat_st - feat_in,
                                 cols_in.shape[2]), cols_in.dtype)], axis=1)
        phi_in = jnp.concatenate(
            [phi_in, jnp.zeros((phi_in.shape[0], feat_st - feat_in),
                               phi_in.dtype)], axis=1)
        feat_in = feat_st

    def blk(shape, index=None):
        if index is None:
            return pl.BlockSpec(shape, lambda i, *_: (i,) + (0,) * (
                len(shape) - 1))
        return pl.BlockSpec(shape, lambda i, *_: index)

    out_specs = [blk((1, 1, ray_tile)), blk((1, 1, ray_tile))]
    if with_rows:
        out_specs.append(blk((1, 16, ray_tile)))
    else:
        # dummy single-block output so the kernel signature is uniform
        out_specs.append(blk((1, 16, ray_tile), (0, 0, 0)))
    # per-chunk windows-marched counter (MFU accounting)
    out_specs.append(blk((1, 1, ray_tile)))

    def _mk_out_shape(g):
        """Output buffers for a g-step grid (the live-chunk ladder reruns
        the same kernel on prefix grids; block specs are size-free)."""
        return [
            jax.ShapeDtypeStruct((g, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, ray_tile), jnp.int32),
            jax.ShapeDtypeStruct((g if with_rows else 1, 16, ray_tile),
                                 jnp.float32),
            jax.ShapeDtypeStruct((g, 1, ray_tile), jnp.int32),
        ]

    out_shape = _mk_out_shape(n_chunks)
    in_specs = [
        blk((ray_tile, feat_in)),
        blk((1, 1, ray_tile)),
        blk((1, 1, ray_tile)),
    ]
    operands = [phi_in, a3, gate3]
    if guard:
        # per-visit slab-guard inputs: rays as (chunk, [o;d], lane) blocks
        # and the cluster AABB corners as one flat scalar-prefetch array
        # [min xyz, max xyz] per cluster (cheap SMEM scalars in-kernel)
        od3 = (jnp.concatenate([o, d], axis=1).T
               .reshape(6, n_chunks, ray_tile).transpose(1, 0, 2))
        in_specs.append(blk((1, 6, ray_tile)))
        operands.append(od3)
    if stream or orddma:
        # Device Mosaic requires per-row DMA slices to be whole 128-lane
        # tiles ("Slice shape along dimension 1 must be aligned to tiling
        # (128)"), so pad the order tables' minor dim up to 128: extra ids
        # are 0 (the harmless sentinel-refetch pattern) and extra entries
        # +BIG (never marched — the cond stops at the first +BIG slot).
        # The tables are then shaped rank-3 (n_chunks, M_pad//128, 128):
        # a rank-2 (n_chunks, M_pad) row slice is a dynamic size-1 slice
        # of the SUBLANE dim, which device Mosaic rejects once M_pad
        # spans more than one lane tile ("Slice shape along dimension 0
        # must be aligned to tiling (8)" — hit at C_reg >= 129, e.g. the
        # 20k-prim scaling scenes); with an untiled leading dim the
        # per-chunk DMA is a whole tiled block (the cols-table pattern).
        # Pad to whole 8x128 SUBLANE TILES, not just 128 lanes: the
        # streamed march FAULTED the TPU worker at runtime for every
        # scene above bunny scale (bisected at 79k prims, r4; the kernel
        # had only ever run on chip with a single 128-slot order row) —
        # the suspected cause is the (M_pad//128, 128) per-chunk order
        # DMA crossing sublane tiles unaligned once M_pad//128 > 1.
        M_pad = -(-(M + n_sent) // 1024) * 1024
        extra = M_pad - (M + n_sent)
        ids_st = jnp.concatenate(
            [ids, jnp.zeros((n_chunks, extra), jnp.int32)],
            axis=1).reshape(n_chunks, M_pad // 128, 128)
        ents_st = jnp.concatenate(
            [ents, jnp.full((n_chunks, extra), BIG, jnp.float32)],
            axis=1).reshape(n_chunks, M_pad // 128, 128)
        if orddma and orddma2:
            # double-buffered across grid steps (slot = chunk % 2): chunk
            # i+1's rows prefetch during step i (see _march_kernel)
            ord_scratch = [
                pltpu.SMEM((2, M_pad // 128, 128), jnp.int32),    # ids_s
                pltpu.SMEM((2, M_pad // 128, 128), jnp.float32),  # ents_s
                pltpu.SemaphoreType.DMA((2,)),        # tab_sem (per slot)
            ]
        else:
            ord_scratch = [
                pltpu.SMEM((M_pad // 128, 128), jnp.int32),   # ids_s
                pltpu.SMEM((M_pad // 128, 128), jnp.float32),  # ents_s
                pltpu.SemaphoreType.DMA((2,)),            # tab_sem
            ]
    if stream:
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        # ids/ents rows + the big tables stay in HBM; the kernel DMAs
        # chunk i's order rows into SMEM scratch and visited clusters
        # into a double-buffered VMEM scratch (see _march_kernel)
        in_specs = [any_spec, any_spec] + in_specs + [
            any_spec,                                 # cols
            blk((C_tot, 1, K), (0, 0, 0)),            # is_sphere
            blk((C_tot, 1, K), (0, 0, 0)),            # valid_row
            (any_spec if with_rows
             else blk((1, 48, K), (0, 0, 0))),        # rows
        ]
        operands = [ids_st, ents_st] + operands + [
            cols_in, ct.is_sphere, ct.valid_row,
            ct.rows if with_rows else ct.rows[:1]]
        scratch_shapes = ord_scratch + [
            pltpu.VMEM((2, wide, feat_in, OUTS * K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),            # cols_sem
        ]
        if with_rows:
            scratch_shapes += [
                pltpu.VMEM((2, wide, 48, K), ct.rows.dtype),
                pltpu.SemaphoreType.DMA((2,)),        # rows_sem
            ]
        scratch_kw = dict(scratch_shapes=scratch_shapes)
        prefetch = [ct.ctype]
    elif orddma:
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        # order rows in HBM (per-chunk SMEM-scratch DMA), cluster tables
        # VMEM-resident exactly like the default march
        in_specs = [any_spec, any_spec] + in_specs + [
            blk((OUTS * C_tot, feat_in, K) if split
                else (C_tot, feat_in, OUTS * K), (0, 0, 0)),
            blk((C_tot, 1, K), (0, 0, 0)),
            blk((C_tot, 1, K), (0, 0, 0)),
            blk((C_tot if with_rows else 1, 48, K), (0, 0, 0)),
        ]
        operands = [ids_st, ents_st] + operands + [
            cols_in, ct.is_sphere, ct.valid_row,
            ct.rows if with_rows else ct.rows[:1]]
        scratch_kw = dict(scratch_shapes=ord_scratch)
        prefetch = [ct.ctype]
    else:
        in_specs += [
            blk((OUTS * C_tot, feat_in, K) if split
                else (C_tot, feat_in, OUTS * K), (0, 0, 0)),
            blk((C_tot, 1, K), (0, 0, 0)),
            blk((C_tot, 1, K), (0, 0, 0)),
            # rows table only when the kernel extracts winner rows — a
            # 1-row dummy otherwise (12 KB/cluster of VMEM back for
            # query-only marches; the kernel never reads rows_ref unless
            # with_rows)
            blk((C_tot if with_rows else 1, 48, K), (0, 0, 0)),
        ]
        operands += [cols_in, ct.is_sphere, ct.valid_row,
                     ct.rows if with_rows else ct.rows[:1]]
        scratch_kw = {}
        prefetch = [ids, ents, ct.ctype]
        if guard:
            cbox = jnp.concatenate([ct.cmin, ct.cmax], axis=1).reshape(-1)
            prefetch.append(cbox)

    def _mk_grid_spec(g):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref, grid=(g,),
            in_specs=in_specs, out_specs=out_specs, **scratch_kw)

    if stub_kernel:
        # keep the kernel's XLA feeders (cull, gate, chunk-entry sort, phi)
        # alive so the knockout isolates ONLY the pallas call: fold a
        # bounded function of them into the stub outputs
        keep = (jnp.sum(jnp.minimum(ents, 1.0)) +
                jnp.sum(jnp.minimum(phi[:, 0], 1.0)) +
                jnp.sum(jnp.maximum(gate, -1.0)) +
                jnp.sum(ids).astype(jnp.float32) * 1e-30)
        t_best = jnp.full((n_chunks, 1, ray_tile), BIG, jnp.float32) \
            + keep * 1e-30
        best = jnp.full((n_chunks, 1, ray_tile), -1, jnp.int32)
        rows_k = jnp.zeros((n_chunks if with_rows else 1, 16, ray_tile),
                           jnp.float32)
        wins_k = jnp.zeros((n_chunks, 1, ray_tile), jnp.int32)
    else:
        # PT_CLUSTER_PARSEM=1: declare the chunk grid dim "parallel"
        # (chunks are independent — distinct output blocks, no cross-step
        # carry), which lets Mosaic double-buffer per-step block DMAs
        # across grid steps instead of serializing them. The measured
        # per-grid-step overhead (~1.5 us x n_chunks x launches ~ 94 ms
        # per bench render, tools/tpu_knockout.py) is the target. The
        # kernel body still runs steps in order on the core, so the
        # streamed march's manual DMA semaphores (drained at each chunk's
        # end) stay correct. On-chip A/B knob.
        # PT_CLUSTER_VMEM_MB=N: raise Mosaic's scoped-VMEM budget above
        # the 16 MB default — 2048-lane windows (W=8 x K=256, W=16 x
        # K=128) abort at "scoped allocation 18.5M > 16.00M"; whether the
        # physical VMEM has headroom above the default budget is a chip
        # experiment (the knob makes it runnable).
        params = {}
        # PARSEM (dimension_semantics=parallel on the chunk grid):
        # DEFAULT-ON since round 4 — chunks are independent (distinct
        # output blocks, no cross-step carry; the resident tables are
        # read-only constant blocks), Mosaic can then overlap per-step
        # work across grid steps, measured +13% whole-render same-process
        # (415 -> 366 ms, image bit-identical). Gated off under stream:
        # the streamed march shares one SMEM/VMEM scratch set across grid
        # steps with manually managed DMA semaphores, and its correctness
        # rests on in-order step execution — which "parallel" semantics do
        # not guarantee (ADVICE r3). MEASUREMENT caveat: under PARSEM the
        # axon tunnel's block_until_ready returns before execution
        # completes (this produced the r3 44,632 Mrays/s artifact) — time
        # by materializing an output VALUE (bench.py does).
        # "1" (default): on unless the kernel manages cross-step scratch
        # DMAs manually (stream, orddma — parallel semantics do not
        # guarantee in-order steps, ADVICE r3). "2": force-on even there —
        # an experiment knob; the body empirically still runs steps in
        # order on this backend, but verify images per run.
        parsem = _os.environ.get("PT_CLUSTER_PARSEM", "1")
        if ((parsem == "1" and not stream and not orddma)
                or parsem == "2"):
            params["dimension_semantics"] = ("parallel",)
        vmem_mb = int(_os.environ.get("PT_CLUSTER_VMEM_MB", "0"))
        if vmem_mb:
            params["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
        params = pltpu.CompilerParams(**params) if params else None
        interp = jax.default_backend() != "tpu"

        def _run_march(g):
            outs = pl.pallas_call(
                kernel, grid_spec=_mk_grid_spec(g),
                out_shape=_mk_out_shape(g), compiler_params=params,
                interpret=interp)(*prefetch, *operands)
            if g == n_chunks:
                return tuple(outs)
            # chunks past the live prefix have no touched lanes; the
            # kernel would write exactly (BIG, -1, 0 rows, 0 wins) for
            # them — pad the identity instead of stepping the grid
            t_b, b_b, r_k, w_k = outs
            pad = n_chunks - g
            t_b = jnp.concatenate(
                [t_b, jnp.full((pad, 1, ray_tile), BIG, jnp.float32)])
            b_b = jnp.concatenate(
                [b_b, jnp.full((pad, 1, ray_tile), -1, jnp.int32)])
            if with_rows:
                r_k = jnp.concatenate(
                    [r_k, jnp.zeros((pad, 16, ray_tile), jnp.float32)])
            w_k = jnp.concatenate(
                [w_k, jnp.zeros((pad, 1, ray_tile), jnp.int32)])
            return t_b, b_b, r_k, w_k

        if ladder is not None:
            # smallest rung covering the live prefix; every rung is the
            # SAME kernel at a smaller grid (no per-kernel code growth —
            # the axon compile wall is per-kernel code size)
            idx = jnp.int32(0)
            for _k, _g in enumerate(ladder[1:], 1):
                idx = jnp.where(n_live_chunks <= _g, jnp.int32(_k), idx)
            t_best, best, rows_k, wins_k = jax.lax.switch(
                idx, [functools.partial(_run_march, g) for g in ladder])
        else:
            t_best, best, rows_k, wins_k = _run_march(n_chunks)
    # executed pair tests (ray x primitive slot): the kernel counts order
    # SLOTS marched (windows x width, narrow window included), each slot
    # sweeping K lanes against ray_tile rays — the numerator of the bench
    # MFU line (sweep flops = pairs x OUTS x 72 MACs under fused6)
    pair_tests = (jnp.sum(wins_k[:, 0, 0].astype(jnp.float32))
                  * float(K * ray_tile))
    t_best = t_best.reshape(-1)
    best = best.reshape(-1)
    # field-major (16, R): keeps the ray dim on lanes — transposing to
    # (R, 16) would relayout every element onto 16-wide rows (minor dim
    # far below the 128-lane register width)
    rowsF = (rows_k.transpose(1, 0, 2).reshape(16, r_pad)
             if with_rows else None)

    # merge the XLA residual result (strict better keeps residual on ties,
    # exactly like the old residual-first in-kernel visit)
    use_k = t_best < t_res
    t_best = jnp.where(use_k, t_best, t_res)
    best = jnp.where(use_k, best, b_res)
    if with_rows:
        oh_res = (jax.lax.broadcasted_iota(jnp.int32, (K_RES, r_pad), 0)
                  == j_res[None, :]).astype(jnp.bfloat16)
        r48 = jax.lax.dot_general(
            ct.rows[C_reg, :, K - K_RES:], oh_res, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (48, r_pad)
        rows_res = (r48[0:16] + r48[16:32]) + r48[32:48]
        rowsF = jnp.where(use_k[None, :], rowsF, rows_res)

    if keep_sorted:
        # dead (inactive) rays can register pseudo-hits on enclosing
        # residual spheres (a is forced to 1, so an origin inside the
        # backdrop "hits" it); the contract is that they are misses
        found = (best >= 0) & active
        idx = jnp.where(found, best, 0)
        return idx, t_best, found, rowsF, o, d, active, extras, pair_tests

    if sort_rays:
        ops = [rid, t_best, best] + (
            [rowsF[f] for f in range(16)] if with_rows else [])
        ops = jax.lax.sort(ops, num_keys=1)
        rid, t_best, best = ops[0], ops[1], ops[2]
        if with_rows:
            rowsF = jnp.stack(ops[3:19], axis=0)
    t_best = t_best[:r]
    best = best[:r]
    # (same dead-ray pseudo-hit masking as above, in caller order)
    found = (best >= 0) & active0[:r]
    idx = jnp.where(found, best, 0)
    if with_rows:
        return idx, t_best, found, rowsF[:, :r]
    return idx, t_best, found


def make_cluster_closest_hit(ct: ClusterTables, t_min: float,
                             ray_tile: int = DEF_RAY_TILE,
                             window: int = DEF_WINDOW,
                             max_rounds: int = DEF_MAX_ROUNDS,
                             sort_rays: bool = True,
                             strategy: str = "march"):
    """Closest-hit factory over prebuilt (detached) cluster tables.

    ``strategy``: "march" (single-pass in-kernel march — the fast default)
    or "rounds" (multi-round sort/cull/window pipeline; window/max_rounds
    apply). Indices refer to ``ct.scene`` (the reordered scene) — the
    renderer shades with that scene (render/renderer.py), keeping the
    contract identical to the tensor/pallas/bvh/brute factories."""
    ct = jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if hasattr(x, "dtype") else x,
        ct)
    # PT_CLUSTER_RAYTILE: chunk-width A/B knob (tile=256 halves grid steps
    # per query at 2x the per-window lane count; r3 measured it negative
    # at W=2, re-test at W=8 per VERDICT #8)
    import os as _os
    ray_tile = int(_os.environ.get("PT_CLUSTER_RAYTILE", ray_tile))

    def closest(o, d):
        if strategy == "march":
            return cluster_march(ct, o, d, float(t_min),
                                 ray_tile=ray_tile, sort_rays=sort_rays)
        return cluster_closest(ct, o, d, float(t_min), ray_tile=ray_tile,
                               window=window, max_rounds=max_rounds,
                               sort_rays=sort_rays)
    # d == 0 rays resolve instantly — the integrator uses this to retire
    # terminated wavefront lanes (render/integrator.py).
    closest.handles_dead = True
    if strategy == "march":
        # (idx, t, valid, rows): the kernel also emits the winner's packed
        # hit-field row, sparing the per-bounce scene-row gather. Detached
        # (like idx) — the differentiable path must not use it.
        def query_rows(o, d):
            return cluster_march(ct, o, d, float(t_min),
                                 ray_tile=ray_tile, sort_rays=sort_rays,
                                 with_rows=True)
        closest.query_rows = query_rows

        if sort_rays:
            # sorted-wavefront protocol (render/integrator.py): the
            # caller's per-ray state rides the binning sort and everything
            # stays in march order — no unsort per bounce at all.
            def query_sorted(o, d, active, extras, resort=True):
                # resort=False keeps the incoming lane order (no binning
                # sort this bounce) — exact either way, the march finds
                # each lane's true min regardless of chunk grouping;
                # only locality (clusters marched per chunk) changes
                return cluster_march(ct, o, d, float(t_min),
                                     ray_tile=ray_tile, with_rows=True,
                                     active=active, extras=extras,
                                     sort_rays=resort)
            closest.query_sorted = query_sorted
            closest.ray_tile = ray_tile

        # NEE occlusion query: the shadow segment is unnormalized (light at
        # t == 1), so t_max = 1.0 rejects beyond-light geometry and stops
        # the march at the light. No binning sort or unsort either — shadow
        # rays originate at the (already march-ordered) hit points, so the
        # incoming order is locality-preserving as-is. t_min is the
        # near-zero K_SHADOW_T_MIN, not the caller's t_min: the segment
        # origin is already offset off the surface (render/lights), and the
        # parametric window is proportional to light distance (config.py).
        def query_shadow(o, d, active=None):
            from pathtracer_tpu.config import K_SHADOW_T_MIN
            return cluster_march(ct, o, d, K_SHADOW_T_MIN,
                                 ray_tile=ray_tile, sort_rays=False,
                                 active=active, t_max=1.0)
        closest.query_shadow = query_shadow
    else:
        def query_shadow(o, d, active=None):
            from pathtracer_tpu.config import K_SHADOW_T_MIN
            del active
            return cluster_closest(ct, o, d, K_SHADOW_T_MIN,
                                   ray_tile=ray_tile, window=window,
                                   max_rounds=max_rounds,
                                   sort_rays=sort_rays)
        closest.query_shadow = query_shadow
    return closest
