"""Morton clustering of primitives for the culled (sub-linear) closest-hit.

The reference makes per-ray cost ~O(log N) with a BVH walked by a per-thread
stack (``utils/render_manager.h:86-135``, ``utils/bvh.h:132-145``). On TPU
pointer-chasing is serialized (docs/DESIGN.md), so the same *role* — don't
test every ray against every primitive — is filled differently:

- primitives are sorted by the morton code of their AABB center (the same
  spatial key the reference's LBVH uses, ``utils/morton_code.h:29-45``) and
  grouped into **clusters of K consecutive rows**, each with a precomputed
  cluster AABB;
- rays are culled against the C cluster AABBs (dense (R, C) slab tests —
  cheap, C is tiny) and binned/sorted by nearest cluster
  (ops/cluster_sweep.py), so each ray sweeps only a bounded window of
  clusters instead of the whole scene.

Huge primitives (the 1000-radius backdrop spheres, main.cu:169-171,198) would
inflate any cluster AABB they touch into "always hit", so they are routed to
a **residual tile**: the last K rows of the reordered table, swept densely
for every ray exactly once per query. The morton quantization domain is
computed over the *non-huge* primitives only, so one backdrop sphere does not
collapse every bunny triangle into a single morton cell.

Everything here is traced JAX (runs on device, once per render): the sort is
``lax.sort`` over the per-primitive SoA columns, which keeps the reordered
scene differentiable w.r.t. the original scene arrays (a permutation is
linear), so the inverse-rendering path works unchanged on the reordered
scene.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pathtracer_tpu.ops import morton
from pathtracer_tpu.ops.tensor_sweep import OUTS, FEAT, pack_sweep_tables
from pathtracer_tpu.scene.scene import PRIM_SPHERE, Scene

# Sort-key bands (uint32): regular prims carry their 30-bit morton code,
# padding rows sort after every regular prim but before huge prims, huge
# prims go last (into the residual tile).
_KEY_PAD = jnp.uint32(0x40000000)
_KEY_HUGE = jnp.uint32(0x80000000)

# A primitive is "huge" when its AABB extent exceeds this multiple of the
# median extent (and a small absolute floor). 16x cleanly separates backdrop
# spheres (extent ~2000) from scene geometry (bunny triangles ~0.1, hero
# spheres ~3) without catching large-but-ordinary prims like Cornell walls.
HUGE_EXTENT_FACTOR = 16.0

# Static capacity of the *skinny* residual sweep: the march's XLA residual
# pass only tests the LAST K_RES rows of the residual tile (huge prims sort
# to the very end, after inert padding), so at most K_RES prims may
# classify huge. Reference scenes have 0-3 (bunny: 2 backdrop + ground);
# candidates beyond the K_RES largest are demoted to regular clusters —
# exact either way, their AABBs just inflate the clusters they land in.
K_RES = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ClusterTables:
    """Reordered scene + per-cluster sweep tables.

    Row layout of ``scene`` (total = (C_reg + 1) * K rows):
      [0, C_reg*K)          — regular prims sorted by morton code, grouped
                              into C_reg clusters of K rows
      [C_reg*K, total)      — the residual tile: huge prims + inert padding,
                              swept densely for every ray

    ``cols``/``is_sphere``/``valid_row`` are the tensor-sweep matmul tables
    (ops/tensor_sweep.pack_sweep_tables) tiled at tile == K, so table row c
    is exactly cluster c (row C_reg = the residual tile).
    """
    scene: Scene
    cols: jnp.ndarray       # (C_reg+1, FEAT, OUTS*K) f32
    is_sphere: jnp.ndarray  # (C_reg+1, 1, K) int32
    valid_row: jnp.ndarray  # (C_reg+1, 1, K) int32
    rows: jnp.ndarray       # (C_reg+1, 48, K) bf16 — per-prim hit fields,
                            # field-major: [prim_type, v0 xyz, e1 xyz,
                            # e2 xyz, radius, tri_normal xyz, prim_mat,
                            # pad], stored as an exact 3-way bf16 split
                            # (rows [0:16] hi + [16:32] mid + [32:48] lo
                            # sum to the f32 fields bit-exactly); the march
                            # kernel emits the winning primitive's record
                            # row as three one-lane-hot DEFAULT matmuls —
                            # exact, half the MXU passes of a HIGHEST
                            # contraction, and no TPU gather anywhere
    cmin: jnp.ndarray       # (C_reg, 3) regular-cluster AABB lower corners
    cmax: jnp.ndarray       # (C_reg, 3)
    ctype: jnp.ndarray      # (C_reg+1,) int32: 0 mixed, 1 all-sphere,
                            # 2 all-triangle (among valid rows) — the march
                            # kernel branches on this to skip the unused
                            # epilogue half (the sphere sqrt dominates
                            # all-triangle clusters, i.e. every mesh
                            # cluster)
    perm: jnp.ndarray       # (total,) int32: original row per reordered row
                            # (>= num original rows for padding)
    # static (pytree aux data — stay Python ints across jit boundaries)
    K: int = dataclasses.field(metadata=dict(static=True))
    C_reg: int = dataclasses.field(metadata=dict(static=True))


def _pad_prim_rows(scene: Scene, total: int):
    """Extend the per-primitive SoA columns to ``total`` rows with inert
    padding (degenerate far-away spheres, inverted AABBs — the same pattern
    SceneBuilder.build(pad_to=...) uses)."""
    n = scene.num_prims
    pad = total - n
    big = jnp.float32(3e37)

    def pad3(x, value):
        return jnp.concatenate(
            [x, jnp.full((pad, 3), value, x.dtype)], axis=0)

    return dict(
        prim_type=jnp.concatenate(
            [scene.prim_type, jnp.full((pad,), PRIM_SPHERE, jnp.int32)]),
        v0=pad3(scene.v0, big),
        e1=pad3(scene.e1, 0.0),
        e2=pad3(scene.e2, 0.0),
        radius=jnp.concatenate([scene.radius, jnp.zeros(pad, jnp.float32)]),
        tri_normal=pad3(scene.tri_normal, 0.0),
        prim_mat=jnp.concatenate([scene.prim_mat,
                                  jnp.zeros(pad, jnp.int32)]),
        box_min=pad3(scene.box_min, big),
        box_max=pad3(scene.box_max, -big),
    )


def build_cluster_tables(scene: Scene, K: int = 128) -> ClusterTables:
    """Cluster the scene's primitives. Fully traced (device, differentiable
    through the reorder); call once per render, outside the bounce loop."""
    # K < 128 is only profitable through the march's *split-table grouped*
    # windows (PT_CLUSTER_SPLIT=1, ops/cluster_sweep.py): the kernel then
    # loads type-major (FEAT, K) blocks (no sub-128 lane slicing of VMEM)
    # and sweeps W*K >= 128 lanes per window, while the finer clusters cut
    # pair tests per ray. The rounds strategy and the per-slot wide body
    # still need K % 128 == 0 (they lane-slice at K granularity).
    if K % 8 != 0 or K < K_RES:
        raise ValueError("cluster size K must be a multiple of 8, >= K_RES")
    n0 = scene.num_prims
    # capacity >= n0: regular prims must NEVER spill into the residual
    # tile — the march's skinny residual pass only tests its last K_RES
    # rows (pads + huge prims sort behind every regular prim)
    C_reg = max(1, -(-n0 // K))
    total = (C_reg + 1) * K

    rows = _pad_prim_rows(scene, total)
    box_min, box_max = rows["box_min"], rows["box_max"]

    # classify: padding rows have inverted boxes (negative extent)
    extent = jnp.max(box_max - box_min, axis=-1)
    is_real = extent >= 0.0
    med = jnp.nanmedian(jnp.where(is_real, extent, jnp.nan))
    med = jnp.where(jnp.isnan(med), 0.0, med)
    huge = is_real & (extent > jnp.maximum(HUGE_EXTENT_FACTOR * med, 1e-6))
    # clamp to the K_RES largest (traceable rank via two tiny sorts): the
    # skinny residual sweep only tests the last K_RES reordered rows
    hkey = jnp.where(huge, -extent, jnp.float32(3e38))
    iota_t = jnp.arange(total, dtype=jnp.int32)
    _, by_size = jax.lax.sort([hkey, iota_t], num_keys=1, is_stable=True)
    _, rank = jax.lax.sort([by_size, iota_t], num_keys=1)
    huge = huge & (rank < K_RES)

    # morton domain over the regular (non-huge, real) prims only
    reg = is_real & ~huge
    inf = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(reg[:, None], box_min, inf), axis=0)
    dmax = jnp.max(jnp.where(reg[:, None], box_max, -inf), axis=0)
    center = 0.5 * (box_min + box_max)
    code = morton.morton3d(center, dmin, dmax)

    key = jnp.where(~is_real, _KEY_PAD,
                    jnp.where(huge, _KEY_HUGE | code, code))

    perm0 = jnp.arange(total, dtype=jnp.int32)
    names = list(rows.keys())
    sorted_ops = jax.lax.sort(
        [key] + [rows[nm] if rows[nm].ndim == 1 else rows[nm][:, a]
                 for nm in names for a in range(
                     1 if rows[nm].ndim == 1 else 3)] + [perm0],
        num_keys=1, is_stable=True)
    # unpack in the same flattened order
    it = iter(sorted_ops[1:])
    reordered = {}
    for nm in names:
        if rows[nm].ndim == 1:
            reordered[nm] = next(it)
        else:
            reordered[nm] = jnp.stack([next(it) for _ in range(3)], axis=1)
    perm = next(it)

    # remap the light list to the new row positions (tiny, once per render)
    inv = jax.lax.sort([perm, jnp.arange(total, dtype=jnp.int32)],
                       num_keys=1)[1]
    light_idx = (jnp.sort(inv[scene.light_idx])
                 if scene.num_lights > 0 else scene.light_idx)

    new_scene = scene._replace(light_idx=light_idx, **reordered)

    tables = pack_sweep_tables(new_scene, tile=K)
    assert tables.tile == K and tables.cols.shape[0] == C_reg + 1

    cmin = reordered["box_min"][:C_reg * K].reshape(C_reg, K, 3).min(axis=1)
    cmax = reordered["box_max"][:C_reg * K].reshape(C_reg, K, 3).max(axis=1)

    # hit-record field rows: same packing intersect.hit_records_from_prims
    # uses, transposed field-major so the kernel's winner extraction is a
    # lane-contraction matmul. Split each f32 into three bf16 components
    # (Dekker-style, exact: 24-bit mantissa = 3 x 8-bit chunks; bf16 shares
    # f32's exponent range) so the kernel contracts at DEFAULT precision.
    hit_fields = jnp.concatenate([
        reordered["prim_type"].astype(jnp.float32)[:, None],
        reordered["v0"], reordered["e1"], reordered["e2"],
        reordered["radius"][:, None], reordered["tri_normal"],
        reordered["prim_mat"].astype(jnp.float32)[:, None],
        jnp.zeros((total, 1), jnp.float32),
    ], axis=1)                                   # (total, 16)
    rows16 = hit_fields.reshape(C_reg + 1, K, 16).transpose(0, 2, 1)
    # reduce_precision, NOT astype round-trips: under the axon stack's
    # --xla_allow_excess_precision an f32->bf16->f32 round-trip is elided
    # on TPU and the residuals fold to zero (tensor_sweep.split3_bf16's
    # round-4 hazard note) — table building is eager today, but this must
    # stay correct under jit too
    hi_f = jax.lax.reduce_precision(rows16, 8, 7)
    r1 = rows16 - hi_f
    mid_f = jax.lax.reduce_precision(r1, 8, 7)
    hi = hi_f.astype(jnp.bfloat16)
    mid = mid_f.astype(jnp.bfloat16)
    lo = (r1 - mid_f).astype(jnp.bfloat16)
    rows48 = jnp.concatenate([hi, mid, lo], axis=1)   # (C_tot, 48, K)

    any_s = (tables.is_sphere & tables.valid_row).any(axis=1)
    any_t = (~tables.is_sphere & tables.valid_row).any(axis=1)
    ctype = jnp.where(any_s & any_t, 0,
                      jnp.where(any_s, 1, 2)).astype(jnp.int32)

    return ClusterTables(
        scene=new_scene,
        cols=tables.cols,
        is_sphere=tables.is_sphere.astype(jnp.int32)[:, None, :],
        valid_row=tables.valid_row.astype(jnp.int32)[:, None, :],
        rows=rows48,
        cmin=cmin, cmax=cmax, ctype=ctype, perm=perm, K=K, C_reg=C_reg)
