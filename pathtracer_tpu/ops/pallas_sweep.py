"""Pallas TPU kernel: fused tensor-sweep closest-hit.

The XLA form of the tensor sweep (ops/tensor_sweep.py) materializes the
(R, tile, 4) pair-scalar block between the matmul and its epilogue — an HBM
round trip per primitive tile. This kernel fuses

    phi @ cols  ->  epilogue (sphere/triangle accept tests)  ->  running
    (t_best, argmin) accumulation

entirely in VMEM: the grid walks (ray tiles x primitive tiles), the matmul
feeds the MXU per step, the epilogue and the min-merge run on the VPU, and
only the final per-ray (t_best, best_idx) ever leaves the chip. Grid
iteration over the primitive axis revisits the same output block (the
standard K-loop accumulation pattern), initialised at j == 0.

Semantics are identical to tensor_sweep.tensor_closest (same column packing,
same reference accept/reject rules from ``cuda_object.h:45-90``); tie-break
prefers the lowest primitive index because tiles are visited in ascending
order and the merge uses strict '<'.
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
from pathtracer_tpu.ops.tensor_sweep import (BIG, FEAT, OUTS, SweepTables,
                                             pack_sweep_tables, ray_features)
from pathtracer_tpu.scene.scene import Scene

DEF_RAY_TILE = 128   # keeps the (ray_tile, tile*OUTS) block ~2 MB in VMEM
DEF_PRIM_TILE = 1024


def _sweep_kernel(phi_ref, a_ref, cols_ref, sph_ref, valid_ref,
                  t_ref, best_ref, *, tile, t_min):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, BIG)
        best_ref[:] = jnp.full_like(best_ref, -1)

    # (RT, FEAT) @ (FEAT, OUTS*tile) on the MXU, f32-exact; the OUTS-major
    # column layout lets us slice the result along lanes (Mosaic cannot
    # reshape-split the lane dimension).
    S = tensor_sweep.sweep_dot(phi_ref[:], cols_ref[0], in_kernel=True)
    t_eff = tensor_sweep._epilogue(
        S[:, 0:tile], S[:, tile:2 * tile],
        S[:, 2 * tile:3 * tile], S[:, 3 * tile:4 * tile],
        a_ref[0, 0],
        sph_ref[0, 0] != 0, valid_ref[0, 0] != 0,
        t_min, BIG)

    local_j = jnp.argmin(t_eff, axis=1).astype(jnp.int32)
    local_t = jnp.min(t_eff, axis=1)
    better = local_t < t_ref[0, 0]
    best_ref[0, 0] = jnp.where(better, j * tile + local_j, best_ref[0, 0])
    t_ref[0, 0] = jnp.where(better, local_t, t_ref[0, 0])


def pallas_closest(tables: SweepTables, o, d, t_min,
                   ray_tile: int = DEF_RAY_TILE
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused closest-hit: (prim_idx, t, valid), each (R,).

    R must be a multiple of ``ray_tile`` (the renderer's chunk sizes are).
    """
    r = o.shape[0]
    # Mosaic requires rank-1 block sizes to be multiples of 128; pad the
    # wavefront up to a ray_tile multiple (padding rays have d = 0 -> a = 0
    # -> every test rejects; they are sliced off below).
    r_pad = -(-r // ray_tile) * ray_tile
    n_tiles = tables.cols.shape[0]
    tile = tables.tile

    phi = ray_features(o, d)
    a = vec.dot(d, d)
    if r_pad != r:
        phi = jnp.pad(phi, ((0, r_pad - r), (0, 0)))
        # pad a with 1 (not 0): phi = 0, a = 1 makes every test reject
        # cleanly (sphere roots 0 < t_min; triangle det == 0)
        a = jnp.pad(a, (0, r_pad - r), constant_values=1.0)
    # Rank-1 operands get an XLA layout (T(1024)) that fights Mosaic's
    # (T(128)) block tiling; carry every per-ray vector as rank-3
    # (n_ray_tiles, 1, ray_tile) instead, blocks (1, 1, ray_tile) — the
    # same trick as the per-tile flag rows.
    n_ray_tiles = r_pad // ray_tile
    a = a.reshape(n_ray_tiles, 1, ray_tile)
    sph = tables.is_sphere.astype(jnp.int32)[:, None, :]
    valid = tables.valid_row.astype(jnp.int32)[:, None, :]

    kernel = functools.partial(_sweep_kernel, tile=tile,
                               t_min=float(t_min))
    grid = (n_ray_tiles, n_tiles)
    t_best, best = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ray_tile, FEAT), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FEAT, tile * OUTS), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ray_tile), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ray_tiles, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((n_ray_tiles, 1, ray_tile), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(phi, a, tables.cols, sph, valid)

    t_best = t_best.reshape(r_pad)[:r]
    best = best.reshape(r_pad)[:r]
    found = best >= 0
    return jnp.where(found, best, 0), t_best, found


def make_pallas_closest_hit(scene: Scene, t_min: float,
                            tile: int = DEF_PRIM_TILE,
                            ray_tile: int = DEF_RAY_TILE):
    """Closest-hit factory (visibility detached, same contract as the
    tensor/bvh/brute variants)."""
    tables = jax.tree_util.tree_map(
        lambda x: jax.lax.stop_gradient(x) if hasattr(x, "dtype") else x,
        pack_sweep_tables(scene, tile=tile))

    def closest(o, d):
        return pallas_closest(tables, o, d, float(t_min),
                              ray_tile=ray_tile)
    return closest
