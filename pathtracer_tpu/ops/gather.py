"""Exact row gathering without the TPU gather path.

XLA lowers ``jnp.take(table, idx, axis=0)`` on TPU to a serialized per-row
gather (measured ~20 ms for 16k rows on-chip — SURVEY-era traversal died on
this). For tables up to a few tens of thousands of rows it is far faster to
express the gather as ``one_hot(idx) @ table`` on the MXU:

- exact for f32 tables under ``Precision.HIGHEST`` (bf16x3 multiplies by
  exact 0/1 weights),
- differentiable: the VJP is ``one_hot(idx)^T @ g`` — a scatter-add that
  also rides the MXU (gradients to scene geometry/materials),
- the ``optimization_barrier`` keeps the algebraic simplifier from
  rewriting the matmul back into the gather it replaces.

Falls back to ``jnp.take`` above ``MATMUL_MAX_ROWS`` (one-hot traffic grows
as R x N) and on non-TPU backends where native gathers are fine.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MATMUL_MAX_ROWS = 32768


def exact_rows(table: jnp.ndarray, idx: jnp.ndarray,
               force_matmul: bool = False) -> jnp.ndarray:
    """take(table, idx, axis=0) — (N, F) x (R,) -> (R, F), exact values.

    Default is a plain take: measured on the current chip, one packed-row
    take and the one-hot matmul run at the same speed (3-4 ms per 16k x 16
    rows in-loop), and take avoids the (R, N) one-hot traffic. The matmul
    path is kept (``force_matmul``) for hardware where the native gather is
    the bottleneck.
    """
    n = table.shape[0]
    if not force_matmul:
        return jnp.take(table, idx, axis=0)
    iota = jax.lax.broadcasted_iota(jnp.float32, (idx.shape[0], n), 1)
    oh = (iota == idx[:, None].astype(jnp.float32)).astype(jnp.float32)
    oh = jax.lax.optimization_barrier(oh)
    return jax.lax.dot_general(
        oh, table, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
