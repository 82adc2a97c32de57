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

The take-vs-matmul POLICY lives here and only here (call sites state a
measured per-site preference; the decision is made centrally):

- ``PT_GATHER=take``   — every ``exact_rows`` is a plain ``jnp.take``
- ``PT_GATHER=matmul`` — every ``exact_rows`` is the one-hot matmul
- ``PT_GATHER=auto``   (default) — sites that measured a matmul win pass
  ``force_matmul=True`` and get the matmul **on TPU only** (native gathers
  are fine on CPU/GPU); everything else is a take. Measured basis (chip,
  r2): one packed-row take and the one-hot matmul run at the same speed for
  a 16k x 16 table in-loop, so takes stay default; per-bounce small-table
  fetches (materials / lights / texture scanlines) measured ms-per-wavefront
  as takes and prefer the matmul.

The env knob is read at trace time, so it participates in the renderer
cache key (renderer._experiment_env_sig covers ``PT_GATHER``).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

MATMUL_MAX_ROWS = 32768


def _use_matmul(n_rows: int, force_matmul: bool) -> bool:
    policy = os.environ.get("PT_GATHER", "auto").lower()
    if policy == "take":
        return False
    if policy == "matmul":
        return True
    # auto: honor the call site's measured preference, on TPU only; cap the
    # one-hot traffic (R x N) for tables too large to pay for themselves.
    return (force_matmul and n_rows <= MATMUL_MAX_ROWS
            and jax.default_backend() == "tpu")


def exact_rows(table: jnp.ndarray, idx: jnp.ndarray,
               force_matmul: bool = False) -> jnp.ndarray:
    """take(table, idx, axis=0) — (N, F) x (R,) -> (R, F), exact values.

    ``force_matmul`` is the call site's measured preference, applied per the
    central policy above (module docstring). Both paths return bit-identical
    values (tests/test_gather.py pins take == matmul across dtypes/backends).
    """
    n = table.shape[0]
    if not _use_matmul(n, force_matmul):
        return jnp.take(table, idx, axis=0)
    iota = jax.lax.broadcasted_iota(jnp.float32, (idx.shape[0], n), 1)
    oh = (iota == idx[:, None].astype(jnp.float32)).astype(jnp.float32)
    oh = jax.lax.optimization_barrier(oh)
    return jax.lax.dot_general(
        oh, table, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
