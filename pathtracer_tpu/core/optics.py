"""Optics helpers: mirror reflection, Snell refraction, Schlick reflectance.

Matches reference ``simulation/physical.h:11-25`` formulas exactly, batched
over ``(..., 3)`` arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import vec


def reflect(v, n):
    """Mirror reflection (physical.h:11-13)."""
    return v - 2.0 * vec.dot(v, n, keepdims=True) * n


def refract(uv, n, etai_over_etat):
    """Snell refraction (physical.h:14-19).

    ``uv`` must be unit length; ``etai_over_etat`` broadcasts as (...,) or
    (..., 1). The reference uses fabs() under the sqrt; the sqrt itself is
    additionally grad-guarded — at exact grazing (|perp| = 1) its derivative
    is infinite and would NaN the normal/vertex gradients even when this
    lobe is masked out.
    """
    eta = jnp.asarray(etai_over_etat)
    if eta.ndim == uv.ndim - 1:
        eta = eta[..., None]
    cos_theta = jnp.minimum(vec.dot(-uv, n, keepdims=True), 1.0)
    r_out_perp = eta * (uv + cos_theta * n)
    a = jnp.abs(1.0 - vec.length_squared(r_out_perp, keepdims=True))
    r_out_parallel = -vec.safe_sqrt(a) * n
    return r_out_perp + r_out_parallel


def reflectance(cosine, ref_idx):
    """Schlick's approximation (physical.h:20-25)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(1.0 - cosine, 5.0)
