"""Stateless Monte Carlo samplers.

The reference keeps a per-pixel curand XORWOW state array
(``main.cu:262-269``) and draws with data-dependent rejection loops
(``utils/utility.h:51-82``). On TPU both are wrong: stateful RNG serializes
and rejection loops are divergent under vectorization. We use JAX's
counter-based threefry keys (key = fold(seed, pixel, sample, bounce)) and the
*analytic* samplers the reference also ships (``utility.h:84-102``) — they
draw from exactly the same distributions as the rejection versions:

- uniform-in-ball normalized  == uniform-on-sphere  (utility.h:51-62 vs 84-89)
- uniform-in-ball             == direction * cbrt(u) (utility.h:73-82 vs 64-71)
- the disk sampler is already analytic (utility.h:98-102)

All samplers take pre-drawn uniforms in [0, 1) so callers can batch a single
``jax.random.uniform`` call per bounce for the whole wavefront.
"""
from __future__ import annotations

import jax.numpy as jnp

from pathtracer_tpu.core import vec

TWO_PI = 2.0 * vec.PI


def uniform_on_sphere(u1, u2):
    """Uniform direction on the unit sphere (utility.h:84-89).

    phi = 2*pi*u1, cos(theta) = 1 - 2*u2.
    Returns (..., 3).
    """
    phi = TWO_PI * u1
    cos_theta = 1.0 - 2.0 * u2
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return vec.v3(jnp.cos(phi) * sin_theta,
                  jnp.sin(phi) * sin_theta,
                  cos_theta)


def uniform_in_sphere(u1, u2, u3):
    """Uniform point in the unit ball (utility.h:64-71 analytic form)."""
    return uniform_on_sphere(u1, u2) * jnp.cbrt(u3)[..., None]


def uniform_on_hemisphere(u1, u2, normal):
    """Uniform direction in the hemisphere around ``normal``
    (utility.h:91-96: sphere sample, flipped to the normal's side)."""
    d = uniform_on_sphere(u1, u2)
    flip = jnp.where(vec.dot(d, normal, keepdims=True) > 0.0, 1.0, -1.0)
    return d * flip


def uniform_in_disk(u1, u2):
    """Uniform point in the unit disk, z = 0 (utility.h:98-102).

    r = sqrt(u1), theta = 2*pi*u2 — identical to the reference.
    """
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    return vec.v3(r * jnp.cos(theta), r * jnp.sin(theta),
                  jnp.zeros_like(r))


def uniform_in_range(lo, hi, u):
    """u in [lo, hi); returns 0 when hi <= lo (utility.h:46-49)."""
    return jnp.where(hi <= lo, 0.0, u * (hi - lo) + lo)
