"""Uniform distribution on the sphere S^{m-1} of radius R = 1/sqrt(K).

Reference: ``mt/mvae/distributions/hyperspherical_uniform.py`` in
oskopek/mvae [UNVERIFIED]. Used as the prior paired with the von
Mises-Fisher posterior; its closed-form log-density (negative log surface
area) gives the analytic vMF KL.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_surface_area(m: int, k) -> jax.Array:
    """log Area(S^{m-1}_R) = log(2 pi^{m/2} / Gamma(m/2)) + (m-1) log R."""
    log_unit = (math.log(2.0) + (m / 2.0) * math.log(math.pi)
                - math.lgamma(m / 2.0))
    r = 1.0 / jnp.sqrt(jnp.maximum(k, 1e-30))
    return log_unit + (m - 1) * jnp.log(r)


def log_prob(z, k):
    """Constant density: -log Area. z has ambient coords (..., m)."""
    m = z.shape[-1]
    return jnp.broadcast_to(-log_surface_area(m, k).astype(z.dtype),
                            z.shape[:-1])


def entropy(m: int, k):
    return log_surface_area(m, k)


def sample(key, shape, m: int, k, dtype=jnp.float32):
    """Uniform draw on the radius-R sphere: normalized Gaussian * R."""
    g = jax.random.normal(key, shape + (m,), dtype=dtype)
    g = g / jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + 1e-30)
    r = (1.0 / jnp.sqrt(jnp.maximum(k, 1e-30))).astype(dtype)
    return g * r
