"""Diagonal Gaussian primitives (pure functions over jax.random).

Replaces the reference's use of ``torch.distributions.Normal``
(``mt/mvae/distributions/`` in oskopek/mvae [UNVERIFIED]) for the Euclidean
component and as the tangent-space base of the wrapped normal. ``sigma`` may
have trailing dim 1 (the reference's ``scalar_parametrization`` isotropic
mode) or ``n`` (diagonal); broadcasting covers both.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def sample(key, mu, sigma, shape=None):
    """Reparameterized draw: mu + sigma * eps."""
    if shape is None:
        shape = jnp.broadcast_shapes(mu.shape, sigma.shape)
    eps = jax.random.normal(key, shape, dtype=mu.dtype)
    return mu + sigma * eps


def log_prob(x, mu, sigma):
    """Summed (over last axis) diagonal Gaussian log-density (f32
    accumulation under bf16 inputs)."""
    sigma = jnp.broadcast_to(sigma, x.shape)
    z = (x - mu) / sigma
    acc = jnp.float32 if x.dtype == jnp.bfloat16 else x.dtype
    return jnp.sum(-0.5 * (z * z + _LOG_2PI) - jnp.log(sigma), axis=-1,
                   dtype=acc)


def kl_diag(mu_q, sigma_q, mu_p, sigma_p):
    """Analytic KL(q || p) between diagonal Gaussians, summed over last axis."""
    sigma_q = jnp.broadcast_to(sigma_q, mu_q.shape)
    sigma_p = jnp.broadcast_to(sigma_p, mu_q.shape)
    var_ratio = (sigma_q / sigma_p) ** 2
    t1 = ((mu_q - mu_p) / sigma_p) ** 2
    return 0.5 * jnp.sum(var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1)


def kl_std(mu, sigma):
    """KL(q || N(0, I)) shortcut."""
    sigma = jnp.broadcast_to(sigma, mu.shape)
    return 0.5 * jnp.sum(sigma * sigma + mu * mu - 1.0
                         - 2.0 * jnp.log(sigma), axis=-1)
