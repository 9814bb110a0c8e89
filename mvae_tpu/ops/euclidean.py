"""Euclidean manifold E^n as pure functions (flat, K = 0).

Capability parity with the reference's trivial manifold
(``mt/mvae/ops/euclidean.py`` in oskopek/mvae [UNVERIFIED]): exp = +,
log = -, parallel transport = identity, distance = L2 norm. The curvature
argument ``k`` is accepted (and ignored) so every manifold module shares one
calling convention; that uniformity is what lets the whole latent stack be
jit-compiled over a product of heterogeneous components without Python
branching in the hot path.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable

KIND = "e"
CURVATURE_SIGN = 0  # flat


def ambient_dim(dim: int) -> int:
    return dim


def mu0(dim: int, k, dtype) -> jnp.ndarray:
    del k
    return jnp.zeros((dim,), dtype=dtype)


def project(x, k):
    del k
    return x


def exp_map(x, u, k):
    del k
    return x + u


def log_map(x, y, k):
    del k
    return y - x


def parallel_transport(x, y, u, k):
    del x, y, k
    return u


def distance(x, y, k):
    del k
    return stable.safe_norm(y - x)


def exp_map_mu0(v, k):
    del k
    return v


def log_map_mu0(z, k):
    del k
    return z


def transp_mu0(mu, v, k):
    del mu, k
    return v


def inv_transp_mu0(mu, u, k):
    del mu, k
    return u


def sample_projection_mu0(v, mu, k):
    """z = exp_mu(PT_{mu0->mu}(v)); flat case: mu + v."""
    del k
    return mu + v


def inverse_sample_projection_mu0(z, mu, k):
    del k
    return z - mu
