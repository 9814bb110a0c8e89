"""Poincare ball D^n_K (K < 0): gyrovector API over the stereographic core.

Capability parity with the reference's ``mt/mvae/ops/poincare.py``
(oskopek/mvae [UNVERIFIED]): mobius_add / mobius_scalar_mul / gyration /
lambda_x, expmap/logmap at x and at mu0, atanh-based distance, parallel
transport, ball projection, and the Lorentz<->Poincare isometry pair.

All math lives in :mod:`mvae_tpu.ops.stereographic` (one smooth-in-K
implementation for ball / projected-sphere / universal); this module pins the
curvature sign and re-exports, so the Poincare component and the reference's
per-manifold test skeleton have a first-class home.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable, stereographic
from .lorentz import lorentz_to_poincare, poincare_to_lorentz  # noqa: F401 (API parity)

KIND = "d"
CURVATURE_SIGN = -1

ambient_dim = stereographic.ambient_dim
mu0 = stereographic.mu0


def _k(k):
    """Clamp K strictly negative (ball model requires K < 0)."""
    return jnp.minimum(k, -stable.tiny(jnp.asarray(k).dtype))


def _wrap(fn):
    def wrapped(*args):
        *rest, k = args
        return fn(*rest, _k(k))
    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


lambda_x = _wrap(stereographic.lambda_x)
project = _wrap(stereographic.project)
mobius_add = _wrap(stereographic.mobius_add)
mobius_scalar_mul = _wrap(stereographic.mobius_scalar_mul)
gyration = _wrap(stereographic.gyration)
distance = _wrap(stereographic.distance)
exp_map = _wrap(stereographic.exp_map)
log_map = _wrap(stereographic.log_map)
parallel_transport = _wrap(stereographic.parallel_transport)
exp_map_mu0 = _wrap(stereographic.exp_map_mu0)
log_map_mu0 = _wrap(stereographic.log_map_mu0)
transp_mu0 = _wrap(stereographic.transp_mu0)
inv_transp_mu0 = _wrap(stereographic.inv_transp_mu0)
sample_projection_mu0 = _wrap(stereographic.sample_projection_mu0)
inverse_sample_projection_mu0 = _wrap(
    stereographic.inverse_sample_projection_mu0)
