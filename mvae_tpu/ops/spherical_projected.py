"""Stereographically projected sphere P^n_K (K > 0) over the shared core.

Capability parity with the reference's projected-sphere module
(``mt/mvae/ops/spherical_projected.py`` in oskopek/mvae [UNVERIFIED — filename
LOW CONF]): positive-curvature Mobius gyrovector ops (the gyro "dual" of the
Poincare ball), atan-based distance, expmap/logmap, transports, and the
sphere <-> projected-sphere isometry pair.

Math lives in :mod:`mvae_tpu.ops.stereographic`; this module pins K > 0.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable, stereographic
from .sphere import sphere_to_projected, projected_to_sphere  # noqa: F401 (API parity)

KIND = "p"
CURVATURE_SIGN = 1

ambient_dim = stereographic.ambient_dim
mu0 = stereographic.mu0


def _k(k):
    """Clamp K strictly positive."""
    return jnp.maximum(k, stable.tiny(jnp.asarray(k).dtype))


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
