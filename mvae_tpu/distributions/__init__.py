"""Distributions (L2): pure-function sampling + exact log-densities.

Reference parity (``mt/mvae/distributions/`` in oskopek/mvae [UNVERIFIED]):
WrappedNormal, RiemannianNormal, VonMisesFisher, HypersphericalUniform, and
the Euclidean diagonal normal — all reparameterized on jax.random.
"""
from . import (hyperspherical_uniform, normal, riemannian_normal,
               von_mises_fisher, wrapped_normal)

__all__ = ["normal", "wrapped_normal", "hyperspherical_uniform",
           "von_mises_fisher", "riemannian_normal"]
