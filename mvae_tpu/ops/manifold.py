"""Manifold descriptor + static dispatch over the geometry modules.

TPU-native replacement for the reference's ``Manifold`` class hierarchy
(``mt/mvae/ops/manifold.py`` in oskopek/mvae [UNVERIFIED — LOW CONF
filename]). The reference makes manifolds stateful ``nn.Module``s owning a
curvature ``nn.Parameter``; here a :class:`Manifold` is a *static, hashable*
descriptor (kind + latent dim) and curvature is an ordinary pytree leaf
passed at call time. Static kind => dispatch resolves at trace time, so a
product of heterogeneous components compiles into one fused XLA program with
zero Python in the hot path.

Curvature parameterization: components store an unconstrained scalar
``c_param``; :meth:`Manifold.curvature` maps it to K with the right sign —
``K = sign * exp(c_param)`` for sign-pinned manifolds (never crosses zero,
well-scaled gradients: dK/dc = K) and ``K = c_param`` for the universal
manifold (crossing zero is the point). The reference's burn-in freeze of
curvature is an optimizer-side mask (see mvae_tpu.train).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from . import euclidean, lorentz, poincare, sphere, spherical_projected, universal

_MODULES = {
    "e": euclidean,
    "h": lorentz,
    "d": poincare,
    "s": sphere,
    "p": spherical_projected,
    "u": universal,
}

KINDS = tuple(_MODULES)

FULL_NAMES = {
    "e": "Euclidean",
    "h": "Hyperboloid (Lorentz)",
    "d": "Poincare ball",
    "s": "Hypersphere",
    "p": "Projected sphere",
    "u": "Universal (kappa-stereographic)",
}


@dataclasses.dataclass(frozen=True)
class Manifold:
    """Static descriptor of one constant-curvature factor.

    kind: one of 'e','h','d','s','p','u' (the reference's spec-DSL letters).
    dim:  intrinsic latent dimension n.
    """

    kind: str
    dim: int

    def __post_init__(self):
        if self.kind not in _MODULES:
            raise ValueError(f"unknown manifold kind {self.kind!r}; "
                             f"expected one of {sorted(_MODULES)}")
        if self.dim < 1:
            raise ValueError(f"manifold dim must be >= 1, got {self.dim}")

    # --- static structure ---------------------------------------------------

    @property
    def ops(self):
        return _MODULES[self.kind]

    @property
    def ambient_dim(self) -> int:
        """Coordinate size of a point (n+1 for embedded h/s, n otherwise)."""
        return self.ops.ambient_dim(self.dim)

    @property
    def curvature_sign(self) -> int:
        return self.ops.CURVATURE_SIGN

    @property
    def has_curvature_param(self) -> bool:
        """Euclidean has no curvature degree of freedom."""
        return self.kind != "e"

    # --- curvature parameterization -----------------------------------------

    def curvature(self, c_param):
        """Unconstrained parameter -> sectional curvature K."""
        if self.kind == "e":
            return jnp.zeros_like(c_param)
        if self.kind == "u":
            return c_param
        sign = float(self.curvature_sign)
        return sign * jnp.exp(c_param)

    def init_curvature_param(self, init_k: float = 1.0, dtype=jnp.float32):
        """Inverse of :meth:`curvature` at |K| = init_k (sign from kind)."""
        if self.kind == "u":
            return jnp.asarray(init_k, dtype=dtype)
        return jnp.asarray(math.log(abs(init_k)), dtype=dtype)

    # --- dispatched geometry (k = sectional curvature, traced scalar) -------

    def mu0(self, k, dtype=jnp.float32):
        return self.ops.mu0(self.dim, k, dtype)

    def project(self, x, k):
        return self.ops.project(x, k)

    def distance(self, x, y, k):
        return self.ops.distance(x, y, k)

    def exp_map(self, x, u, k):
        return self.ops.exp_map(x, u, k)

    def log_map(self, x, y, k):
        return self.ops.log_map(x, y, k)

    def parallel_transport(self, x, y, u, k):
        return self.ops.parallel_transport(x, y, u, k)

    def exp_map_mu0(self, v, k):
        return self.ops.exp_map_mu0(v, k)

    def log_map_mu0(self, z, k):
        return self.ops.log_map_mu0(z, k)

    def transp_mu0(self, mu, v, k):
        return self.ops.transp_mu0(mu, v, k)

    def inv_transp_mu0(self, mu, u, k):
        return self.ops.inv_transp_mu0(mu, u, k)

    def sample_projection_mu0(self, v, mu, k):
        return self.ops.sample_projection_mu0(v, mu, k)

    def inverse_sample_projection_mu0(self, z, mu, k):
        return self.ops.inverse_sample_projection_mu0(z, mu, k)

    def logdet_exp_mu0(self, r, k):
        """log |det d(PT∘exp)| at radial distance r: (n-1) log(sin_k(r)/r).

        Uniform across all constant-curvature manifolds because mu0-frame
        tangents are orthonormal by construction (see module docstrings).
        This is the wrapped-normal log-det-Jacobian term.
        """
        from . import stable
        return (self.dim - 1) * stable.log_sin_k_div(r, k)
