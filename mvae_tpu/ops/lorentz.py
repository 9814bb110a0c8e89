"""Lorentz-hyperboloid model H^n_K (K < 0) as pure functions.

Capability parity with the reference's hyperboloid module
(``mt/mvae/ops/hyperbolics.py`` in oskopek/mvae [UNVERIFIED]): Lorentz inner
product, expmap/logmap at arbitrary basepoints and at mu0, parallel transport
mu0<->mu, acosh geodesic distance, on-manifold projection, and the
Lorentz<->Poincare isometry.

TPU-first numerics (the reference needed a float64 flag; we don't):

* ``alpha - 1 = -<x,y>_L/R^2 - 1`` is computed as ``c*|y-x|_L^2 / 2`` from the
  *difference* vector — no catastrophic cancellation for nearby points, which
  is exactly the regime the VAE hits (posterior samples near their mean).
* ``acosh`` only ever appears as ``acosh(1+e)`` via ``stable.acosh_1p``.
* cosh/sinh-ratios go through the analytic-in-``u`` series of
  ``stable.sindiv_u`` / ``stable.cos_u`` so exp/log maps are smooth at u = 0
  with finite gradients.

Points live in ambient R^{n+1} with <x,x>_L = -R^2, x_0 > 0, R = 1/sqrt(-K).
Orthonormal tangent coordinates at mu0 = (R, 0, ..., 0) are the last n ambient
coordinates (the Lorentz metric restricted there is Euclidean), which makes
the wrapped-normal log-det term the uniform radial expression
``(n-1) * log(sin_k(r)/r)`` shared by every manifold in this package.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable

KIND = "h"
CURVATURE_SIGN = -1


def ambient_dim(dim: int) -> int:
    return dim + 1


def _c(k):
    """c = -K > 0, clamped away from 0 (Lorentz model requires K < 0)."""
    return jnp.maximum(-k, stable.tiny(jnp.asarray(k).dtype))


def lorentz_product(x, y, keepdims: bool = False):
    """Minkowski inner product <x,y>_L = -x0*y0 + sum_i xi*yi."""
    spatial = jnp.sum(x[..., 1:] * y[..., 1:], axis=-1, keepdims=keepdims)
    time = x[..., :1] * y[..., :1] if keepdims else x[..., 0] * y[..., 0]
    return spatial - time


def mu0(dim: int, k, dtype) -> jnp.ndarray:
    r = 1.0 / jnp.sqrt(_c(k))
    return jnp.concatenate(
        [jnp.reshape(r, (1,)).astype(dtype), jnp.zeros((dim,), dtype=dtype)])


def project(x, k):
    """Recompute x0 from the spatial part so <x,x>_L = -R^2 exactly."""
    c = _c(k)
    spatial = x[..., 1:]
    x0 = jnp.sqrt(1.0 / c + jnp.sum(spatial * spatial, axis=-1, keepdims=True))
    return jnp.concatenate([x0, spatial], axis=-1)


def project_tangent(x, u, k):
    """Project u onto the tangent space at x: u + c<x,u>_L x."""
    c = _c(k)
    return u + c * lorentz_product(x, u, keepdims=True) * x


def _alpha_m1(x, y, k):
    """alpha - 1 where alpha = -c <x,y>_L, via the stable difference form."""
    d = y - x
    return jnp.maximum(_c(k) * lorentz_product(d, d, keepdims=True), 0.0) / 2.0


def distance(x, y, k):
    # tiny guard keeps the gradient finite at x == y (distance is |.|-like
    # non-differentiable there; we clamp rather than NaN, as everywhere else)
    e = _alpha_m1(x, y, k).squeeze(-1) + stable.tiny(x.dtype)
    return stable.acosh_1p(e) / jnp.sqrt(_c(k))


def exp_map(x, u, k):
    """exp_x(u) = cosh(theta) x + sinhdiv(theta) u, theta = sqrt(c)|u|_L."""
    c = _c(k)
    usq = jnp.maximum(lorentz_product(u, u, keepdims=True), 0.0)
    t = -c * usq  # u-argument for the analytic series (negative => sinh/cosh)
    z = stable.cos_u(t) * x + stable.sindiv_u(t) * u
    return project(z, k)


def log_map(x, y, k):
    """Inverse of exp_x; stable as y -> x (ratio -> 1 smoothly)."""
    e = _alpha_m1(x, y, k)
    u_dir = y - (1.0 + e) * x
    s = jnp.sqrt(e * (e + 2.0) + stable.tiny(x.dtype))
    ratio = jnp.log1p(e + s) / s  # acosh(1+e)/sqrt(e(e+2)), -> 1 at e -> 0
    return ratio * u_dir


def parallel_transport(x, y, u, k):
    """PT along the geodesic x -> y: u + c<y,u>_L/(2+e) (x+y)."""
    c = _c(k)
    e = _alpha_m1(x, y, k)
    coef = c * lorentz_product(y, u, keepdims=True) / (2.0 + e)
    return u + coef * (x + y)


# --- mu0-frame operations (wrapped-normal support) ---------------------------


def _embed(v):
    """Orthonormal tangent coords at mu0 -> ambient: v -> (0, v)."""
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)


def exp_map_mu0(v, k):
    base = mu0(v.shape[-1], k, v.dtype)
    return exp_map(jnp.broadcast_to(base, v.shape[:-1] + base.shape),
                   _embed(v), k)


def log_map_mu0(z, k):
    base = mu0(z.shape[-1] - 1, k, z.dtype)
    u = log_map(jnp.broadcast_to(base, z.shape), z, k)
    return u[..., 1:]


def transp_mu0(mu, v, k):
    """PT_{mu0 -> mu} of orthonormal coords v; returns ambient tangent."""
    base = mu0(v.shape[-1], k, v.dtype)
    return parallel_transport(jnp.broadcast_to(base, mu.shape), mu,
                              _embed(v), k)


def inv_transp_mu0(mu, u, k):
    base = mu0(mu.shape[-1] - 1, k, mu.dtype)
    v = parallel_transport(mu, jnp.broadcast_to(base, mu.shape), u, k)
    return v[..., 1:]


def sample_projection_mu0(v, mu, k):
    """z = exp_mu(PT_{mu0->mu}(embed v)): the wrapped-normal push-forward."""
    return exp_map(mu, transp_mu0(mu, v, k), k)


def inverse_sample_projection_mu0(z, mu, k):
    return inv_transp_mu0(mu, log_map(mu, z, k), k)


# --- isometries --------------------------------------------------------------


def lorentz_to_poincare(x, k):
    """H^n_K (ambient R^{n+1}) -> Poincare ball coords (R^n), same K."""
    c = _c(k)
    return x[..., 1:] / (1.0 + jnp.sqrt(c) * x[..., :1])


def poincare_to_lorentz(p, k):
    """Poincare ball coords -> hyperboloid ambient coords, same K."""
    c = _c(k)
    psq = jnp.sum(p * p, axis=-1, keepdims=True)
    denom = jnp.maximum(1.0 - c * psq, stable.eps(p.dtype))
    x0 = (1.0 + c * psq) / (denom * jnp.sqrt(c))
    return jnp.concatenate([x0, 2.0 * p / denom], axis=-1)
