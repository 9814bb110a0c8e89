"""kappa-stereographic gyrovector core: one implementation, any curvature.

This single module is the TPU-native backend for THREE of the reference's
manifolds (oskopek/mvae [UNVERIFIED paths]):

* ``mt/mvae/ops/poincare.py``            — Poincare ball, K < 0
* ``mt/mvae/ops/spherical_projected.py`` — projected sphere, K > 0
* ``mt/mvae/ops/universal.py``           — sign-agnostic universal space

The reference keeps separate tanh-based (ball) and tan-based (projected)
code paths plus a third interpolating one; here all trig goes through the
analytic-in-``u = K r^2`` series of ``mvae_tpu.ops.stable``, so every formula
below is a single smooth expression valid for K < 0, K = 0 and K > 0 — which
is precisely what lets the universal component's curvature cross zero during
training with finite values and gradients (reference behavior per
SURVEY.md §3.5), with no Python branching under jit.

Points are coordinates x in R^n with K|x|^2 > -1 (the ball of radius
1/sqrt(-K) when K < 0; all of R^n when K >= 0). The metric is conformal:
g_x = lambda_x^2 * I with lambda_x = 2 / (1 + K|x|^2).

Orthonormal tangent coordinates at mu0 = 0 are v = lambda_0 * v_coord
= 2 v_coord; all mu0-frame functions below take/return that orthonormal v,
so the wrapped-normal log-det stays the uniform radial expression shared by
every manifold in this package.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable

KIND = "m"  # generic kappa-stereographic; wrappers specialize d/p/u
CURVATURE_SIGN = 0  # any


def ambient_dim(dim: int) -> int:
    return dim


def mu0(dim: int, k, dtype) -> jnp.ndarray:
    del k
    return jnp.zeros((dim,), dtype=dtype)


def _dot(x, y):
    return jnp.sum(x * y, axis=-1, keepdims=True)


def lambda_x(x, k, keepdims: bool = True):
    """Conformal factor lambda_x = 2 / (1 + K|x|^2), clamped positive."""
    den = 1.0 + k * _dot(x, x)
    den = jnp.maximum(den, stable.eps(x.dtype))
    out = 2.0 / den
    return out if keepdims else out.squeeze(-1)


def project(x, k):
    """For K < 0 clamp into the open ball of radius (1-eps)/sqrt(-K); for
    K >= 0 the coordinate space is all of R^n. Smooth in K via masking."""
    e = stable.eps(x.dtype)
    norm = stable.safe_norm(x, keepdims=True)
    # max allowed norm when K < 0; +inf otherwise (encoded via where)
    neg_k = jnp.minimum(k, -stable.tiny(jnp.asarray(k).dtype))
    max_norm = (1.0 - e) / jnp.sqrt(-neg_k)
    scale = jnp.where(k < 0, jnp.minimum(1.0, max_norm / norm), 1.0)
    return x * scale


def mobius_add(x, y, k):
    """Mobius gyrovector addition x (+)_K y (Euclidean + at K = 0)."""
    x2 = _dot(x, x)
    y2 = _dot(y, y)
    xy = _dot(x, y)
    num = (1.0 - 2.0 * k * xy - k * y2) * x + (1.0 + k * x2) * y
    den = 1.0 - 2.0 * k * xy + k * k * x2 * y2
    # den -> 0 only at the K>0 antipode / K<0 boundary (measure zero)
    den = jnp.where(jnp.abs(den) < stable.eps(x.dtype),
                    stable.eps(x.dtype), den)
    return num / den


def mobius_scalar_mul(r, x, k):
    """r (*)_K x = tan_k(r * arctan_k(|x|)) * x/|x| (gyro scalar multiple)."""
    xn = stable.safe_norm(x, keepdims=True)
    t = stable.arctan_k(xn, k)
    return stable.tan_k(r * t, k) * x / xn


def gyration(a, b, v, k):
    """gyr[a,b]v = (-(a+b)) (+) (a (+) (b (+) v)) — the gyrogroup rotation."""
    ab = mobius_add(a, b, k)
    bv = mobius_add(b, v, k)
    return mobius_add(-ab, mobius_add(a, bv, k), k)


def distance(x, y, k):
    """d(x,y) = 2 arctan_k(|(-x) (+) y|); 2|y-x| at K = 0 (the conformal
    factor 2 at the origin is part of the metric, not a convention bug)."""
    w = mobius_add(-x, y, k)
    wsq = jnp.sum(w * w, axis=-1)
    # |w| * arctandiv(K |w|^2) == arctan_k(|w|, k), with no norm division
    return 2.0 * jnp.sqrt(wsq + stable.tiny(x.dtype)) * stable.arctandiv_u(
        k * wsq)


# --- exp/log at arbitrary basepoints -----------------------------------------


def exp_map(x, u, k):
    """exp_x(u) for coordinate tangent u: x (+) tan_k(lambda_x |u| / 2) u_hat.

    Written norm-division-free via tandiv so it is smooth at u = 0.
    """
    lam = lambda_x(x, k)
    usq = _dot(u, u)
    half = lam / 2.0
    # tan_k(half*|u|) * u_hat = half * tandiv_u(K half^2 |u|^2) * u
    g = half * stable.tandiv_u(k * half * half * usq)
    return project(mobius_add(x, g * u, k), k)


def log_map(x, y, k):
    """Inverse of exp_x: (2/lambda_x) arctan_k(|w|) w_hat, w = (-x) (+) y."""
    w = mobius_add(-x, y, k)
    wsq = _dot(w, w)
    lam = lambda_x(x, k)
    g = (2.0 / lam) * stable.arctandiv_u(k * wsq)
    return g * w


def parallel_transport(x, y, u, k):
    """PT_{x->y}(u) = (lambda_x / lambda_y) gyr[y, -x] u."""
    return (lambda_x(x, k) / lambda_x(y, k)) * gyration(y, -x, u, k)


# --- mu0-frame operations (wrapped-normal support) ---------------------------
# v below is in ORTHONORMAL coordinates at mu0 = 0 (v = 2 * v_coord).


def exp_map_mu0(v, k):
    """exp_0 of orthonormal v: tan_k(|v|/2) v_hat = (1/2) tandiv(...) v."""
    vsq = _dot(v, v)
    g = 0.5 * stable.tandiv_u(k * vsq / 4.0)
    return project(g * v, k)


def log_map_mu0(z, k):
    """Inverse: v = 2 arctan_k(|z|) z_hat = 2 arctandiv(K|z|^2) z."""
    zsq = _dot(z, z)
    return 2.0 * stable.arctandiv_u(k * zsq) * z


def transp_mu0(mu, v, k):
    """PT_{0->mu} of orthonormal v, as a coordinate tangent at mu.

    gyr[mu, 0] = id, so transport is the pure conformal rescale
    (lambda_0/lambda_mu) v_coord = v / lambda_mu.
    """
    return v / lambda_x(mu, k)


def inv_transp_mu0(mu, u, k):
    return u * lambda_x(mu, k)


def sample_projection_mu0(v, mu, k):
    """exp_mu(PT_{0->mu}(v)) == mu (+)_K exp_0(v) (gyro identity; one
    mobius_add instead of transport + general expmap)."""
    return project(mobius_add(mu, exp_map_mu0(v, k), k), k)


def inverse_sample_projection_mu0(z, mu, k):
    return log_map_mu0(mobius_add(-mu, z, k), k)
