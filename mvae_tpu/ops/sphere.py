"""Embedded hypersphere S^n_K (K > 0) as pure functions.

Capability parity with the reference's spherical module
(``mt/mvae/ops/spherical.py`` in oskopek/mvae [UNVERIFIED]): expmap/logmap
at arbitrary basepoints and at mu0, parallel transport, great-circle
distance, on-sphere projection, and the sphere <-> projected-sphere
(stereographic) isometry.

TPU-first numerics: the great-circle distance is computed as
``2R asin(|y-x| / 2R)`` from the chord — stable where ``acos(<x,y>/R^2)``
loses all digits (nearby points, the posterior-sampling regime). Trig ratios
ride the analytic series of ``stable.sindiv_u``/``cos_u`` so maps are smooth
at u = 0 under AD.

Points live in ambient R^{n+1} with |x| = R = 1/sqrt(K). Orthonormal tangent
coordinates at mu0 = (R, 0, ..., 0) are the last n ambient coordinates.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import stable

KIND = "s"
CURVATURE_SIGN = 1


def ambient_dim(dim: int) -> int:
    return dim + 1


def _kk(k):
    """K > 0, clamped away from 0 (embedded sphere requires K > 0)."""
    return jnp.maximum(k, stable.tiny(jnp.asarray(k).dtype))


def mu0(dim: int, k, dtype) -> jnp.ndarray:
    r = 1.0 / jnp.sqrt(_kk(k))
    return jnp.concatenate(
        [jnp.reshape(r, (1,)).astype(dtype), jnp.zeros((dim,), dtype=dtype)])


def project(x, k):
    """Renormalize onto the sphere of radius R."""
    r = 1.0 / jnp.sqrt(_kk(k))
    return x * (r / stable.safe_norm(x, keepdims=True))


def project_tangent(x, u, k):
    """Remove the radial component: u - <x,u> x / R^2."""
    kk = _kk(k)
    return u - kk * jnp.sum(x * u, axis=-1, keepdims=True) * x


def _chord_sq(x, y):
    d = y - x
    return jnp.sum(d * d, axis=-1, keepdims=True)


def distance(x, y, k):
    """d = 2R asin(|y - x| / (2R)) — chord form, exact and stable."""
    kk = _kk(k)
    half_chord = jnp.sqrt(
        _chord_sq(x, y) + stable.tiny(x.dtype)).squeeze(-1) / 2.0
    # arcsin_k(y, K) = asin(sqrt(K) y)/sqrt(K); clamp inside domain
    e = stable.eps(x.dtype)
    half_chord = jnp.minimum(half_chord, (1.0 - e) / jnp.sqrt(kk))
    return 2.0 * stable.arcsin_k(half_chord, kk)


def exp_map(x, u, k):
    """exp_x(u) = cos(theta) x + sindiv(theta) u, theta = sqrt(K)|u|."""
    kk = _kk(k)
    usq = jnp.sum(u * u, axis=-1, keepdims=True)
    t = kk * usq
    z = stable.cos_u(t) * x + stable.sindiv_u(t) * u
    return project(z, k)


def log_map(x, y, k):
    """Inverse of exp_x; stable as y -> x. Singular at the antipode
    (measure zero); bounded there.

    The result's magnitude is enforced to be EXACTLY the geodesic distance
    by normalizing the tangent direction, |v| = d * |u_dir|/|u_dir| <= d.
    The previous ratio form d*sqrt(K)/sin(theta) * u_dir multiplied two
    ill-conditioned near-zero factors; one f32 rounding near the antipode
    (where u_dir -> 0 AND sin(theta) -> 0) produced |v| ~ 1e4 R and a
    -1e8-scale garbage wrapped-normal log_q that training then exploited
    as free ELBO (round-2 s6:wrapped blowup on TPU)."""
    kk = _kk(k)
    alpha = 1.0 - kk * _chord_sq(x, y) / 2.0  # cos(theta)
    u_dir = y - alpha * x
    d = distance(x, y, k)[..., None]
    # as y -> x: u_dir = (y-x) + O(chord^2), safe_norm well-conditioned;
    # at the exact antipode u_dir ~ 0 and v degrades to ~0 (any bounded
    # value is acceptable at this measure-zero singularity)
    return d * u_dir / stable.safe_norm(u_dir, keepdims=True)


def parallel_transport(x, y, u, k):
    """PT along the minimizing geodesic x -> y (x != -y):
    u - K<y,u>/(1+alpha) (x+y).

    PT is an isometry, so the output norm is pinned to the input norm; near
    the antipode the guarded 0/0 form above can otherwise amplify rounding
    into an arbitrarily long (or short) vector."""
    kk = _kk(k)
    alpha = 1.0 - kk * _chord_sq(x, y) / 2.0
    denom = jnp.maximum(1.0 + alpha, stable.eps(x.dtype))
    coef = kk * jnp.sum(y * u, axis=-1, keepdims=True) / denom
    w = u - coef * (x + y)
    return w * (stable.safe_norm(u, keepdims=True)
                / stable.safe_norm(w, keepdims=True))


# --- mu0-frame operations (wrapped-normal support) ---------------------------


def _embed(v):
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
    base = mu0(v.shape[-1], k, v.dtype)
    return parallel_transport(jnp.broadcast_to(base, mu.shape), mu,
                              _embed(v), k)


def inv_transp_mu0(mu, u, k):
    base = mu0(mu.shape[-1] - 1, k, mu.dtype)
    v = parallel_transport(mu, jnp.broadcast_to(base, mu.shape), u, k)
    return v[..., 1:]


def sample_projection_mu0(v, mu, k):
    return exp_map(mu, transp_mu0(mu, v, k), k)


def inverse_sample_projection_mu0(z, mu, k):
    return inv_transp_mu0(mu, log_map(mu, z, k), k)


# --- isometries --------------------------------------------------------------


def sphere_to_projected(x, k):
    """S^n_K ambient -> stereographic coords (projection from -mu0).

    The projection point -mu0 itself maps to infinity; guard the
    denominator so a (measure-zero) antipodal input yields a huge finite
    coordinate instead of inf/NaN under AD."""
    kk = _kk(k)
    den = 1.0 + jnp.sqrt(kk) * x[..., :1]
    return x[..., 1:] / jnp.maximum(den, stable.eps(x.dtype))


def projected_to_sphere(p, k):
    kk = _kk(k)
    psq = jnp.sum(p * p, axis=-1, keepdims=True)
    denom = 1.0 + kk * psq
    x0 = (1.0 - kk * psq) / (denom * jnp.sqrt(kk))
    return jnp.concatenate([x0, 2.0 * p / denom], axis=-1)
