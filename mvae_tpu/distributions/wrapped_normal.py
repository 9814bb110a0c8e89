"""Wrapped normal on any constant-curvature manifold (pure functions).

The paper's workhorse posterior (``mt/mvae/distributions/wrapped_normal.py``
in oskopek/mvae [UNVERIFIED]): push a tangent Gaussian at the basepoint mu0
through parallel transport to mu and the exponential map,

    v ~ N(0, sigma) in orthonormal coords of T_mu0 M
    z = exp_mu(PT_{mu0->mu}(v)).

Because every manifold in :mod:`mvae_tpu.ops` exposes mu0-frame tangents in
an ORTHONORMAL basis, the log-det-Jacobian is the single radial expression
(n-1) log(sin_k(r)/r) for all six geometries (verified against numerical
Jacobians in tests/ops/test_manifolds.py) — where the reference carries
per-manifold log-det code paths.

Positive curvature subtlety: on S^n/P^n the exponential map is periodic, so
the exact density at z sums over ALL tangent preimages (wrap images)

    q(z) = sum_b N(v_b; 0, sigma) / |det J(v_b)|,
    v_b in {(r' + mT) v_hat} ∪ {-(T - r' + mT) v_hat},  T = 2 pi R,

truncated at `wraps` extra periods (mass beyond is ~exp(-(2 pi R)^2/2sigma^2)).
For K <= 0 the extra branches carry exactly zero mass and the formula
degrades to the familiar single-branch form, smoothly in K — so the same
jitted code path serves the universal manifold as its curvature crosses
zero. The reference evaluates only the principal branch; for the small
sigmas a trained VAE uses the difference is far below the 0.1-nat target,
but the extra branches make log_prob a true density at any sigma (verified
by importance-sampled normalization in tests).

All functions take the manifold descriptor + curvature leaf explicitly; no
distribution objects, no state — jit/vmap/shard_map-ready.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import stable
from . import normal

# Wrap-branch hygiene: a wrap image's z-score (rb / sigma) must stay far
# from f32/bf16 overflow even after squaring and summing over dims, or the
# 0-weight logsumexp gradient turns into 0 * inf = NaN. Branches beyond the
# cap carry ~exp(-(rb/sigma)^2/2) ~ 0 mass, so masking them is exact.
_ZSCORE_CAP = 1e15
# curvature floor inside the period: keeps d(period)/dK finite (K^-3/2
# overflows f32 below ~5e-26); branches at the floored period are masked by
# the z-score cap anyway
_K_FLOOR = 1e-20


def _log_abs_sindiv_k(r, k):
    """log(|sin_k(r)| / r), valid for any r >= 0 (multi-branch radii)."""
    u = k * r * r
    # reuse the stable form where |u| is in its principal window; otherwise
    # fall back to log|sin(x)|/x for the spherical multi-wrap branch
    x = jnp.sqrt(jnp.maximum(u, stable.tiny(r.dtype)))
    sph = jnp.log(jnp.maximum(jnp.abs(jnp.sin(x)), stable.tiny(r.dtype))) - \
        jnp.log(jnp.maximum(x, stable.tiny(r.dtype)))
    principal = stable.log_sindiv_u(u)
    # spherical x beyond the principal window (pi) needs the |sin| form
    return jnp.where(u > jnp.pi ** 2, sph, principal)


def sample(key, man, mu, sigma, k):
    """Draw z; mu has ambient coords, sigma broadcasts against (..., n)."""
    shape = mu.shape[:-1] + (man.dim,)
    v = sigma * jax.random.normal(key, shape, dtype=mu.dtype)
    return man.sample_projection_mu0(v, mu, k)


def _log_prob_from_principal(man, v, sigma, k, wraps: int):
    """Log q from the principal-branch tangent v (orthonormal mu0 frame).

    ``wraps`` counts wrap-image PAIRS summed for K > 0: ``wraps=0`` is the
    PRINCIPAL BRANCH ONLY — exactly the reference's estimator semantics
    (``mt/mvae/distributions/wrapped_normal.py`` [UNVERIFIED] evaluates one
    preimage) — and the default ``wraps=1`` adds the nearest image in each
    direction, making log_prob the exact density at trained-regime sigma
    (truncation error bounds tested in tests/distributions)."""
    n = man.dim
    dtype = v.dtype
    zero = jnp.zeros((), dtype=dtype)

    # Manifolds whose curvature sign is pinned non-positive (e/h/d) can
    # never wrap — skip the dead image branches AT TRACE TIME (the jitted
    # product-latent step stays lean; only s/p/u pay for wrapping).
    if man.curvature_sign < 0 or man.kind == "e":
        wraps = 0
    if wraps == 0:
        r = stable.safe_norm(v)
        return normal.log_prob(v, zero, sigma) - man.logdet_exp_mu0(r, k)

    r = stable.safe_norm(v, keepdims=True)
    v_hat = v / r

    # geodesic period T = 2 pi / sqrt(K); only meaningful where K > 0
    period = (2.0 * math.pi
              / jnp.sqrt(jnp.maximum(k, _K_FLOOR))).astype(dtype)
    # smallest sigma across dims bounds the largest per-dim z-score
    sig_b = jnp.broadcast_to(sigma, v.shape)
    sig_min = jnp.min(sig_b, axis=-1, keepdims=True)

    # every branch shares the unit direction v_hat, so the n-dim Gaussian
    # term factorizes to SCALAR math in the branch radius:
    #   log N(rb v_hat; 0, sigma) = -rb^2/2 * sum((v_hat/sigma)^2) + const.
    # One n-dim pass here; each wrap image then costs a handful of scalar
    # ops (was: a full n-dim log_prob per branch — the dominant cost of
    # the s/p/u hot path, 5 branches at wraps=2).
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype
    quad = jnp.sum((v_hat / sig_b) ** 2, axis=-1, keepdims=True, dtype=acc)
    const = (-jnp.sum(jnp.log(sig_b), axis=-1, dtype=acc)
             - 0.5 * n * math.log(2.0 * math.pi))

    branches = [r]                         # principal, always live
    for m in range(1, wraps + 1):          # m-th image PAIR (signed radii)
        branches.append(r + m * period)
        branches.append(r - m * period)
    logps = []
    for i, rb_raw in enumerate(branches):
        if i == 0:
            rb, live = rb_raw, None
        else:
            # wrap images are dead for K <= 0 (universal mid-crossing) and
            # for K > 0 so small that (rb/sigma)^2 would overflow; evaluate
            # dead branches at the PRINCIPAL radius (finite, moderate — the
            # sanitized-where trick) and mask them out of the logsumexp
            live = (k > 0) & (jnp.abs(rb_raw) < _ZSCORE_CAP * sig_min)
            rb = jnp.where(live, rb_raw, r)
        rb_abs = jnp.abs(rb).squeeze(-1)
        logn = -0.5 * (rb * rb * quad).squeeze(-1).astype(acc) + const
        logdet = (n - 1) * _log_abs_sindiv_k(rb_abs, k)
        logp = logn - logdet
        if live is not None:
            logp = jnp.where(live.squeeze(-1), logp,
                             jnp.asarray(-1e30, logp.dtype))
        logps.append(logp)
    out = jax.scipy.special.logsumexp(jnp.stack(logps, axis=-1), axis=-1)
    return out


def log_prob(man, z, mu, sigma, k, wraps: int = 1):
    """Exact log-density w.r.t. the Riemannian measure."""
    v = man.inverse_sample_projection_mu0(z, mu, k)
    return _log_prob_from_principal(man, v, sigma, k, wraps)


def sample_and_log_prob(key, man, mu, sigma, k, wraps: int = 1):
    """Draw z and its log q(z) (reference ``rsample_log_prob`` semantics).

    The density is evaluated at the principal preimage of the sampled point
    (plus wrap images), i.e. exactly ``log_prob(z)`` — including when the
    sampled tangent itself wrapped past the sphere's injectivity radius.
    """
    shape = mu.shape[:-1] + (man.dim,)
    v = sigma * jax.random.normal(key, shape, dtype=mu.dtype)
    z = man.sample_projection_mu0(v, mu, k)
    v_principal = man.inverse_sample_projection_mu0(z, mu, k)
    logq = _log_prob_from_principal(man, v_principal, sigma, k, wraps)
    return z, logq


def log_prob_mu0(man, z, sigma, k, wraps: int = 1):
    """log-density of the prior WrappedNormal(mu0, sigma)."""
    v = man.log_map_mu0(z, k)
    return _log_prob_from_principal(man, v, sigma, k, wraps)
