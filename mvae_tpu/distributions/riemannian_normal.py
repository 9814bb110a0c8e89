"""Riemannian normal on hyperbolic space: p(z) ∝ exp(-d(mu,z)^2 / 2 sigma^2).

Capability parity with ``mt/mvae/distributions/riemannian_normal.py`` in
oskopek/mvae [UNVERIFIED] (adapted there from pvae / Mathieu et al. 2019):
the maximum-entropy isotropic density on H^n/D^n with exact normalization
and a rejection-sampled radial coordinate.

TPU-first redesign:

* The log-partition Z(sigma, c, n), the radial CDF (for implicit
  gradients), and the radial pdf are all computed by POSITIVE-INTEGRAND
  log-space Gauss-Legendre quadrature of
      w(s) = exp(-s^2/2sigma^2) (sinh(sqrt(c) s)/sqrt(c))^{n-1}
  over a mode-centered window. The classical closed form — the binomial
  expansion of sinh^{n-1} into erf/erfcx terms — is an ALTERNATING sum
  whose terms are O(1) while the integral is O((sigma sqrt(c))^{n-1}):
  at sigma*sqrt(c) ~ 0.05 (a trained posterior scale) it cancels
  catastrophically in f32 (measured: CDF ~ -9e24), which is why the
  reference needs float64 here. The quadrature form has no cancellation
  at ANY (sigma, c): every summand is positive, the logsumexp is
  max-normalized, and 64 nodes resolve the <= 24-sigma-wide window to
  beyond f32 precision. AD differentiates straight through the nodes.
* Radial sampling runs a masked ``lax.while_loop`` over TWO envelopes
  chosen per-lane by regime: a chi-envelope using sinh(x)/x <= e^{x^2/6}
  (tight as sigma*sqrt(c) -> 0, where the truncated-normal envelope's
  acceptance collapses) and Wood-style truncated-normal envelope
  sinh(x) <= e^x/2 (tight for large radius). Fixed shapes, bounded trips.
* Gradients w.r.t. (sigma, c) use IMPLICIT reparameterization
  (Figurnov et al.): dr = -(dF/dtheta)/p(r) with the quadrature radial CDF
  differentiated by AD — exact, unlike the reference's
  rejection-sampler-gradient surrogate.

Works on both hyperbolic models ('h' Lorentz and 'd' Poincare) through the
manifold descriptor's distance / mu0-frame ops.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stable

_MAX_REJECTION_ITERS = 128

# 64-point Gauss-Legendre rule mapped to [0, 1] (f64; cast per call)
_GL_X64, _GL_W64 = np.polynomial.legendre.leggauss(64)
_GL_X = (_GL_X64 + 1.0) / 2.0
_GL_W = _GL_W64 / 2.0
# half-width of the integration window in units of sigma; the integrand is
# a Gaussian-width-sigma bump, so exp(-12^2/2) ~ 2e-32 of the mass is cut
_WINDOW = 12.0


def _c_of(k):
    return jnp.maximum(-k, 1e-30)


def _log_w_radial(n: int, s, sigma, c):
    """log w(s) = -s^2/2sigma^2 + (n-1) log(sinh(sqrt(c) s)/sqrt(c)),
    the unnormalized radial density of mass (w.r.t. ds) up to S_{n-1}.
    sinh(sqrt(c) s)/sqrt(c) = s * sindiv_u(-c s^2), smooth at c s^2 -> 0."""
    return (-s * s / (2.0 * sigma * sigma)
            + (n - 1.0) * (stable.log_sindiv_u(-c * s * s)
                           + jnp.log(jnp.maximum(s, stable.tiny(s.dtype)))))


def _window(n: int, sigma, c):
    """Mode-centered integration window [lo, hi] (stop-gradient: the
    integrand vanishes at the edges, so the window's theta-dependence
    carries no derivative mass).

    The mode solves r/sigma^2 = (n-1) sqrt(c) coth(sqrt(c) r); it is
    found by 40 vectorized bisection steps (the additive two-regime
    ESTIMATE drift + chi overshoots the true mode by up to sigma*sqrt(n),
    which for n >~ 144 pushed a 12-sigma window off the density peak —
    round-2 review finding, oracle-verified at n=200)."""
    nm1 = n - 1.0
    sqc = jnp.sqrt(c)
    # upper bound: drift + chi term each bound their own regime
    hi0 = nm1 * sqc * sigma * sigma + sigma * math.sqrt(nm1 + 1.0)

    def h(r):
        # r - sigma^2 (n-1) sqrt(c) coth(sqrt(c) r); increasing in r.
        x = jnp.maximum(sqc * r, stable.tiny(r.dtype))
        coth = 1.0 / jnp.tanh(jnp.minimum(x, 40.0))
        return r - sigma * sigma * nm1 * sqc * coth

    lo_b = jnp.zeros_like(hi0) + stable.tiny(jnp.asarray(sigma).dtype)
    hi_b = hi0 + sigma

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        neg = h(m) < 0.0
        return jnp.where(neg, m, a), jnp.where(neg, b, m)

    a, b = jax.lax.fori_loop(0, 40, body, (lo_b, hi_b))
    mode = 0.5 * (a + b)
    lo = jnp.maximum(mode - _WINDOW * sigma, 0.0)
    hi = mode + _WINDOW * sigma
    return jax.lax.stop_gradient(lo), jax.lax.stop_gradient(hi)


def _log_integral(n: int, lo, hi, sigma, c):
    """log integral_lo^hi w(s) ds by GL-64, max-normalized (no over/underflow
    and no cancellation: all summands positive)."""
    dtype = jnp.asarray(sigma).dtype
    x = jnp.asarray(_GL_X, dtype)
    w = jnp.asarray(_GL_W, dtype)
    span = hi - lo
    s = lo[..., None] + span[..., None] * x
    logw = _log_w_radial(n, s, sigma[..., None], c[..., None])
    logw = logw + jnp.log(w)
    m = jnp.max(logw, axis=-1)
    total = jnp.sum(jnp.exp(logw - m[..., None]), axis=-1)
    return (m + jnp.log(jnp.maximum(total, stable.tiny(dtype)))
            + jnp.log(jnp.maximum(span, stable.tiny(dtype))))


def log_partition(n: int, sigma, k):
    """log Z(sigma, K) for the n-dimensional Riemannian normal, K < 0:
    Z = S_{n-1} integral_0^inf w(s) ds."""
    c = _c_of(k)
    sigma = jnp.asarray(sigma)
    c = c * jnp.ones_like(sigma)
    lo, hi = _window(n, sigma, c)
    log_sphere = (math.log(2.0) + (n / 2.0) * math.log(math.pi)
                  - math.lgamma(n / 2.0))
    return log_sphere + _log_integral(n, lo, hi, sigma, c)


def log_prob(man, z, mu, sigma, k):
    """Exact log-density w.r.t. the Riemannian measure; sigma shape (...)."""
    d = man.distance(mu, z, k)
    return -d * d / (2.0 * sigma * sigma) - log_partition(man.dim, sigma, k)


# --- radial CDF / pdf (quadrature, for implicit reparameterization) ----------


def _radial_cdf(n: int, r, sigma, k):
    """F(r) = integral_0^r w / integral_0^inf w in [0, 1]; the sliver of
    mass below `lo` (~e^{-72}) is dropped from both integrals."""
    c = _c_of(k) * jnp.ones_like(sigma)
    lo, hi = _window(n, sigma, c)
    m = jnp.clip(jax.lax.stop_gradient(r), lo, hi)
    log_num = _log_integral(n, lo, m, sigma, c)
    log_den = _log_integral(n, lo, hi, sigma, c)
    return jnp.exp(jnp.minimum(log_num - log_den, 0.0))


def _radial_log_pdf(n: int, r, sigma, k):
    """log of the normalized radial density p(r) = w(r) / integral w."""
    c = _c_of(k) * jnp.ones_like(sigma)
    lo, hi = _window(n, sigma, c)
    return (_log_w_radial(n, r, sigma, c)
            - _log_integral(n, lo, hi, sigma, c))


# --- rejection sampler with implicit-gradient wrapper ------------------------


def _sample_radius_raw(key, n: int, sigma, k):
    """Masked-acceptance rejection sampling of r; no gradients."""
    c = _c_of(k)
    sigma = jax.lax.stop_gradient(jnp.asarray(sigma))
    c = jax.lax.stop_gradient(c * jnp.ones_like(sigma))
    sqc = jnp.sqrt(c)
    nm1 = n - 1.0
    dtype = sigma.dtype
    shape = sigma.shape

    # envelope selection per lane: chi-envelope valid & tight when
    # sigma^2 c (n-1)/3 < 0.9
    chi_ok = sigma * sigma * c * nm1 / 3.0 < 0.9
    var_chi = sigma * sigma / jnp.maximum(1.0 - sigma * sigma * c * nm1 / 3.0,
                                          0.1)
    sig_chi = jnp.sqrt(var_chi)
    mu_tn = nm1 * sqc * sigma * sigma  # mode of the TN envelope

    def cond(state):
        i, _, _, accepted = state
        return jnp.logical_and(i < _MAX_REJECTION_ITERS,
                               jnp.logical_not(jnp.all(accepted)))

    def body(state):
        i, key, r_acc, accepted = state
        key, k_g, k_n, k_u = jax.random.split(key, 4)
        # chi proposal: r = sig_chi * sqrt(2 G), G ~ Gamma(n/2)
        gsamp = jax.random.gamma(k_g, n / 2.0, shape, dtype=dtype)
        r_chi = sig_chi * jnp.sqrt(2.0 * gsamp)
        x = sqc * r_chi
        log_acc_chi = nm1 * (stable.log_sindiv_u(-x * x) - x * x / 6.0)
        # truncated-normal proposal
        xi = jax.random.normal(k_n, shape, dtype=dtype)
        r_tn = mu_tn + sigma * xi
        x_tn = sqc * jnp.maximum(r_tn, 0.0)
        log_acc_tn = jnp.where(
            r_tn > 0.0,
            nm1 * jnp.log1p(-jnp.exp(-jnp.maximum(2.0 * x_tn, 1e-30))),
            -jnp.inf)
        r_prop = jnp.where(chi_ok, r_chi, r_tn)
        log_acc = jnp.where(chi_ok, log_acc_chi, log_acc_tn)
        u = jax.random.uniform(k_u, shape, dtype=dtype, minval=1e-12)
        ok = jnp.log(u) <= log_acc
        newly = jnp.logical_and(ok, jnp.logical_not(accepted))
        r_acc = jnp.where(newly, r_prop, r_acc)
        return i + 1, key, r_acc, jnp.logical_or(accepted, ok)

    _, _, r, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), key,
                     sigma.copy(), jnp.zeros(shape, bool)))
    return jnp.maximum(r, 1e-30)


@partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def sample_radius(key, n: int, sigma, k):
    return _sample_radius_raw(key, n, sigma, k)


@sample_radius.defjvp
def _sample_radius_jvp(key, n, primals, tangents):
    sigma, k = primals
    dsigma, dk = tangents
    r = _sample_radius_raw(key, n, sigma, k)
    r_sg = jax.lax.stop_gradient(r)
    # implicit reparameterization: dr = -(dF/dsigma dsigma + dF/dk dk)/p(r)
    _, dF = jax.jvp(lambda s, kk: _radial_cdf(n, r_sg, s, kk), (sigma, k),
                    (dsigma, jnp.asarray(dk, dtype=jnp.asarray(sigma).dtype)))
    pdf = jnp.exp(_radial_log_pdf(n, r_sg, sigma, k))
    dr = -dF / jnp.maximum(pdf, 1e-20)
    return r, dr


def sample(key, man, mu, sigma, k):
    """Draw z ~ RiemannianNormal(mu, sigma) on hyperbolic manifold `man`.

    sigma: (...) isotropic scale (the reference's scalar parametrization).
    """
    k_r, k_dir = jax.random.split(key)
    r = sample_radius(k_r, man.dim, sigma, k)
    g = jax.random.normal(k_dir, mu.shape[:-1] + (man.dim,), dtype=mu.dtype)
    direction = g / stable.safe_norm(g, keepdims=True)
    v = r[..., None] * direction
    return man.sample_projection_mu0(v, mu, k)


def sample_and_log_prob(key, man, mu, sigma, k):
    z = sample(key, man, mu, sigma, k)
    return z, log_prob(man, z, mu, sigma, k)
