"""Riemannian normal on hyperbolic space: p(z) ∝ exp(-d(mu,z)^2 / 2 sigma^2).

Capability parity with ``mt/mvae/distributions/riemannian_normal.py`` in
oskopek/mvae [UNVERIFIED] (adapted there from pvae / Mathieu et al. 2019):
the maximum-entropy isotropic density on H^n/D^n with exact normalization
and a rejection-sampled radial coordinate.

TPU-first redesign:

* The log-partition Z(sigma, c, n) uses the closed binomial-sum form
    Z = S_{n-1} (2 sqrt(c))^{-(n-1)} sqrt(pi/2) sigma
        * sum_j (-1)^j C(n-1,j) erfcx(-gamma_j / sqrt(2)),
  gamma_j = (n-1-2j) sqrt(c) sigma, evaluated with the overflow-free
  ``erfcx`` (no e^{gamma^2/2} blowup — the reference relies on f64 here).
* Radial sampling runs a masked ``lax.while_loop`` over TWO envelopes
  chosen per-lane by regime: a chi-envelope using sinh(x)/x <= e^{x^2/6}
  (tight as sigma*sqrt(c) -> 0, where the truncated-normal envelope's
  acceptance collapses) and Wood-style truncated-normal envelope
  sinh(x) <= e^x/2 (tight for large radius). Fixed shapes, bounded trips.
* Gradients w.r.t. (sigma, c) use IMPLICIT reparameterization
  (Figurnov et al.): dr = -(dF/dtheta)/p(r) with the closed-form radial CDF
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
from jax.scipy.special import gammaln

from ..ops import stable
from ..utils.special import erfcx

_MAX_REJECTION_ITERS = 128


def _c_of(k):
    return jnp.maximum(-k, 1e-30)


def _log_binom(n: int, j):
    return (gammaln(jnp.asarray(float(n + 1)))
            - gammaln(j + 1.0) - gammaln(n - j + 1.0))


def _signed_sum_terms(n: int, log_mag, sign):
    """Stable signed logsumexp: returns log(sum_j sign_j * exp(log_mag_j))."""
    m = jnp.max(log_mag, axis=-1, keepdims=True)
    total = jnp.sum(sign * jnp.exp(log_mag - m), axis=-1)
    return m.squeeze(-1) + jnp.log(jnp.maximum(total, 1e-30))


def log_partition(n: int, sigma, k):
    """log Z(sigma, K) for the n-dimensional Riemannian normal, K < 0."""
    c = _c_of(k)
    sigma = jnp.asarray(sigma)
    sqc = jnp.sqrt(c)
    j = jnp.arange(n, dtype=sigma.dtype)  # j = 0..n-1
    gamma_j = (n - 1.0 - 2.0 * j) * sqc[..., None] * sigma[..., None]
    log_mag = (_log_binom(n - 1, j)
               + jnp.log(erfcx(-gamma_j / math.sqrt(2.0))))
    sign = jnp.where(j % 2 == 0, 1.0, -1.0)
    log_sum = _signed_sum_terms(n, log_mag, sign)
    log_sphere = (math.log(2.0) + (n / 2.0) * math.log(math.pi)
                  - math.lgamma(n / 2.0))
    return (log_sphere - (n - 1.0) * jnp.log(2.0 * sqc)
            + 0.5 * math.log(math.pi / 2.0) + jnp.log(sigma) + log_sum)


def log_prob(man, z, mu, sigma, k):
    """Exact log-density w.r.t. the Riemannian measure; sigma shape (...)."""
    d = man.distance(mu, z, k)
    return -d * d / (2.0 * sigma * sigma) - log_partition(man.dim, sigma, k)


# --- radial CDF (closed form, for implicit reparameterization) --------------


def _radial_unnorm_integral(n: int, r, sigma, k):
    """integral_0^r e^{-s^2/2sigma^2} sinh(sqrt(c) s)^{n-1} ds, scaled by
    2^{n-1}: equals sum_j (-1)^j C(n-1,j) T_j(r) with
    T_j = sqrt(pi/2) sigma e^{g^2/2} [erf((r - g sigma)/(sqrt2 sigma)) + erf(g/sqrt2)],
    g = gamma_j / sigma ... here gamma_j = beta_j * sigma."""
    c = _c_of(k)
    sqc = jnp.sqrt(c)
    j = jnp.arange(n, dtype=sigma.dtype)
    beta_j = (n - 1.0 - 2.0 * j) * sqc[..., None]
    g = beta_j * sigma[..., None]  # gamma_j
    rr = r[..., None]
    ss = sigma[..., None]
    # e^{g^2/2} * [erf((r - beta sigma^2)/(sqrt2 sigma)) + erf(g/sqrt2)]
    # expressed overflow-free with erfcx where the exponential is large:
    a = (rr - beta_j * ss * ss) / (math.sqrt(2.0) * ss)
    b = g / math.sqrt(2.0)
    # erf(a) + erf(b) = erfcx(-b) e^{-b^2} - erfcx(a) e^{-a^2}  ... times e^{g^2/2}
    # e^{g^2/2} = e^{b^2}; so term = erfcx(-b) - erfcx(a) e^{b^2 - a^2}
    expo = jnp.exp(jnp.minimum(b * b - a * a, 80.0))
    term = erfcx(-b) - erfcx(a) * expo
    term = jnp.maximum(term, 0.0)
    pref = math.sqrt(math.pi / 2.0) * ss
    sign = jnp.where(j % 2 == 0, 1.0, -1.0)
    lb = _log_binom(n - 1, j)
    vals = sign * jnp.exp(lb) * pref * term
    return jnp.sum(vals, axis=-1)


def _radial_cdf(n: int, r, sigma, k):
    num = _radial_unnorm_integral(n, r, sigma, k)
    den = _radial_unnorm_integral(
        n, jnp.full_like(r, 1e6) * jnp.ones_like(sigma), sigma, k)
    return num / jnp.maximum(den, 1e-30)


def _radial_log_pdf(n: int, r, sigma, k):
    """log of the normalized radial density p(r)."""
    c = _c_of(k)
    x = jnp.sqrt(c) * r
    log_unnorm = (-r * r / (2.0 * sigma * sigma)
                  + (n - 1.0) * (stable.log_sindiv_u(-x * x) + jnp.log(
                      jnp.maximum(r, 1e-30))))
    # log integral of e^{-s^2/2s^2} sinh^{n-1}/ ... : reuse partition pieces
    den = _radial_unnorm_integral(
        n, jnp.full_like(r, 1e6), sigma, k)
    # _radial_unnorm_integral carries the 2^{n-1}-scaled sinh expansion of
    # (2 sinh)^{n-1}; the true integral of sinh^{n-1} is den / 2^{n-1}
    log_den = jnp.log(jnp.maximum(den, 1e-30)) - (n - 1.0) * math.log(2.0)
    # unnorm above uses sinh(x)^{n-1} = (x * sindiv * ...) reconstruct:
    # sinh(x) = x * sindiv_u(-x^2) => log sinh = log x + log_sindiv
    # we wrote (n-1)(log_sindiv + log r) but need (n-1) log sinh(x) =
    # (n-1)(log_sindiv(-x^2) + log x); log x = log(sqrt(c) r)
    corr = (n - 1.0) * 0.5 * jnp.log(c)
    return log_unnorm + corr - log_den


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
