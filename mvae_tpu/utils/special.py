"""Special functions missing from jax.scipy.special, f32-safe.

* ``log_ive(nu, x)`` — log of the exponentially-scaled modified Bessel
  function log(I_nu(x) e^{-x}), for nu >= 0 (integer or half-integer; any
  real works), x >= 0. Three branches: power series in log-space below the
  switch point x = 40 (any nu); Hankel asymptotic above for nu <= 8; and a
  uniform (Debye) large-order asymptotic through u_4 above for nu > 8 —
  the plain Hankel series diverges near the switch once nu is large
  (ADVICE r4: +1.44 nats at nu=15.5, x=41), while the Debye form is valid
  uniformly in x/nu. Accurate to ~1e-6 relative across nu <= ~16
  (vMF latents up to dim 32, which is the fused-tail cap), verified vs
  scipy ``ive`` in tests/ops/test_special.py.
  (The reference uses scipy's ``ive`` on CPU; TPU needs a jit-able form.)
* ``erfcx(x)`` — scaled complementary error function e^{x^2} erfc(x),
  overflow-free for the Riemannian-normal log-partition sums.

Everything is smooth under AD (branch blending via the where-trick).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc, gammaln, logsumexp

_SERIES_TERMS = 64
_SWITCH_X = 40.0


def _log_ive_series(nu, x):
    """logsumexp over the ascending series of I_nu, minus x (scaling)."""
    x = jnp.maximum(x, 1e-30)
    j = jnp.arange(_SERIES_TERMS, dtype=x.dtype)
    shape = x.shape + (1,)
    xj = jnp.reshape(x, shape)
    log_half_x = jnp.log(xj / 2.0)
    terms = ((nu + 2.0 * j) * log_half_x
             - gammaln(j + 1.0) - gammaln(nu + j + 1.0))
    return logsumexp(terms, axis=-1) - x


def _log_ive_asymptotic(nu, x):
    """Hankel expansion: I_nu(x) e^{-x} ~ (2 pi x)^{-1/2} * sum_k a_k."""
    mu = 4.0 * nu * nu
    inv8x = 1.0 / (8.0 * jnp.maximum(x, 1.0))
    # a_0 = 1; a_k = -a_{k-1} * (mu - (2k-1)^2) / k * inv8x
    s = jnp.ones_like(x)
    a = jnp.ones_like(x)
    for kk in range(1, 7):
        a = -a * (mu - (2.0 * kk - 1.0) ** 2) * inv8x / kk
        s = s + a
    s = jnp.maximum(s, 1e-12)
    return -0.5 * jnp.log(2.0 * jnp.pi * jnp.maximum(x, 1.0)) + jnp.log(s)


_NU_DEBYE = 8.0


def _log_ive_debye(nu, x):
    """Uniform large-order (Debye) asymptotic for I_nu(x) e^{-x}:
    I_nu(nu z) ~ e^{nu eta} / (sqrt(2 pi nu) (1+z^2)^{1/4}) * sum u_k(t)/nu^k
    with t = (1+z^2)^{-1/2}, eta = sqrt(1+z^2) + log(z/(1+sqrt(1+z^2)))
    (A&S 9.7.7; polynomials 9.3.9/9.3.10 through u_4). Valid uniformly in
    z for large nu — error O(nu^-5), < 1e-6 rel for nu >= 8."""
    nu_s = jnp.maximum(nu, 1.0)  # sanitized: branch discarded for small nu
    z = x / nu_s
    sq = jnp.sqrt(1.0 + z * z)
    t = 1.0 / sq
    eta = sq + jnp.log(z / (1.0 + sq))
    t2 = t * t
    u1 = t * (3.0 - 5.0 * t2) / 24.0
    u2 = t2 * (81.0 + t2 * (-462.0 + 385.0 * t2)) / 1152.0
    u3 = (t * t2 * (30375.0 + t2 * (-369603.0
                    + t2 * (765765.0 - 425425.0 * t2)))) / 414720.0
    u4 = (t2 * t2 * (4465125.0 + t2 * (-94121676.0
                     + t2 * (349922430.0 + t2 * (-446185740.0
                             + 185910725.0 * t2))))) / 39813120.0
    inv = 1.0 / nu_s
    s = 1.0 + inv * (u1 + inv * (u2 + inv * (u3 + inv * u4)))
    return (nu_s * eta - x - 0.5 * jnp.log(2.0 * jnp.pi * nu_s)
            - 0.5 * jnp.log(sq) + jnp.log(jnp.maximum(s, 1e-12)))


def log_ive(nu, x):
    """log(I_nu(x) * exp(-x)) for x >= 0, elementwise in x; nu scalar."""
    x = jnp.asarray(x)
    nu = jnp.asarray(nu, dtype=x.dtype)
    small = x < _SWITCH_X
    x_small = jnp.where(small, x, 1.0)
    x_big = jnp.where(small, _SWITCH_X + 1.0, x)
    # Hankel diverges near the switch for large nu (needs x >> nu^2);
    # route large orders to the uniform Debye expansion instead.
    big = jnp.where(nu > _NU_DEBYE, _log_ive_debye(nu, x_big),
                    _log_ive_asymptotic(nu, x_big))
    return jnp.where(small, _log_ive_series(nu, x_small), big)


def log_iv(nu, x):
    """log I_nu(x) (unscaled; overflows only where I_nu itself does in exp)."""
    return log_ive(nu, x) + x


def bessel_ratio(nu, x):
    """A(x) = I_{nu+1}(x) / I_nu(x) — the vMF mean resultant length when
    nu = m/2 - 1. Computed from log_ive (scale factors cancel)."""
    return jnp.exp(log_ive(nu + 1.0, x) - log_ive(nu, x))


_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def erfcx(x):
    """e^{x^2} erfc(x): direct product below overflow, asymptotic above.

    For x <= 0 the reflection erfcx(x) = 2 e^{x^2} - erfcx(-x) is used;
    callers must keep x^2 within exp range (|x| <~ 9 in f32), which holds in
    the Riemannian-normal regime (x ~ -(n-1)*sigma*sqrt(c)/sqrt(2)).
    """
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    # moderate |x|: e^{x^2} erfc(|x|) is well-conditioned up to ~ 25/|2x|...
    mod = ax < 8.0
    ax_mod = jnp.where(mod, ax, 1.0)
    direct = jnp.exp(ax_mod * ax_mod) * erfc(ax_mod)
    # large |x|: continued-fraction-free asymptotic series
    ax_big = jnp.where(mod, 9.0, ax)
    inv2x2 = 1.0 / (2.0 * ax_big * ax_big)
    s = 1.0 + inv2x2 * (-1.0 + inv2x2 * (3.0 + inv2x2 * (-15.0 + inv2x2 * 105.0)))
    asym = _INV_SQRT_PI / ax_big * s
    pos = jnp.where(mod, direct, asym)
    neg = 2.0 * jnp.exp(jnp.minimum(x * x, 80.0)) - pos
    return jnp.where(x >= 0, pos, neg)
