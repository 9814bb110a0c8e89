"""L0: numerically stable scalar math, safe in float32/bfloat16.

TPU-native replacement for the reference's eps-clamped helpers
(``mt/mvae/ops/common.py`` in oskopek/mvae [UNVERIFIED — see SURVEY.md §0]).
The reference leaned on a global float64 switch (``--doubles``) for stability;
this module instead uses algebraically stable reformulations so the whole
framework runs in f32/bf16 on TPU:

* ``acosh(1+u)`` as ``log1p(u + sqrt(u*(u+2)))`` — no cancellation near 1.
* sinc-family ratios (``sin_k(r)/r`` etc.) via a single analytic series in
  ``u = K r**2`` that is smooth through curvature K = 0, with closed forms
  outside the series window. This is what lets the "universal" manifold's
  curvature cross zero during training with finite values AND gradients.
* the `where`-trick (both branches evaluated on sanitized inputs) so reverse-
  mode AD never sees NaN from the unselected branch.

All functions preserve the input dtype and are jit/vmap/grad-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Window |u| <= SERIES_CUTOFF where the power series in u = K * r**2 is used.
# Series below are truncated so the relative truncation error at the cutoff
# is < 1e-14, i.e. exact to f64 test tolerance and far below f32 eps.
_SERIES_CUTOFF = 1e-2


def eps(dtype) -> float:
    """Dtype-dependent epsilon for domain clamping (cf. reference eps table)."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        return 1e-12
    if dtype == jnp.float32:
        return 1e-6
    # bfloat16 / float16
    return 1e-3


def tiny(dtype) -> float:
    """Additive guard for sqrt/log arguments (value-preserving to ~eps**2)."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        return 1e-30
    if dtype == jnp.float32:
        return 1e-15
    return 1e-7


def safe_sqrt(x: Array) -> Array:
    """sqrt with clamped argument: finite value and gradient at x <= 0."""
    return jnp.sqrt(jnp.maximum(x, tiny(x.dtype)))


def safe_norm(x: Array, axis=-1, keepdims: bool = False) -> Array:
    """L2 norm with a finite gradient at 0 (adds `tiny` under the sqrt)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + tiny(x.dtype))


def acosh_1p(u: Array) -> Array:
    """acosh(1 + u) for u >= 0, stable near u = 0.

    acosh(1+u) = log1p(u + sqrt(u*(u+2))). Relative error stays O(eps) even
    when u ~ eps, where the naive acosh loses all digits.
    """
    u = jnp.maximum(u, 0.0)
    return jnp.log1p(u + jnp.sqrt(u * (u + 2.0)))


def atanh_clamped(x: Array) -> Array:
    """atanh with |x| clamped to 1 - eps(dtype); stable via log1p."""
    e = eps(x.dtype)
    x = jnp.clip(x, -1.0 + e, 1.0 - e)
    # atanh(x) = 0.5 * log1p(2x / (1 - x))
    return 0.5 * jnp.log1p(2.0 * x / (1.0 - x))


def asin_clamped(x: Array) -> Array:
    """asin with argument clamped into [-1, 1] (keeps gradient finite)."""
    e = eps(x.dtype)
    return jnp.arcsin(jnp.clip(x, -1.0 + e, 1.0 - e))


def cosh_clamped(x: Array, max_arg: float = 85.0) -> Array:
    return jnp.cosh(jnp.clip(x, -max_arg, max_arg))


def sinh_clamped(x: Array, max_arg: float = 85.0) -> Array:
    return jnp.sinh(jnp.clip(x, -max_arg, max_arg))


def _split_series_window(u: Array):
    """Returns (in_window, u_series, u_closed) with sanitized branch inputs."""
    small = jnp.abs(u) < _SERIES_CUTOFF
    u_series = jnp.where(small, u, 0.0)  # safe for the polynomial
    u_closed = jnp.where(small, jnp.sign(u) * 4.0 * _SERIES_CUTOFF + 1e-8, u)
    return small, u_series, u_closed


def _poly(u: Array, coeffs) -> Array:
    """Horner evaluation of 1 + c1*u + c2*u^2 + ... (coeffs = [c1, c2, ...])."""
    acc = jnp.zeros_like(u)
    for c in reversed(coeffs):
        acc = u * (c + acc)
    return 1.0 + acc


# --- the sinc family, smooth in u = K * r**2 through K = 0 -------------------
#
# All four functions below take u = K * r**2 (any sign) and return the ratio
# f(u) such that:
#   sin_k(r) / r        = sindiv_k(u)     sin_k(r) = sin(sqrt(K) r)/sqrt(K)
#   tan_k(r) / r        = r-free factor   tan_k(r) = tan(sqrt(K) r)/sqrt(K)
#   arctan_k(y) / y     = factor          arctan_k inverse of tan_k
#   arcsin_k(y) / y     = factor
# For K < 0 these become sinh/tanh/artanh/arsinh automatically — the SAME
# analytic series continues across 0, which is the whole trick.


def sindiv_u(u: Array) -> Array:
    """sin(sqrt(u))/sqrt(u), analytic in u (=> sinh for u < 0)."""
    small, us, uc = _split_series_window(u)
    series = _poly(us, [-1.0 / 6, 1.0 / 120, -1.0 / 5040, 1.0 / 362880])
    pos = jnp.abs(uc)
    su = jnp.sqrt(pos)
    closed = jnp.where(uc > 0, jnp.sin(su) / su,
                       sinh_clamped(su) / su)
    return jnp.where(small, series, closed)


def cos_u(u: Array) -> Array:
    """cos(sqrt(u)), analytic in u (=> cosh for u < 0)."""
    small, us, uc = _split_series_window(u)
    series = _poly(us, [-1.0 / 2, 1.0 / 24, -1.0 / 720, 1.0 / 40320])
    pos = jnp.abs(uc)
    su = jnp.sqrt(pos)
    closed = jnp.where(uc > 0, jnp.cos(su), cosh_clamped(su))
    return jnp.where(small, series, closed)


def tandiv_u(u: Array) -> Array:
    """tan(sqrt(u))/sqrt(u), analytic in u (=> tanh for u < 0).

    Callers must keep u < (pi/2)**2 when u > 0 (tan pole).
    """
    small, us, uc = _split_series_window(u)
    series = _poly(us, [1.0 / 3, 2.0 / 15, 17.0 / 315, 62.0 / 2835,
                        1382.0 / 155925])
    pos = jnp.abs(uc)
    su = jnp.sqrt(pos)
    closed = jnp.where(uc > 0, jnp.tan(su) / su, jnp.tanh(su) / su)
    return jnp.where(small, series, closed)


def arctandiv_u(w: Array) -> Array:
    """atan(sqrt(w))/sqrt(w), analytic in w (=> artanh for w < 0).

    Callers must keep w > -1 (artanh pole); clamp is applied at w <= -1+eps.
    """
    small, ws, wc = _split_series_window(w)
    series = _poly(ws, [-1.0 / 3, 1.0 / 5, -1.0 / 7, 1.0 / 9, -1.0 / 11])
    pos_w = jnp.maximum(wc, tiny(w.dtype))
    sw_pos = jnp.sqrt(pos_w)
    e = eps(w.dtype)
    neg_w = jnp.clip(-wc, tiny(w.dtype), (1.0 - e) ** 2)
    sw_neg = jnp.sqrt(neg_w)
    closed = jnp.where(wc > 0,
                       jnp.arctan(sw_pos) / sw_pos,
                       atanh_clamped(sw_neg) / sw_neg)
    return jnp.where(small, series, closed)


def arcsindiv_u(w: Array) -> Array:
    """asin(sqrt(w))/sqrt(w), analytic in w (=> arsinh for w < 0).

    Callers must keep w <= 1 when w > 0; clamped at 1 - eps.
    """
    small, ws, wc = _split_series_window(w)
    series = _poly(ws, [1.0 / 6, 3.0 / 40, 15.0 / 336, 105.0 / 3456])
    e = eps(w.dtype)
    pos_w = jnp.clip(wc, tiny(w.dtype), (1.0 - e))
    sw_pos = jnp.sqrt(pos_w)
    neg_w = jnp.maximum(-wc, tiny(w.dtype))
    sw_neg = jnp.sqrt(neg_w)
    closed = jnp.where(wc > 0,
                       jnp.arcsin(sw_pos) / sw_pos,
                       jnp.arcsinh(sw_neg) / sw_neg)
    return jnp.where(small, series, closed)


def log_sindiv_u(u: Array) -> Array:
    """log(sin(sqrt(u))/sqrt(u)), analytic in u (=> log(sinh .../...) u < 0).

    This is the wrapped-normal log-det-Jacobian radial term
    (n-1) * log(sin_k(r)/r) evaluated per unit dimension; stable both near
    r = 0 (series via log1p) and for large hyperbolic radius (linear form).
    """
    small, us, uc = _split_series_window(u)
    # log(sindiv) = log1p(sindiv - 1); series of sindiv-1 is accurate directly.
    sd_m1 = us * (-1.0 / 6 + us * (1.0 / 120 + us * (-1.0 / 5040
                                                     + us * (1.0 / 362880))))
    series = jnp.log1p(sd_m1)
    pos = jnp.abs(uc)
    su = jnp.sqrt(pos)
    e = eps(u.dtype)
    # spherical branch: log(sin(x)/x); keep x strictly inside (0, pi)
    x_sph = jnp.clip(su, e, jnp.pi * (1.0 - 1e-6))
    sph = jnp.log(jnp.sin(x_sph) / x_sph)
    # hyperbolic branch: log(sinh(x)/x) = x + log1p(-exp(-2x)) - log(2x),
    # overflow-free for large x.
    hyp = su + jnp.log1p(-jnp.exp(-2.0 * su)) - jnp.log(2.0 * su)
    closed = jnp.where(uc > 0, sph, hyp)
    return jnp.where(small, series, closed)


# Mollification width for the wrapped-normal log-det near the positive-K
# injectivity shell (see log_abs_sin_soft). 1e-3 bounds the cot-type
# derivative at ~500 while perturbing log-density values only within
# ~1e-3 of the shell (< 1e-3-nat ELBO/IWAE bias, measured in
# tests/distributions/test_wrapped_stability.py). Trace-time env override
# (MVAE_SHELL_DELTA) for convergence-vs-stability experiments; read ONCE
# at import, like the kernel routing flags.
SHELL_DELTA = float(__import__("os").environ.get("MVAE_SHELL_DELTA",
                                                 "1e-3"))


def log_abs_sin_soft(x: Array, taper_x: Array | None = None,
                     delta: float = SHELL_DELTA) -> Array:
    """log|sin x| with a SMOOTH floor near the sin zeros at m pi, m >= 1.

    The wrapped-normal log-det term log|sin x| has a cot-type derivative
    diverging like 1/(m pi - x) at the injectivity shell (m odd: the
    antipode) and the conjugate points (m even: full wraps back to mu);
    the single-sample reparam gradient estimator is heavy-tailed there
    (non-integrable second moment), which fed round 3's positive-K KL
    spirals. 0.5*log(sin^2 x + d^2) is the log-density of a MOLLIFIED
    model with d = delta * min(taper_x/pi, 1)^3: values change only
    within ~delta of a shell zero, the derivative there is bounded by
    ~pi/(2 delta), and the cubic taper keeps the REMOVABLE zero at
    taper_x = 0 exact to f64 oracle tolerance (contamination
    (d/sin)^2/2 ~ 1e-13 at x = 0.1, the series-window edge).

    ``taper_x`` defaults to x. Multi-branch wrapped densities pass the
    principal-REDUCED angle as ``x`` (all branches share |sin|) and each
    branch's UNREDUCED radius as ``taper_x`` — so the m = 0 branch stays
    exact near 0 while full-wrap branches (whose Jacobian zero at the
    same reduced angle is a true conjugate-point singularity) are
    floored."""
    s = jnp.sin(x)
    t = jnp.minimum((x if taper_x is None else taper_x) * (1.0 / jnp.pi),
                    1.0)
    d = delta * t * t * t
    return 0.5 * jnp.log(s * s + d * d)


def log_sindiv_u_soft(u: Array) -> Array:
    """log_sindiv_u with the mollified spherical closed branch (bounded
    derivative at the injectivity shell u = pi^2; identical elsewhere).
    Wrapped-normal density paths use this form; geometric ops keep the
    exact log_sindiv_u."""
    small, us, uc = _split_series_window(u)
    sd_m1 = us * (-1.0 / 6 + us * (1.0 / 120 + us * (-1.0 / 5040
                                                     + us * (1.0 / 362880))))
    series = jnp.log1p(sd_m1)
    su = jnp.sqrt(jnp.abs(uc))
    e = eps(u.dtype)
    sph = log_abs_sin_soft(su) - jnp.log(jnp.maximum(su, e))
    hyp = su + jnp.log1p(-jnp.exp(-2.0 * su)) - jnp.log(2.0 * su)
    closed = jnp.where(uc > 0, sph, hyp)
    return jnp.where(small, series, closed)


# --- convenience wrappers in terms of (r, K) ---------------------------------


def sin_k(r: Array, k: Array) -> Array:
    """Generalized sine: sin(sqrt(K) r)/sqrt(K); sinh-form for K<0; r at K=0."""
    return r * sindiv_u(k * r * r)


def cos_k(r: Array, k: Array) -> Array:
    """Generalized cosine: cos(sqrt(K) r); cosh-form for K < 0; 1 at K = 0."""
    return cos_u(k * r * r)


def tan_k(r: Array, k: Array) -> Array:
    """Generalized tangent: tan(sqrt(K) r)/sqrt(K); tanh-form for K < 0."""
    return r * tandiv_u(k * r * r)


def arctan_k(y: Array, k: Array) -> Array:
    """Inverse of tan_k: atan(sqrt(K) y)/sqrt(K); artanh-form for K < 0."""
    return y * arctandiv_u(k * y * y)


def arcsin_k(y: Array, k: Array) -> Array:
    """Inverse of sin_k: asin(sqrt(K) y)/sqrt(K); arsinh-form for K < 0."""
    return y * arcsindiv_u(k * y * y)


def log_sin_k_div(r: Array, k: Array) -> Array:
    """log(sin_k(r)/r), the per-dimension wrapped-normal log-det term."""
    return log_sindiv_u(k * r * r)


def logsumexp(a: Array, axis=None, keepdims: bool = False) -> Array:
    """Thin alias over jax.scipy for discoverability parity with reference."""
    return jax.scipy.special.logsumexp(a, axis=axis, keepdims=keepdims)
