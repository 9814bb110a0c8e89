"""von Mises-Fisher distribution on the sphere, TPU-native.

Capability parity with ``mt/mvae/distributions/von_mises_fisher.py`` in
oskopek/mvae [UNVERIFIED] (itself adapted from nicola-decao/s-vae-pytorch):
reparameterized sampling via the Wood (1994) rejection scheme + Householder
reflection, log-density with log C_m(kappa) through the scaled Bessel
function, and the analytic KL to the hyperspherical uniform prior.

TPU-first redesign of the data-dependent accept loop (SURVEY.md §3.4):

* the rejection loop runs under ``lax.while_loop`` with per-lane acceptance
  masks and STOPPED gradients (fixed shapes, bounded trip count);
* gradients w.r.t. kappa use IMPLICIT reparameterization (Figurnov et al.):
  the accepted cosine w is a ``custom_jvp`` with
  dw/dkappa = -(dF/dkappa) / p(w), where the marginal-CDF pieces are
  evaluated by exponentially-substituted Gauss-Legendre quadrature (the
  e^{-xi} substitution keeps the nodes resolving the O(1/kappa)-wide
  integrand at any concentration). This is EXACT in expectation — unlike
  the reference's s-vae-style estimator, which drops the rejection
  correction term and is measurably biased (~30% on dA/dkappa at
  kappa=3, m=3; see tests).

Points live on the radius-R sphere (R = 1/sqrt(K)); densities are w.r.t.
the Riemannian surface measure, so the (m-1) log R area term appears in
log_prob but cancels in every KL / IWAE weight.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import stable
from ..utils.special import bessel_ratio, log_ive
from . import hyperspherical_uniform

_MAX_REJECTION_ITERS = 64


def _unit(x):
    return x / stable.safe_norm(x, keepdims=True)


def log_normalizer(m: int, kappa):
    """log C_m(kappa) of the unit-sphere vMF density."""
    nu = m / 2.0 - 1.0
    kappa = jnp.maximum(kappa, stable.tiny(jnp.asarray(kappa).dtype))
    return (nu * jnp.log(kappa) - (m / 2.0) * math.log(2.0 * math.pi)
            - (log_ive(nu, kappa) + kappa))


def log_prob(z, mu, kappa, k):
    """log q(z) for z, mu ambient on the radius-R sphere; kappa (...)."""
    m = z.shape[-1]
    cos = jnp.sum(_unit(mu) * _unit(z), axis=-1)
    r_area = (m - 1) / 2.0 * jnp.log(jnp.maximum(k, 1e-30))  # -(m-1) log R
    return log_normalizer(m, kappa) + kappa * cos + r_area.astype(z.dtype)


def _wood_b(m: int, kappa):
    """b in Wood's envelope, in the overflow-free form (m-1)/(2k + sqrt(...))."""
    mm1 = m - 1.0
    return mm1 / (2.0 * kappa + jnp.sqrt(4.0 * kappa * kappa + mm1 * mm1))


def _w_from_eps(eps, b):
    return (1.0 - (1.0 + b) * eps) / (1.0 - (1.0 - b) * eps)


_OVERSAMPLE = 16  # proposals drawn at once; P(all rejected) <~ 0.34^16 ~ 3e-8


def _gamma_half_int(key, a2: int, shape, dtype):
    """Gamma(a2/2, 1) for integer a2 >= 1, LOOP-FREE: sum of a2//2
    exponentials plus (a2 odd) half a squared standard normal. Replaces
    jax.random.gamma's internal rejection while_loop on the vMF path."""
    k_exp, k_norm = jax.random.split(key)
    out = jnp.zeros(shape, dtype)
    n_exp = a2 // 2
    if n_exp:
        u = jax.random.uniform(k_exp, shape + (n_exp,), dtype=dtype,
                               minval=1e-12)
        out = -jnp.sum(jnp.log(u), axis=-1)
    if a2 % 2:
        z = jax.random.normal(k_norm, shape, dtype=dtype)
        out = out + 0.5 * z * z
    return out


def _beta_sym_half_int(key, a2: int, shape, dtype):
    """Beta(a2/2, a2/2) via the exact gamma composition (loop-free)."""
    k1, k2 = jax.random.split(key)
    g1 = _gamma_half_int(k1, a2, shape, dtype)
    g2 = _gamma_half_int(k2, a2, shape, dtype)
    return g1 / jnp.maximum(g1 + g2, 1e-30)


def _sample_w_m3(key, kappa):
    """EXACT inverse-CDF cosine sampling on S^2 (m = 3): the w-marginal is
    proportional to e^{kappa w} on [-1, 1], so

        w = 1 + log(u + (1-u) e^{-2 kappa}) / kappa,

    computed in the expm1/log1p form that is stable for both kappa -> 0
    (uniform limit) and large kappa. No rejection, no loop, and the formula
    is itself the exact reparameterization — gradients come from plain AD.
    """
    u = jax.random.uniform(key, kappa.shape, dtype=kappa.dtype,
                           minval=1e-7)
    kap = jnp.maximum(kappa, 1e-6)
    w = 1.0 + jnp.log1p((1.0 - u) * jnp.expm1(-2.0 * kap)) / kap
    return jnp.clip(w, -1.0 + 1e-7, 1.0 - 1e-7)


def _sample_w_raw(key, m: int, kappa):
    """Rejection-sample the cosine w in [-1, 1] (Wood 1994); no gradients.

    TPU shape: instead of a data-dependent while_loop (whose sequential
    rounds — with the gamma sampler's own inner rejection loop — dominated
    the product-latent step time), draw a fixed batch of _OVERSAMPLE
    proposals per lane in ONE vectorized pass and take each lane's first
    accepted one. Residual failure probability is ~1e-8 per lane; those
    lanes fall back to the envelope mode x0.
    """
    kappa_sg = jax.lax.stop_gradient(kappa)
    b = _wood_b(m, kappa_sg)
    x0 = (1.0 - b) / (1.0 + b)
    mm1 = m - 1.0
    c = kappa_sg * x0 + mm1 * jnp.log1p(-x0 * x0)

    shape = kappa_sg.shape + (_OVERSAMPLE,)
    dtype = kappa_sg.dtype
    k_beta, k_u = jax.random.split(key)
    eps = _beta_sym_half_int(k_beta, m - 1, shape, dtype)
    u = jax.random.uniform(k_u, shape, dtype=dtype, minval=1e-12)
    bb, xx0, cc = b[..., None], x0[..., None], c[..., None]
    w = _w_from_eps(eps, bb)
    ok = (kappa_sg[..., None] * w
          + mm1 * jnp.log1p(-jnp.minimum(xx0 * w, 1.0 - 1e-7))
          - cc) >= jnp.log(u)
    first = jnp.argmax(ok, axis=-1)
    w_first = jnp.take_along_axis(w, first[..., None], axis=-1)[..., 0]
    any_ok = jnp.any(ok, axis=-1)
    return jnp.where(any_ok, w_first, x0)


# --- implicit reparameterization of w ---------------------------------------

_GL_NODES, _GL_WEIGHTS = [jnp.asarray(a) for a in
                          __import__("numpy").polynomial.legendre.leggauss(32)]
_XI_CAP = 30.0  # e^{-30} ~ 1e-13: quadrature tail cutoff


def _quad_hat_integrals(w, kappa, alpha):
    """(I_hat, J_hat) where X_hat = int_{-1}^w e^{kappa(t-w)} (1-t^2)^alpha
    (* t for J) dt, via the substitution xi = kappa (w - t)."""
    kap = jnp.maximum(kappa, 1e-6)
    xi_cap = jnp.minimum(kap * (w + 1.0), _XI_CAP)
    s = 0.5 * (_GL_NODES.astype(w.dtype) + 1.0)  # nodes on [0, 1]
    xi = xi_cap[..., None] * s
    t = w[..., None] - xi / kap[..., None]
    base = jnp.exp(-xi) * jnp.maximum(
        1.0 - t * t, stable.tiny(w.dtype)) ** alpha
    wq = 0.5 * _GL_WEIGHTS.astype(w.dtype)
    scale = (xi_cap / kap)[..., None]
    i_hat = jnp.sum(base * wq * scale, axis=-1)
    j_hat = jnp.sum(base * t * wq * scale, axis=-1)
    return i_hat, j_hat


from functools import partial


@partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _sample_w(key, m: int, kappa):
    return _sample_w_raw(key, m, kappa)


@_sample_w.defjvp
def _sample_w_jvp(key, m, primals, tangents):
    (kappa,), (dkappa,) = primals, tangents
    w = _sample_w_raw(key, m, kappa)
    alpha = (m - 3.0) / 2.0
    i_hat, j_hat = _quad_hat_integrals(jax.lax.stop_gradient(w),
                                       jax.lax.stop_gradient(kappa), alpha)
    a_mean = bessel_ratio(m / 2.0 - 1.0, jax.lax.stop_gradient(kappa))
    dens = jnp.maximum(1.0 - w * w, stable.tiny(w.dtype)) ** alpha
    dw_dkappa = -(j_hat - i_hat * a_mean) / jnp.maximum(dens, 1e-30)
    return w, dw_dkappa * dkappa


def _householder_rotate(zprime, mu_unit):
    """Reflect so that e1 -> mu_unit (maps the frame-aligned sample home)."""
    e1 = jnp.zeros_like(mu_unit).at[..., 0].set(1.0)
    u = e1 - mu_unit
    # guard mu ~ e1 (u ~ 0): reflection degenerates to identity
    un = stable.safe_norm(u, keepdims=True)
    u_hat = u / jnp.maximum(un, stable.eps(u.dtype))
    degenerate = un < stable.eps(u.dtype)
    reflected = zprime - 2.0 * jnp.sum(u_hat * zprime, axis=-1,
                                       keepdims=True) * u_hat
    return jnp.where(degenerate, zprime, reflected)


def sample(key, mu, kappa, k):
    """Reparameterized draw on the radius-R sphere.

    mu: (..., m) ambient mean direction (any radius; normalized inside).
    kappa: (...) concentration. k: curvature (R = 1/sqrt(k)).
    """
    m = mu.shape[-1]
    k_w, k_dir = jax.random.split(key)
    if m == 3:
        w = _sample_w_m3(k_w, kappa)  # exact inverse-CDF, plain AD
    else:
        w = _sample_w(k_w, m, kappa)  # implicit-reparameterized in kappa

    # tangent direction: uniform on S^{m-2}
    g = jax.random.normal(k_dir, mu.shape[:-1] + (m - 1,), dtype=mu.dtype)
    v = g / stable.safe_norm(g, keepdims=True)

    sin_w = jnp.sqrt(jnp.maximum(1.0 - w * w, stable.tiny(mu.dtype)))
    zprime = jnp.concatenate([w[..., None], sin_w[..., None] * v], axis=-1)
    z_unit = _householder_rotate(zprime, _unit(mu))
    r = 1.0 / jnp.sqrt(jnp.maximum(k, 1e-30))
    return z_unit * r.astype(mu.dtype)


def sample_and_log_prob(key, mu, kappa, k):
    z = sample(key, mu, kappa, k)
    return z, log_prob(z, mu, kappa, k)


def mean_resultant_length(m: int, kappa):
    """A_m(kappa) = I_{m/2}(kappa) / I_{m/2-1}(kappa) = E[<mu, z>]."""
    return bessel_ratio(m / 2.0 - 1.0, kappa)


def kl_to_uniform(m: int, kappa):
    """Analytic KL(vMF(mu, kappa) || Uniform(S^{m-1})); radius-independent."""
    unit_area = (math.log(2.0) + (m / 2.0) * math.log(math.pi)
                 - math.lgamma(m / 2.0))
    return (kappa * mean_resultant_length(m, kappa)
            + log_normalizer(m, kappa) + unit_area)
