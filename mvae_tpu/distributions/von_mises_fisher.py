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


def _sample_w_raw(key, m: int, kappa):
    """Rejection-sample the cosine w in [-1, 1] (Wood 1994); no gradients."""
    kappa_sg = jax.lax.stop_gradient(kappa)
    b = _wood_b(m, kappa_sg)
    x0 = (1.0 - b) / (1.0 + b)
    mm1 = m - 1.0
    c = kappa_sg * x0 + mm1 * jnp.log1p(-x0 * x0)

    shape = kappa_sg.shape
    dtype = kappa_sg.dtype

    def cond(state):
        i, _, _, accepted = state
        return jnp.logical_and(i < _MAX_REJECTION_ITERS,
                               jnp.logical_not(jnp.all(accepted)))

    def body(state):
        i, key, w_acc, accepted = state
        key, k_beta, k_u = jax.random.split(key, 3)
        eps = jax.random.beta(k_beta, mm1 / 2.0, mm1 / 2.0, shape,
                              dtype=dtype)
        u = jax.random.uniform(k_u, shape, dtype=dtype, minval=1e-12)
        w = _w_from_eps(eps, b)
        ok = (kappa_sg * w + mm1 * jnp.log1p(-jnp.minimum(x0 * w, 1.0 - 1e-7))
              - c) >= jnp.log(u)
        newly = jnp.logical_and(ok, jnp.logical_not(accepted))
        w_acc = jnp.where(newly, w, w_acc)
        return i + 1, key, w_acc, jnp.logical_or(accepted, ok)

    init_w = jnp.full(shape, x0, dtype=dtype)  # envelope mode as fallback
    _, _, w_acc, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), key, init_w,
                     jnp.zeros(shape, bool)))
    return w_acc


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
