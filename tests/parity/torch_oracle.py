"""PyTorch-CPU replica of the REFERENCE estimator semantics (SURVEY §3.2-3.3).

The north-star target is matching the reference's MNIST IWAE-500 table
within 0.1 nat, but the reference itself is unrunnable here (empty mount,
no network). This module is the closest in-env substitute: an INDEPENDENT
float64 PyTorch implementation of the estimator semantics the reference
uses (per SURVEY §3.2-3.3, `mt/mvae/models/vae.py`,
`mt/mvae/distributions/wrapped_normal.py` [UNVERIFIED]):

* wrapped-normal log_prob with the PRINCIPAL-BRANCH log-det-Jacobian only
  (the reference never sums spherical wrap images);
* single-sample MC KL `log q(z|x) - log p(z)` in the ELBO;
* IWAE composition `logsumexp_n[log p(x|z) + log p(z) - log q(z|x)] - log n`.

Deliberately written the way the reference family writes it — plain acosh/
atanh/trig formulas in f64 (the regime its `--doubles` flag buys), ambient-
coordinate parallel transport, NO reuse of mvae_tpu's analytic-in-u series
or sanitized-where tricks — so agreement between the two codebases is
evidence about semantics, not shared bugs. Tests load identical weights
into both, evaluate at identical inputs and identical latent draws, and
assert agreement (tests/parity/test_estimator_parity.py; measured deltas
recorded in PARITY.md).

All functions take/return numpy or torch tensors; params are the jax-side
pytrees converted leaf-by-leaf with np.asarray.
"""
from __future__ import annotations

import math

import numpy as np
import scipy.special as sps
import torch

DT = torch.float64


def t(a):
    if torch.is_tensor(a):
        return a.to(DT)
    # np.asarray of a jax Array is read-only; copy so torch owns
    # writable memory (silences the non-writable-tensor warning)
    return torch.as_tensor(np.array(a), dtype=DT)


# --- networks (reference FeedForwardVAE: ReLU MLP) ----------------------------


def mlp_encoder(params, x):
    h = t(x)
    for layer in params["layers"]:
        h = torch.relu(h @ t(layer["w"]) + t(layer["b"]))
    return h


def mlp_decoder(params, z):
    h = t(z)
    for layer in params["layers"]:
        h = torch.relu(h @ t(layer["w"]) + t(layer["b"]))
    return h @ t(params["out"]["w"]) + t(params["out"]["b"])


def bernoulli_log_prob(logits, x):
    """Sum over pixels of log Bernoulli(x | sigmoid(logits))."""
    return (t(x) * logits - torch.nn.functional.softplus(logits)).sum(-1)


def gaussian_log_prob(v, sigma):
    """Diagonal N(v; 0, sigma), summed over the last axis."""
    v, sigma = t(v), torch.broadcast_to(t(sigma), t(v).shape)
    return (-0.5 * ((v / sigma) ** 2 + math.log(2 * math.pi))
            - torch.log(sigma)).sum(-1)


# --- Lorentz hyperboloid H^n (K < 0, R = 1/sqrt(-K)), ambient n+1 -------------
# mu0 = (R, 0, ..., 0); orthonormal mu0-frame tangents are the last n
# ambient coordinates (the Lorentz metric restricted there is Euclidean).


def _lprod(x, y):
    return (-x[..., :1] * y[..., :1]
            + (x[..., 1:] * y[..., 1:]).sum(-1, keepdim=True))


def lorentz_mu0(n, k):
    r = 1.0 / math.sqrt(-k)
    out = torch.zeros(n + 1, dtype=DT)
    out[0] = r
    return out


def lorentz_exp_mu0(v, k):
    """exp_{mu0} of orthonormal tangent v (n,) -> ambient (n+1,)."""
    v = t(v)
    r_curv = 1.0 / math.sqrt(-k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r_curv
    x0 = r_curv * torch.cosh(theta)
    xs = r_curv * torch.sinh(theta) * v / vn
    return torch.cat([x0, xs], dim=-1)


def lorentz_transp_mu0(mu, v_amb, k):
    """PT_{mu0 -> mu} of ambient tangent v_amb (textbook formula)."""
    mu = t(mu)
    rsq = -1.0 / k
    mu0 = torch.broadcast_to(lorentz_mu0(mu.shape[-1] - 1, k), mu.shape)
    alpha = -_lprod(mu0, mu) / rsq  # cosh(d/R) >= 1
    coef = _lprod(mu, v_amb) / (rsq * (1.0 + alpha))
    return v_amb + coef * (mu0 + mu)


def lorentz_sample_projection_mu0(v, mu, k):
    """z = exp_mu(PT_{mu0->mu}(embed(v)))."""
    v, mu = t(v), t(mu)
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    u = lorentz_transp_mu0(mu, v_amb, k)
    r_curv = 1.0 / math.sqrt(-k)
    un = torch.sqrt(_lprod(u, u).clamp_min(1e-300))
    theta = un / r_curv
    return torch.cosh(theta) * mu + torch.sinh(theta) * r_curv * u / un


def lorentz_inverse_sample_projection_mu0(z, mu, k):
    """Principal tangent v (orthonormal mu0 frame) with z = exp_mu(PT(v))."""
    z, mu = t(z), t(mu)
    rsq = -1.0 / k
    r_curv = math.sqrt(rsq)
    beta = (-_lprod(mu, z) / rsq).clamp_min(1.0 + 1e-15)  # cosh(d/R)
    d = r_curv * torch.acosh(beta)
    u_dir = z - beta * mu
    un = torch.sqrt(_lprod(u_dir, u_dir).clamp_min(1e-300))
    u = d * u_dir / un
    # inverse transport mu -> mu0
    mu0 = torch.broadcast_to(lorentz_mu0(mu.shape[-1] - 1, k), mu.shape)
    alpha = -_lprod(mu0, mu) / rsq
    coef = _lprod(mu0, u) / (rsq * (1.0 + alpha))
    v_amb = u + coef * (mu0 + mu)
    return v_amb[..., 1:]


def lorentz_logdet(r, n, k):
    """(n-1) log(sinh(c r)/(c r)), c = sqrt(-K) — principal branch."""
    c = math.sqrt(-k)
    x = (t(r) * c).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sinh(x)) - torch.log(x))


# --- hypersphere S^n (K > 0, R = 1/sqrt(K)), ambient n+1 ----------------------


def sphere_mu0(n, k):
    r = 1.0 / math.sqrt(k)
    out = torch.zeros(n + 1, dtype=DT)
    out[0] = r
    return out


def sphere_exp_mu0(v, k):
    v = t(v)
    r_curv = 1.0 / math.sqrt(k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r_curv
    x0 = r_curv * torch.cos(theta)
    xs = r_curv * torch.sin(theta) * v / vn
    return torch.cat([x0, xs], dim=-1)


def sphere_sample_projection_mu0(v, mu, k):
    v, mu = t(v), t(mu)
    rsq = 1.0 / k
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    mu0 = torch.broadcast_to(sphere_mu0(mu.shape[-1] - 1, k), mu.shape)
    alpha = (mu0 * mu).sum(-1, keepdim=True) / rsq  # cos(d0/R)
    coef = (mu * v_amb).sum(-1, keepdim=True) / (rsq * (1.0 + alpha))
    u = v_amb - coef * (mu0 + mu)
    r_curv = math.sqrt(rsq)
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = un / r_curv
    return torch.cos(theta) * mu + torch.sin(theta) * r_curv * u / un


def sphere_inverse_sample_projection_mu0(z, mu, k):
    z, mu = t(z), t(mu)
    rsq = 1.0 / k
    r_curv = math.sqrt(rsq)
    beta = ((mu * z).sum(-1, keepdim=True) / rsq).clamp(-1.0, 1.0)
    d = r_curv * torch.acos(beta)
    u_dir = z - beta * mu
    un = torch.linalg.vector_norm(u_dir, dim=-1,
                                  keepdim=True).clamp_min(1e-300)
    u = d * u_dir / un
    mu0 = torch.broadcast_to(sphere_mu0(mu.shape[-1] - 1, k), mu.shape)
    alpha = (mu0 * mu).sum(-1, keepdim=True) / rsq
    coef = (mu0 * u).sum(-1, keepdim=True) / (rsq * (1.0 + alpha))
    v_amb = u - coef * (mu0 + mu)
    return v_amb[..., 1:]


def sphere_logdet(r, n, k):
    """(n-1) log(sin(c r)/(c r)) — PRINCIPAL branch (reference semantics:
    no wrap-image sum)."""
    c = math.sqrt(k)
    x = (t(r) * c).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sin(x).abs().clamp_min(1e-300))
                      - torch.log(x))


# --- isometries into the embedded models --------------------------------------
# Poincare ball / projected sphere / universal coordinates are checked by
# mapping points through the exact isometry into H^n / S^n and evaluating
# there (densities w.r.t. the Riemannian measure are isometry-invariant).


def poincare_to_lorentz(p, k):
    """D^n_K (K<0) coords -> hyperboloid ambient; p scaled by ball radius."""
    p = t(p)
    rsq = -1.0 / k
    r_curv = math.sqrt(rsq)
    psq = (p * p).sum(-1, keepdim=True) / rsq
    den = (1.0 - psq).clamp_min(1e-300)
    x0 = r_curv * (1.0 + psq) / den
    xs = 2.0 * p / den
    return torch.cat([x0, xs], dim=-1)


def projected_to_sphere(p, k):
    """P^n_K (K>0) stereographic coords -> sphere ambient."""
    p = t(p)
    psq = k * (p * p).sum(-1, keepdim=True)
    den = 1.0 + psq
    x0 = (1.0 - psq) / (den * math.sqrt(k))
    xs = 2.0 * p / den
    return torch.cat([x0, xs], dim=-1)


# --- wrapped normal, principal branch (reference log_prob) --------------------


def wrapped_normal_log_prob(kind: str, z, mu, sigma, k: float):
    """log q(z) for the wrapped normal — REFERENCE semantics (principal
    branch only). kind in {e,h,d,s,p,u}: d/p/u points are mapped through
    the exact isometry into the embedded model first."""
    z, mu = t(z), t(mu)
    if kind == "e" or (kind == "u" and k == 0.0):
        return gaussian_log_prob(z - mu, sigma)
    if kind in ("d",) or (kind == "u" and k < 0):
        z, mu = poincare_to_lorentz(z, k), poincare_to_lorentz(mu, k)
        kind = "h"
    if kind in ("p",) or (kind == "u" and k > 0):
        z, mu = projected_to_sphere(z, k), projected_to_sphere(mu, k)
        kind = "s"
    n = z.shape[-1] - 1
    if kind == "h":
        v = lorentz_inverse_sample_projection_mu0(z, mu, k)
        r = torch.linalg.vector_norm(v, dim=-1)
        return gaussian_log_prob(v, sigma) - lorentz_logdet(r, n, k)
    assert kind == "s", kind
    v = sphere_inverse_sample_projection_mu0(z, mu, k)
    r = torch.linalg.vector_norm(v, dim=-1)
    return gaussian_log_prob(v, sigma) - sphere_logdet(r, n, k)


# --- von Mises-Fisher + hyperspherical uniform --------------------------------


def vmf_log_prob(z, mu, kappa, k: float):
    """vMF density on the radius-R sphere w.r.t. its surface measure.
    log C_m via scipy's exponentially-scaled Bessel ive (independent of
    mvae_tpu's own log_ive)."""
    z, mu, kappa = t(z), t(mu), t(kappa)
    m = z.shape[-1]
    nu = m / 2.0 - 1.0
    cos = ((mu / torch.linalg.vector_norm(mu, dim=-1, keepdim=True))
           * (z / torch.linalg.vector_norm(z, dim=-1, keepdim=True))
           ).sum(-1)
    log_ive = torch.as_tensor(
        np.log(sps.ive(nu, kappa.detach().cpu().numpy())), dtype=DT)
    log_c = (nu * torch.log(kappa) - (m / 2.0) * math.log(2.0 * math.pi)
             - (log_ive + kappa))
    r_area = (m - 1) / 2.0 * math.log(k)  # -(m-1) log R
    return log_c + kappa * cos + r_area


def hyperspherical_uniform_log_prob(m: int, k: float):
    log_area = (math.log(2.0) + (m / 2.0) * math.log(math.pi)
                - math.lgamma(m / 2.0) - (m - 1) / 2.0 * math.log(k))
    return -log_area


def normal_kl_std(mu, sigma):
    """Analytic KL(N(mu, sigma) || N(0, I)) (reference Euclidean KL)."""
    mu = t(mu)
    sigma = torch.broadcast_to(t(sigma), mu.shape)
    return 0.5 * (sigma ** 2 + mu ** 2 - 1.0
                  - 2.0 * torch.log(sigma)).sum(-1)


def vmf_kl_to_uniform(m: int, kappa, k: float):
    """Analytic KL(vMF(mu, kappa) || Uniform(S^{m-1})) via scipy Bessel."""
    kappa = t(kappa)
    kap = kappa.detach().cpu().numpy()
    a_m = torch.as_tensor(sps.ive(m / 2.0, kap) / sps.ive(m / 2.0 - 1, kap),
                          dtype=DT)
    nu = m / 2.0 - 1.0
    log_ive = torch.as_tensor(np.log(sps.ive(nu, kap)), dtype=DT)
    log_c = (nu * torch.log(kappa) - (m / 2.0) * math.log(2.0 * math.pi)
             - (log_ive + kappa))
    unit_area = (math.log(2.0) + (m / 2.0) * math.log(math.pi)
                 - math.lgamma(m / 2.0))
    return kappa * a_m + log_c + unit_area


# --- estimator compositions (reference ModelVAE semantics) ---------------------


def elbo_terms(log_px_z, log_q, log_p, beta: float = 1.0):
    """Single-sample MC KL and ELBO, exactly as the reference composes
    them: ELBO = log p(x|z) - beta * sum_c [log q_c(z|x) - log p_c(z)]."""
    kl = t(log_q) - t(log_p)
    return t(log_px_z) - beta * kl, kl


def iwae_log_likelihood(log_w):
    """log w: (n_samples, B) -> per-example IWAE LL (logsumexp - log n)."""
    log_w = t(log_w)
    n = log_w.shape[0]
    return torch.logsumexp(log_w, dim=0) - math.log(n)
