"""f64 PyTorch replica of the TRAINING dynamics (round-3 VERDICT #3).

Round 2 built an f64 torch replica of the reference's ESTIMATOR semantics
(torch_oracle.py) and measured agreement at fixed weights. The remaining
in-env de-risk of the 0.1-nat north star is the TRAINER: if the reference's
Adam / burn-in / KL composition shifted the optimum (not just the
estimator), fixed-weight parity would not catch it. This module closes
that: a from-scratch float64 PyTorch VAE + Adam training loop with the
reference trainer semantics (SURVEY §3.1, ``mt/mvae/trainer.py``
[UNVERIFIED] — Adam(lr), separate curvature lr, curvature frozen for
``burnin_epochs``, single-sample MC KL, principal-branch densities), driven
by THE EXACT SAME initial weights, data order, binarization draws and
reparameterization noise as mvae_tpu's Trainer (mirrored from its threefry
key chain by :func:`epoch_noise` — trainer.py:331-338, 158-163;
models/vae.py:144-152; distributions/{normal,wrapped_normal,
von_mises_fisher}.py sample key usage). After N epochs the two frameworks'
trained weights are compared on the SAME evaluation instrument
(full-split IWAE with fixed binarization, 0.002-nat noise floor).

Supported components (the parity trio e6 / h6 / h2,s2,e2): Euclidean
normal (analytic KL), wrapped normal on the Lorentz hyperboloid (learnable
curvature K = -exp(c)), and von Mises-Fisher on S^2 (m = 3, where the
cosine marginal has a closed-form inverse CDF and log C_3, A_3 are
elementary — so the torch draw is exactly reparameterized with plain
autograd, no scipy in the gradient path).

Everything here is deliberately plain-torch f64 (the reference family's
regime), independent of mvae_tpu's series/sanitized-where machinery.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

DT = torch.float64
_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------- noise mirror


# rejection-replay depth: raw proposal rounds precomputed per step for the
# torch side to replay. jax's while_loop runs to acceptance (<= 128 rounds);
# per-lane acceptance is >~ 0.5 for both Riemannian envelopes, so
# P(a lane needs > 24 rounds) < 1e-7 per draw.
_RIEM_ROUNDS = 24


def _component_noise(kind: str, dim: int, posterior: str, ck, bs: int):
    """Raw noise for ONE component draw, replayed from the EXACT key-split
    chain of components/component.py::reparametrize and the distribution
    samplers (wrapped_normal.sample_and_log_prob uses the key directly;
    von_mises_fisher.sample and riemannian_normal.sample split it once
    into the radial/cosine key and the direction key)."""
    if posterior in ("normal", "wrapped"):
        return {"eps": np.asarray(jax.random.normal(
            ck, (bs, dim), jnp.float32))}
    if posterior == "vmf":
        m = dim + 1
        k_w, k_dir = jax.random.split(ck)
        out = {"g": np.asarray(jax.random.normal(
            k_dir, (bs, m - 1), jnp.float32))}
        if m == 3:
            # exact inverse-CDF cosine (distributions/von_mises_fisher.py
            # ::_sample_w_m3): one uniform
            out["u"] = np.asarray(jax.random.uniform(
                k_w, (bs,), dtype=jnp.float32, minval=1e-7))
        else:
            # Wood rejection (::_sample_w_raw): _OVERSAMPLE symmetric-Beta
            # proposals + uniforms per lane. The Beta draws ride the
            # library's own loop-free gamma composition so the stream is
            # bit-identical to what the jax trainer consumes.
            from mvae_tpu.distributions.von_mises_fisher import (
                _OVERSAMPLE, _beta_sym_half_int)
            k_beta, k_u = jax.random.split(k_w)
            out["eps_beta"] = np.asarray(_beta_sym_half_int(
                k_beta, m - 1, (bs, _OVERSAMPLE), jnp.float32))
            out["u"] = np.asarray(jax.random.uniform(
                k_u, (bs, _OVERSAMPLE), dtype=jnp.float32, minval=1e-12))
        return out
    if posterior == "riemannian":
        # radial rejection rounds (distributions/riemannian_normal.py
        # ::_sample_radius_raw): each round splits the carried key into
        # (key, k_g, k_n, k_u) and draws a Gamma(n/2) chi proposal, a
        # normal TN proposal, and an acceptance uniform. The round keys
        # depend only on the chain, never on acceptance, so a fixed-depth
        # replay sees the same stream the jax sampler consumed.
        k_r, k_dir = jax.random.split(ck)
        rounds = []
        key = k_r
        for _ in range(_RIEM_ROUNDS):
            key, k_g, k_n, k_u = jax.random.split(key, 4)
            rounds.append({
                "gamma": np.asarray(jax.random.gamma(
                    k_g, dim / 2.0, (bs,), dtype=jnp.float32)),
                "xi": np.asarray(jax.random.normal(
                    k_n, (bs,), jnp.float32)),
                "u": np.asarray(jax.random.uniform(
                    k_u, (bs,), dtype=jnp.float32, minval=1e-12)),
            })
        return {"rounds": rounds,
                "g": np.asarray(jax.random.normal(
                    k_dir, (bs, dim), jnp.float32))}
    raise ValueError(posterior)


def epoch_noise(key, comps, global_step0: int, steps: int, bs: int,
                data_shape, n_train: int):
    """Mirror ONE epoch of the Trainer's threefry stream (train_rng=
    'threefry'): returns (next_key, perm, per-step noise dicts). `comps`
    is a list of (kind, dim, posterior) triples in component order."""
    key, k_perm, k_epoch = jax.random.split(key, 3)
    perm = np.asarray(jax.random.permutation(k_perm, n_train)[:steps * bs])
    step_noises = []
    for s in range(steps):
        kstep = jax.random.fold_in(k_epoch, global_step0 + s)
        k_bin, k_model = jax.random.split(kstep)
        u_bin = np.asarray(jax.random.uniform(
            k_bin, (bs,) + tuple(data_shape), dtype=jnp.float32))
        comp_keys = jax.random.split(k_model, len(comps))
        noise = {"u_bin": u_bin, "comps": []}
        for (kind, dim, posterior), ck in zip(comps, comp_keys):
            noise["comps"].append(
                _component_noise(kind, dim, posterior, ck, bs))
        step_noises.append(noise)
    return key, perm, step_noises


# ------------------------------------------------------- tensor-k geometry
# torch_oracle.py's formulas take python-float k; training needs k in the
# autograd graph (learnable curvature), so the Lorentz path is restated
# here with tensor k.


def _lprod(x, y):
    return (-x[..., :1] * y[..., :1]
            + (x[..., 1:] * y[..., 1:]).sum(-1, keepdim=True))


def lorentz_exp_mu0_t(v, k):
    r = 1.0 / torch.sqrt(-k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r
    return torch.cat([r * torch.cosh(theta),
                      r * torch.sinh(theta) * v / vn], dim=-1)


def lorentz_sample_projection_mu0_t(v, mu, k):
    rsq = -1.0 / k
    r = torch.sqrt(rsq)
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    mu0 = torch.cat([r.expand(*mu.shape[:-1], 1),
                     torch.zeros_like(mu[..., 1:])], dim=-1)
    alpha = -_lprod(mu0, mu) / rsq
    coef = _lprod(mu, v_amb) / (rsq * (1.0 + alpha))
    u = v_amb + coef * (mu0 + mu)
    un = torch.sqrt(_lprod(u, u).clamp_min(1e-300))
    theta = un / r
    return torch.cosh(theta) * mu + torch.sinh(theta) * r * u / un


def lorentz_inverse_sample_projection_mu0_t(z, mu, k):
    rsq = -1.0 / k
    r = torch.sqrt(rsq)
    mu0 = torch.cat([r.expand(*mu.shape[:-1], 1),
                     torch.zeros_like(mu[..., 1:])], dim=-1)
    beta = (-_lprod(mu, z) / rsq).clamp_min(1.0 + 1e-15)
    d = r * torch.acosh(beta)
    u_dir = z - beta * mu
    un = torch.sqrt(_lprod(u_dir, u_dir).clamp_min(1e-300))
    u = d * u_dir / un
    alpha = -_lprod(mu0, mu) / rsq
    coef = _lprod(mu0, u) / (rsq * (1.0 + alpha))
    v_amb = u + coef * (mu0 + mu)
    return v_amb[..., 1:]


def sphere_exp_mu0_t(v, k):
    r = 1.0 / torch.sqrt(k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    theta = vn / r
    return torch.cat([r * torch.cos(theta),
                      r * torch.sin(theta) * v / vn], dim=-1)


def gaussian_log_prob_t(v, sigma):
    sigma = torch.broadcast_to(sigma, v.shape)
    return (-0.5 * ((v / sigma) ** 2 + _LOG_2PI)
            - torch.log(sigma)).sum(-1)


def lorentz_logdet_t(r, n, k):
    c = torch.sqrt(-k)
    x = (r * c).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sinh(x)) - torch.log(x))


# closed-form S^2 vMF pieces (m = 3), all differentiable in kappa
def vmf3_log_c(kappa):
    """log C_3(kappa) = log kappa - log(4 pi sinh kappa), in the
    overflow-free form log(kappa) - log(4 pi) - [kappa + log1p(-e^{-2k})
    - log 2]."""
    return (torch.log(kappa) - math.log(4.0 * math.pi)
            - (kappa + torch.log1p(-torch.exp(-2.0 * kappa))
               - math.log(2.0)))


def vmf3_mean_resultant(kappa):
    """A_3(kappa) = coth(kappa) - 1/kappa."""
    return 1.0 / torch.tanh(kappa) - 1.0 / kappa


def vmf3_kl_to_uniform(kappa):
    unit_area = math.log(4.0 * math.pi)
    return kappa * vmf3_mean_resultant(kappa) + vmf3_log_c(kappa) + unit_area


def vmf3_sample_w(u, kappa):
    """Closed-form inverse-CDF cosine on S^2 — the same expm1/log1p form as
    distributions/von_mises_fisher._sample_w_m3 (f64)."""
    kap = kappa.clamp_min(1e-6)
    w = 1.0 + torch.log1p((1.0 - u) * torch.expm1(-2.0 * kap)) / kap
    return w.clamp(-1.0 + 1e-7, 1.0 - 1e-7)


def householder_rotate_t(zprime, mu_unit):
    e1 = torch.zeros_like(mu_unit)
    e1[..., 0] = 1.0
    u = e1 - mu_unit
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
    u_hat = u / un.clamp_min(1e-12)
    reflected = zprime - 2.0 * (u_hat * zprime).sum(-1, keepdim=True) * u_hat
    return torch.where(un < 1e-12, zprime, reflected)


# ==================================================== round-4 parity additions
# f64 torch twins for the remaining posterior families (VERDICT r3 #5):
# wrapped normal on S^n / kappa-stereographic manifolds (incl. the universal
# manifold with K in the autograd graph, smooth through K = 0), von
# Mises-Fisher beyond S^2 (Wood rejection + implicit kappa-gradients), and
# the Riemannian normal on the Poincare ball (closed-form erf normalization
# — the reference's f64 regime — + implicit sigma/curvature gradients).
# Everything is deliberately plain-torch f64, independent of mvae_tpu's
# series / sanitized-where / quadrature machinery, EXCEPT where noted (the
# vMF implicit gradient, which shares the exponential-substitution
# quadrature idea but is re-derived here in torch).

_EPS_BRANCH = 1e-12


def _log_sindiv_t(u):
    """log(sin_k ratio) as a function of u = K r^2: log(sin(x)/x) with
    x = sqrt(u) for u > 0, log(sinh(x)/x) with x = sqrt(-u) for u < 0,
    and the shared Taylor series -u/6 - u^2/180 in between. Branches are
    clamp-sanitized so torch.where never backpropagates a NaN."""
    up = torch.sqrt(u.clamp_min(_EPS_BRANCH))
    pos = torch.log(torch.sin(up).abs().clamp_min(1e-300)) - torch.log(up)
    un = torch.sqrt((-u).clamp_min(_EPS_BRANCH))
    # log(sinh x / x) = x + log1p(-e^{-2x}) - log(2x): overflow-free
    neg = un + torch.log1p(-torch.exp(-2.0 * un)) - torch.log(2.0 * un)
    ser = -u / 6.0 - u * u / 180.0
    return torch.where(u > _EPS_BRANCH, pos,
                       torch.where(u < -_EPS_BRANCH, neg, ser))


def _tandiv_t(u):
    """tan_k ratio tan_k(x)/x at u = K x^2: tan/tanh branches + series."""
    xp = torch.sqrt(u.clamp_min(_EPS_BRANCH))
    pos = torch.tan(xp) / xp
    xn = torch.sqrt((-u).clamp_min(_EPS_BRANCH))
    neg = torch.tanh(xn) / xn
    ser = 1.0 + u / 3.0 + 2.0 * u * u / 15.0
    return torch.where(u > _EPS_BRANCH, pos,
                       torch.where(u < -_EPS_BRANCH, neg, ser))


def _arctandiv_t(u):
    """arctan_k ratio arctan_k(x)/x at u = K x^2."""
    xp = torch.sqrt(u.clamp_min(_EPS_BRANCH))
    pos = torch.atan(xp) / xp
    xn = torch.sqrt((-u).clamp_min(_EPS_BRANCH))
    neg = torch.atanh(xn.clamp_max(1.0 - 1e-15)) / xn
    ser = 1.0 - u / 3.0 + u * u / 5.0
    return torch.where(u > _EPS_BRANCH, pos,
                       torch.where(u < -_EPS_BRANCH, neg, ser))


def cap_sigma_positive_k_t(sigma, k):
    """f64 twin of components/component.py::cap_sigma_positive_k (the
    round-4 injectivity-radius soft cap on wrapped posterior scales)."""
    cap = math.pi / torch.sqrt(k.clamp_min(1e-12))
    t = (sigma / cap).clamp_max(8.0)
    t2 = t * t
    return cap * t * (1.0 + t2 * t2 * t2) ** (-1.0 / 6.0)


def wrapped_logq_drawn_t(v, sigma, k, positive_reachable: bool):
    """log q(z) of z = exp_mu(PT(v)) from the DRAWN tangent v, principal
    branch only (wraps=0 reference estimator semantics) — the f64 twin of
    distributions/wrapped_normal.py::_sample_log_prob_drawn. For manifolds
    whose curvature can be positive the principal radius is the scalar
    wrap of |v| to the nearest lattice point (all preimages along the
    drawn geodesic are (r + mT) v_hat)."""
    n = v.shape[-1]
    sigma = torch.broadcast_to(sigma, v.shape)
    eps_z = v / sigma
    s2 = (eps_z * eps_z).sum(-1)
    const = -torch.log(sigma).sum(-1) - 0.5 * n * _LOG_2PI
    vsq = (v * v).sum(-1).clamp_min(1e-300)
    r = torch.sqrt(vsq)
    quad = s2 / vsq
    if not positive_reachable:
        return -0.5 * s2 + const - (n - 1) * _log_sindiv_t(k * vsq)
    kpos = k.clamp_min(1e-20)
    period = 2.0 * math.pi / torch.sqrt(kpos)
    rp = torch.abs(r - period * torch.floor(r / period + 0.5))
    pos = k > 0
    rp_eff = torch.where(pos, rp, r)
    u_principal = torch.where(pos, kpos * rp * rp, k * vsq)
    return (-0.5 * rp_eff * rp_eff * quad + const
            - (n - 1) * _log_sindiv_t(u_principal))


# --------------------------------------------- embedded sphere S^n_K (K > 0)


def _sphere_mu0_t(like, k):
    r = 1.0 / torch.sqrt(k)
    return torch.cat([r.expand(*like.shape[:-1], 1),
                      torch.zeros_like(like[..., 1:])], dim=-1)


def sphere_pt_mu0_t(v, mu, k):
    """PT_{mu0 -> mu} of orthonormal tangent v, ambient output, with the
    isometry norm pin (ops/sphere.py::parallel_transport semantics)."""
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    mu0 = _sphere_mu0_t(mu, k)
    chord = mu - mu0
    alpha = 1.0 - k * (chord * chord).sum(-1, keepdim=True) / 2.0
    coef = (k * (mu * v_amb).sum(-1, keepdim=True)
            / (1.0 + alpha).clamp_min(1e-15))
    w = v_amb - coef * (mu0 + mu)
    vn = torch.linalg.vector_norm(v_amb, dim=-1, keepdim=True)
    wn = torch.linalg.vector_norm(w, dim=-1, keepdim=True).clamp_min(1e-300)
    return w * (vn / wn)


def sphere_exp_t(x, u, k):
    """exp_x(u) = cos(theta) x + (sin(theta)/theta) u, theta = sqrt(K)|u|,
    renormalized onto the radius-R sphere."""
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True)
    theta = torch.sqrt(k) * un
    sindiv = torch.where(theta < 1e-8,
                         1.0 - theta * theta / 6.0,
                         torch.sin(theta) / theta.clamp_min(1e-300))
    z = torch.cos(theta) * x + sindiv * u
    r = 1.0 / torch.sqrt(k)
    return z * (r / torch.linalg.vector_norm(z, dim=-1, keepdim=True))


def sphere_log_mu0_t(z, k):
    """Principal preimage of z at mu0 (orthonormal coords): chord-form
    distance (exact where acos cancels) times the tangent direction."""
    mu0 = _sphere_mu0_t(z, k)
    chord2 = ((z - mu0) ** 2).sum(-1, keepdim=True)
    alpha = 1.0 - k * chord2 / 2.0
    u_dir = z - alpha * mu0
    sqk = torch.sqrt(k)
    half = torch.sqrt(chord2.clamp_min(1e-300)) / 2.0
    d = 2.0 * torch.asin((sqk * half).clamp(max=1.0 - 1e-15)) / sqk
    v = d * u_dir / torch.linalg.vector_norm(
        u_dir, dim=-1, keepdim=True).clamp_min(1e-300)
    return v[..., 1:]


# ------------------------------------- kappa-stereographic coordinates (d/p/u)


def mobius_add_t(x, y, k):
    x2 = (x * x).sum(-1, keepdim=True)
    y2 = (y * y).sum(-1, keepdim=True)
    xy = (x * y).sum(-1, keepdim=True)
    num = (1.0 - 2.0 * k * xy - k * y2) * x + (1.0 + k * x2) * y
    den = 1.0 - 2.0 * k * xy + k * k * x2 * y2
    den = torch.where(den.abs() < 1e-15,
                      torch.full_like(den, 1e-15), den)
    return num / den


def stereo_project_t(x, k):
    """Clamp into the open ball of radius (1-eps)/sqrt(-K) for K < 0."""
    norm = torch.linalg.vector_norm(x, dim=-1, keepdim=True).clamp_min(1e-300)
    kneg = k.clamp_max(-1e-300)
    max_norm = (1.0 - 1e-12) / torch.sqrt(-kneg)
    scale = torch.where(k < 0, (max_norm / norm).clamp_max(1.0),
                        torch.ones_like(norm))
    return x * scale


def stereo_exp_mu0_t(v, k):
    """exp_0 of ORTHONORMAL v (= 2 v_coord): tan_k(|v|/2) v_hat."""
    vsq = (v * v).sum(-1, keepdim=True)
    g = 0.5 * _tandiv_t(k * vsq / 4.0)
    return stereo_project_t(g * v, k)


def stereo_log_mu0_t(z, k):
    zsq = (z * z).sum(-1, keepdim=True)
    return 2.0 * _arctandiv_t(k * zsq) * z


def stereo_distance_t(x, y, k):
    """d(x,y) = 2 |(-x) (+) y| arctandiv(K |w|^2) — any-sign K."""
    w = mobius_add_t(-x, y, k)
    wsq = (w * w).sum(-1)
    return (2.0 * torch.sqrt(wsq.clamp_min(1e-300))
            * _arctandiv_t(k * wsq))


# ------------------------------------------------- von Mises-Fisher, m odd > 3
# Half-integer modified Bessel functions have elementary closed forms; the
# m = 7 pieces below are written in the e^{-x}-scaled variables
# h = sinh(x) e^{-x} = (1 - e^{-2x})/2, c = cosh(x) e^{-x} = (1 + e^{-2x})/2
# so nothing overflows at any kappa. Worst-case cancellation is at the
# head's kappa floor (kappa >= 1), where ~2 of f64's 16 digits are lost.


def _vmf7_scaled_i25_i15(x):
    """(sqrt(pi x / 2) e^{-x} I_{5/2}(x), same for I_{3/2}(x))."""
    h = 0.5 * (1.0 - torch.exp(-2.0 * x))
    ch = 0.5 * (1.0 + torch.exp(-2.0 * x))
    i25 = (3.0 / (x * x) + 1.0) * h - 3.0 * ch / x
    i15 = ch - h / x
    return i25, i15


def vmf_log_c_t(m: int, kappa):
    """log C_m(kappa) of the unit-sphere vMF density (m in {3, 5, 7})."""
    if m == 3:
        return vmf3_log_c(kappa)
    assert m in (5, 7), "closed-form torch vMF implemented for odd m <= 7"
    i25, i15 = _vmf7_scaled_i25_i15(kappa)
    inu = i15 if m == 5 else i25  # scaled I_{m/2 - 1}
    # log_ive(nu, k) = log I_nu - k = log(scaled I_nu) - 0.5 log(pi k / 2)
    log_ive = (torch.log(inu.clamp_min(1e-300))
               - 0.5 * (math.log(math.pi / 2.0) + torch.log(kappa)))
    nu = m / 2.0 - 1.0
    return (nu * torch.log(kappa) - (m / 2.0) * math.log(2.0 * math.pi)
            - (log_ive + kappa))


def vmf_mean_resultant_t(m: int, kappa):
    """A_m(kappa) = I_{m/2}(kappa) / I_{m/2-1}(kappa)."""
    if m == 3:
        return vmf3_mean_resultant(kappa)
    assert m in (5, 7)
    i25, i15 = _vmf7_scaled_i25_i15(kappa)
    if m == 5:
        return i25 / i15.clamp_min(1e-300)
    # I_{7/2} = I_{3/2} - (5/x) I_{5/2} (safe at the kappa >= 1 head floor)
    return i15 / i25.clamp_min(1e-300) - 5.0 / kappa


def vmf_log_area_unit(m: int) -> float:
    return (math.log(2.0) + (m / 2.0) * math.log(math.pi)
            - math.lgamma(m / 2.0))


def vmf_kl_to_uniform_t(m: int, kappa):
    return (kappa * vmf_mean_resultant_t(m, kappa)
            + vmf_log_c_t(m, kappa) + vmf_log_area_unit(m))


def vmf_wood_w_t(eps_beta, u, kappa_sg, m: int):
    """Replay the Wood rejection over the mirrored proposal stream with the
    torch model's own (detached) kappa — the f64 twin of
    distributions/von_mises_fisher.py::_sample_w_raw."""
    mm1 = m - 1.0
    b = mm1 / (2.0 * kappa_sg
               + torch.sqrt(4.0 * kappa_sg * kappa_sg + mm1 * mm1))
    x0 = (1.0 - b) / (1.0 + b)
    c = kappa_sg * x0 + mm1 * torch.log1p(-x0 * x0)
    bb, xx0, cc = b[..., None], x0[..., None], c[..., None]
    w = (1.0 - (1.0 + bb) * eps_beta) / (1.0 - (1.0 - bb) * eps_beta)
    ok = (kappa_sg[..., None] * w
          + mm1 * torch.log1p(-(xx0 * w).clamp_max(1.0 - 1e-7))
          - cc) >= torch.log(u)
    first = torch.argmax(ok.long(), dim=-1)  # first accepted proposal
    w_first = torch.gather(w, -1, first[..., None])[..., 0]
    return torch.where(ok.any(-1), w_first, x0)


_VMF_GL_X, _VMF_GL_W = np.polynomial.legendre.leggauss(32)
_VMF_XI_CAP = 30.0


def _vmf_quad_hat_t(w, kappa, alpha):
    """(I_hat, J_hat) with X_hat = int_{-1}^w e^{kappa(t-w)} (1-t^2)^alpha
    (* t for J) dt via the xi = kappa (w - t) substitution (torch f64)."""
    kap = kappa.clamp_min(1e-6)
    xi_cap = (kap * (w + 1.0)).clamp_max(_VMF_XI_CAP)
    s = torch.as_tensor(0.5 * (_VMF_GL_X + 1.0), dtype=w.dtype)
    xi = xi_cap[..., None] * s
    t = w[..., None] - xi / kap[..., None]
    base = torch.exp(-xi) * (1.0 - t * t).clamp_min(1e-300) ** alpha
    wq = torch.as_tensor(0.5 * _VMF_GL_W, dtype=w.dtype)
    scale = (xi_cap / kap)[..., None]
    return ((base * wq * scale).sum(-1), (base * t * wq * scale).sum(-1))


class _VmfWImplicit(torch.autograd.Function):
    """Accepted cosine w with IMPLICIT kappa-gradients,
    dw/dkappa = -(J_hat - I_hat A_m(kappa)) / (1-w^2)^alpha — the same
    Figurnov-style derivative the jax sampler's custom_jvp computes
    (distributions/von_mises_fisher.py::_sample_w_jvp), re-derived in f64
    torch with the closed-form half-integer Bessel ratio."""

    @staticmethod
    def forward(ctx, w_raw, kappa, m):
        ctx.save_for_backward(w_raw, kappa)
        ctx.m = m
        return w_raw

    @staticmethod
    def backward(ctx, gw):
        w, kappa = ctx.saved_tensors
        m = ctx.m
        alpha = (m - 3.0) / 2.0
        with torch.no_grad():
            i_hat, j_hat = _vmf_quad_hat_t(w, kappa, alpha)
            a_mean = vmf_mean_resultant_t(m, kappa)
            dens = (1.0 - w * w).clamp_min(1e-300) ** alpha
            dwdk = -(j_hat - i_hat * a_mean) / dens.clamp_min(1e-30)
        return None, gw * dwdk, None


# ------------------------------------------ Riemannian normal (Poincare ball)
# The radial normalization and CDF use the reference family's CLOSED FORM:
# sinh^{n-1} expanded by binomials into erf integrals, computed in f64 with
# the dominant exponential factored out. This is exactly the alternating
# form that catastrophically cancels in f32 (why mvae_tpu uses positive-
# integrand quadrature instead — distributions/riemannian_normal.py), so the
# two implementations are fully independent.


def _riem_sinh_terms(n: int, c):
    """(coef_j, a_j) with sinh^{n-1}(sqrt(c) s) = 2^{-(n-2)} sum_j coef_j
    sinh(a_j s); requires n even (n-1 odd)."""
    assert n % 2 == 0, "closed-form torch Riemannian normal needs even n"
    p = (n - 2) // 2
    sq = torch.sqrt(c)
    return [((-1.0) ** j * math.comb(n - 1, j), (n - 1 - 2 * j) * sq)
            for j in range(p + 1)]


def _riem_log_radial_integral_t(n: int, r_hi, sigma, c):
    """log int_0^{r_hi} e^{-s^2/2 sigma^2} (sinh(sqrt(c) s)/sqrt(c))^{n-1} ds
    (r_hi=None -> infinity), f64 closed form with the largest exponential
    factored out so nothing overflows."""
    terms = _riem_sinh_terms(n, c)
    m_exp = terms[0][1] ** 2 * sigma * sigma / 2.0  # largest a_j
    inv_s2 = 1.0 / (sigma * math.sqrt(2.0))
    acc = None
    for coef, a in terms:
        if r_hi is None:
            e_term = 2.0 * torch.erf(a * sigma / math.sqrt(2.0))
        else:
            e_term = (torch.erf((r_hi - a * sigma * sigma) * inv_s2)
                      - torch.erf((r_hi + a * sigma * sigma) * inv_s2)
                      + 2.0 * torch.erf(a * sigma / math.sqrt(2.0)))
        piece = coef * torch.exp(a * a * sigma * sigma / 2.0 - m_exp) * e_term
        acc = piece if acc is None else acc + piece
    log_sum = torch.log(acc.clamp_min(1e-300))
    return (m_exp + log_sum + torch.log(sigma)
            + 0.5 * math.log(math.pi / 2.0) - math.log(2.0)
            - (n - 2) * math.log(2.0) - (n - 1) / 2.0 * torch.log(c))


def riem_log_partition_t(n: int, sigma, c):
    """log Z = log area(S^{n-1}) + log of the radial integral."""
    log_sphere = (math.log(2.0) + (n / 2.0) * math.log(math.pi)
                  - math.lgamma(n / 2.0))
    return log_sphere + _riem_log_radial_integral_t(n, None, sigma, c)


def _riem_log_w_t(n: int, r, sigma, c):
    """log of the unnormalized radial mass density w(r)."""
    return (-r * r / (2.0 * sigma * sigma)
            + (n - 1) * (_log_sindiv_t(-c * r * r)
                         + torch.log(r.clamp_min(1e-300))))


def riem_sample_radius_t(rounds, n: int, sigma, c):
    """Replay the two-envelope rejection over the mirrored proposal rounds
    with the torch model's own sigma/c, then attach implicit gradients via
    the surrogate  r = r_sg - (F(r_sg) - sg F)/(sg p)  so that
    dr/dtheta = -(dF/dtheta)/p(r) exactly (Figurnov et al.), with the
    closed-form radial CDF F. Twin of riemannian_normal.sample_radius."""
    nm1 = float(n - 1)
    with torch.no_grad():
        sig, cc = sigma.detach(), c.detach()
        sq = torch.sqrt(cc)
        chi_ok = sig * sig * cc * nm1 / 3.0 < 0.9
        var_chi = sig * sig / (1.0 - sig * sig * cc * nm1 / 3.0).clamp_min(0.1)
        sig_chi = torch.sqrt(var_chi)
        mu_tn = nm1 * sq * sig * sig
        r_acc = sig.clone().expand(rounds[0]["gamma"].shape).clone()
        accepted = torch.zeros(r_acc.shape, dtype=torch.bool)
        for rd in rounds:
            g, xi, u = (_to_t(rd["gamma"]), _to_t(rd["xi"]), _to_t(rd["u"]))
            r_chi = sig_chi * torch.sqrt(2.0 * g)
            x = sq * r_chi
            log_acc_chi = nm1 * (_log_sindiv_t(-x * x) - x * x / 6.0)
            r_tn = mu_tn + sig * xi
            x_tn = sq * r_tn.clamp_min(0.0)
            log_acc_tn = torch.where(
                r_tn > 0.0,
                nm1 * torch.log1p(-torch.exp(-(2.0 * x_tn).clamp_min(1e-30))),
                torch.full_like(r_tn, -float("inf")))
            r_prop = torch.where(chi_ok, r_chi, r_tn)
            log_acc = torch.where(chi_ok, log_acc_chi, log_acc_tn)
            ok = torch.log(u) <= log_acc
            newly = ok & ~accepted
            r_acc = torch.where(newly, r_prop, r_acc)
            accepted |= ok
        r_sg = r_acc.clamp_min(1e-30)
    log_den = _riem_log_radial_integral_t(n, None, sigma, c)
    f_cdf = torch.exp(_riem_log_radial_integral_t(n, r_sg, sigma, c)
                      - log_den)
    p_pdf = torch.exp(_riem_log_w_t(n, r_sg, sigma, c) - log_den)
    return r_sg - (f_cdf - f_cdf.detach()) / p_pdf.detach().clamp_min(1e-300)


# ------------------------------------------------------------------ the VAE


def _to_t(a, grad=False):
    # np.array copy: jax buffers expose read-only numpy views and torch
    # cannot wrap non-writable memory without UB warnings
    out = torch.as_tensor(np.array(a), dtype=DT)
    if grad:
        out = out.clone().requires_grad_(True)
    return out


class TorchVAEReplica:
    """Mirror of mvae_tpu's (MLP VAE, product latent) in f64 torch.

    comps: list of dicts {kind: 'e'|'h'|'s', dim, fixed_curvature} in
    component order. Initial weights come from the jax params pytree
    (vae.init_params layout)."""

    _DEFAULT_POSTERIOR = {"e": "normal", "h": "wrapped", "d": "wrapped",
                          "s": "vmf", "p": "wrapped", "u": "wrapped"}

    def __init__(self, jax_params, comps, beta=1.0):
        self.beta = float(beta)
        self.enc = [{k: _to_t(v, True) for k, v in lyr.items()}
                    for lyr in jax_params["encoder"]["layers"]]
        dec = jax_params["decoder"]
        self.dec = [{k: _to_t(v, True) for k, v in lyr.items()}
                    for lyr in dec["layers"]]
        self.dec_out = {k: _to_t(v, True) for k, v in dec["out"].items()}
        self.comps = []
        for spec, cp in zip(comps, jax_params["components"]):
            kind = spec["kind"]
            entry = {"kind": kind, "dim": int(spec["dim"]),
                     "posterior": spec.get(
                         "posterior", self._DEFAULT_POSTERIOR[kind]),
                     "fixed": bool(spec.get("fixed_curvature", True)),
                     # mirror of Component.sigma_cap: False = the raw
                     # (uncapped) reference model class, for the round-5
                     # basin study — the f64 regime needs no cap
                     "sigma_cap": bool(spec.get("sigma_cap", True))}
            for name in ("w_mu", "b_mu", "w_sig", "b_sig"):
                entry[name] = _to_t(cp[name], True)
            if "c_param" in cp:
                entry["c_param"] = _to_t(cp["c_param"], True)
            self.comps.append(entry)

    # --- parameter access ----------------------------------------------------

    def net_params(self):
        out = []
        for lyr in self.enc + self.dec + [self.dec_out]:
            out.extend([lyr["w"], lyr["b"]])
        for c in self.comps:
            out.extend([c["w_mu"], c["b_mu"], c["w_sig"], c["b_sig"]])
        return out

    def curv_params(self):
        return [c["c_param"] for c in self.comps if "c_param" in c]

    def curvature(self, c):
        """K from the unconstrained leaf — ops/manifold.py semantics:
        sign * exp(c_param) for sign-pinned kinds, identity for 'u'."""
        if c["kind"] == "e":
            return None
        if c["kind"] == "u":
            return c["c_param"]
        sign = {"h": -1.0, "d": -1.0, "s": 1.0, "p": 1.0}[c["kind"]]
        return sign * torch.exp(c["c_param"])

    def to_jax_params(self, like):
        """Trained torch weights -> jax pytree with `like`'s structure."""
        enc = {"layers": tuple(
            {"w": np.asarray(l["w"].detach(), np.float32),
             "b": np.asarray(l["b"].detach(), np.float32)}
            for l in self.enc)}
        dec = {"layers": tuple(
            {"w": np.asarray(l["w"].detach(), np.float32),
             "b": np.asarray(l["b"].detach(), np.float32)}
            for l in self.dec),
            "out": {"w": np.asarray(self.dec_out["w"].detach(), np.float32),
                    "b": np.asarray(self.dec_out["b"].detach(), np.float32)}}
        new_comps = []
        for c, cp in zip(self.comps, like["components"]):
            entry = {name: np.asarray(c[name].detach(), np.float32)
                     for name in ("w_mu", "b_mu", "w_sig", "b_sig")}
            if "c_param" in cp:
                entry["c_param"] = np.asarray(c["c_param"].detach(),
                                              np.float32)
            new_comps.append(entry)
        return jax.tree.map(
            jnp.asarray,
            {"encoder": enc, "decoder": dec, "components": tuple(new_comps)})

    # --- forward -------------------------------------------------------------

    def encode(self, x):
        h = x
        for lyr in self.enc:
            h = torch.relu(h @ lyr["w"] + lyr["b"])
        return h

    def decode(self, z):
        h = z
        for lyr in self.dec:
            h = torch.relu(h @ lyr["w"] + lyr["b"])
        return h @ self.dec_out["w"] + self.dec_out["b"]

    def _component_draw(self, c, feats, noise):
        """(z, log_q, log_p, kl) for one component — reference semantics
        (principal branch, single-sample MC KL except e/vMF analytic)."""
        raw_mu = feats @ c["w_mu"] + c["b_mu"]
        raw_sig = feats @ c["w_sig"] + c["b_sig"]
        kind, post, n = c["kind"], c["posterior"], c["dim"]
        ones = torch.ones((), dtype=DT)

        if post == "normal":
            mu = raw_mu
            sigma = torch.nn.functional.softplus(raw_sig)
            eps = _to_t(noise["eps"])
            z = mu + sigma * eps
            log_q = gaussian_log_prob_t(z - mu, sigma)
            log_p = gaussian_log_prob_t(z, ones)
            kl = 0.5 * (sigma ** 2 + mu ** 2 - 1.0
                        - 2.0 * torch.log(sigma)).sum(-1)
            return z, log_q, log_p, kl

        if post == "wrapped" and kind == "h":
            k = self.curvature(c)
            mu = lorentz_exp_mu0_t(raw_mu, k)
            sigma = torch.nn.functional.softplus(raw_sig)
            v = sigma * _to_t(noise["eps"])
            z = lorentz_sample_projection_mu0_t(v, mu, k)
            v_p = lorentz_inverse_sample_projection_mu0_t(z, mu, k)
            r_p = torch.linalg.vector_norm(v_p, dim=-1)
            log_q = (gaussian_log_prob_t(v_p, sigma)
                     - lorentz_logdet_t(r_p, n, k))
            v0 = lorentz_inverse_sample_projection_mu0_t(
                z, torch.cat([1.0 / torch.sqrt(-k).expand(*z.shape[:-1], 1),
                              torch.zeros_like(z[..., 1:])], dim=-1), k)
            r0 = torch.linalg.vector_norm(v0, dim=-1)
            log_p = (gaussian_log_prob_t(v0, ones)
                     - lorentz_logdet_t(r0, n, k))
            return z, log_q, log_p, log_q - log_p

        if post == "wrapped" and kind == "s":
            # wrapped normal on the embedded sphere (round-4 family):
            # sigma rides the injectivity-radius cap; log q is the
            # round-trip-free drawn form (wraps=0 principal semantics)
            k = self.curvature(c)
            mu = sphere_exp_mu0_t(raw_mu, k)
            sigma = torch.nn.functional.softplus(raw_sig)
            if c["sigma_cap"]:
                sigma = cap_sigma_positive_k_t(sigma, k)
            v = sigma * _to_t(noise["eps"])
            z = sphere_exp_t(mu, sphere_pt_mu0_t(v, mu, k), k)
            log_q = wrapped_logq_drawn_t(v, sigma, k,
                                         positive_reachable=True)
            v0 = sphere_log_mu0_t(z, k)
            log_p = (gaussian_log_prob_t(v0, ones)
                     - (n - 1) * _log_sindiv_t(k * (v0 * v0).sum(-1)))
            return z, log_q, log_p, log_q - log_p

        if post == "wrapped":  # kappa-stereographic kinds d / p / u
            k = self.curvature(c)
            mu = stereo_exp_mu0_t(raw_mu, k)
            sigma = torch.nn.functional.softplus(raw_sig)
            if kind in ("p", "u") and c["sigma_cap"]:
                # curvature can be positive: injectivity-radius cap
                sigma = cap_sigma_positive_k_t(sigma, k)
            v = sigma * _to_t(noise["eps"])
            z = stereo_project_t(
                mobius_add_t(mu, stereo_exp_mu0_t(v, k), k), k)
            log_q = wrapped_logq_drawn_t(
                v, sigma, k, positive_reachable=kind in ("p", "u"))
            v0 = stereo_log_mu0_t(z, k)
            log_p = (gaussian_log_prob_t(v0, ones)
                     - (n - 1) * _log_sindiv_t(k * (v0 * v0).sum(-1)))
            return z, log_q, log_p, log_q - log_p

        if post == "vmf":
            assert kind == "s", "torch vMF replica implemented on 's'"
            m = n + 1
            k = self.curvature(c)
            mu = sphere_exp_mu0_t(raw_mu, k)  # ambient (B, m), radius R
            kappa = torch.nn.functional.softplus(raw_sig).squeeze(-1) + 1.0
            if m == 3:
                w = vmf3_sample_w(_to_t(noise["u"]), kappa)
            else:
                w_raw = vmf_wood_w_t(_to_t(noise["eps_beta"]),
                                     _to_t(noise["u"]), kappa.detach(), m)
                w = _VmfWImplicit.apply(w_raw, kappa, m)
            g = _to_t(noise["g"])
            v = g / torch.linalg.vector_norm(
                g, dim=-1, keepdim=True).clamp_min(1e-30)
            sin_w = torch.sqrt((1.0 - w * w).clamp_min(1e-38))
            zprime = torch.cat([w[..., None], sin_w[..., None] * v], dim=-1)
            mu_unit = mu / torch.linalg.vector_norm(
                mu, dim=-1, keepdim=True).clamp_min(1e-30)
            z_unit = householder_rotate_t(zprime, mu_unit)
            z = z_unit / torch.sqrt(k)
            cos = (mu_unit * z_unit).sum(-1)
            r_area = (m - 1) / 2.0 * torch.log(k)
            log_q = vmf_log_c_t(m, kappa) + kappa * cos + r_area
            log_p = -vmf_log_area_unit(m) + r_area
            kl = vmf_kl_to_uniform_t(m, kappa)
            return z, log_q, log_p, kl

        assert post == "riemannian", post
        assert kind == "d", "torch Riemannian replica implemented on 'd'"
        k = self.curvature(c)
        cc = -k  # c > 0
        mu = stereo_exp_mu0_t(raw_mu, k)
        sigma = torch.nn.functional.softplus(raw_sig).squeeze(-1)
        r = riem_sample_radius_t(noise["rounds"], n, sigma, cc)
        g = _to_t(noise["g"])
        direction = g / torch.linalg.vector_norm(
            g, dim=-1, keepdim=True).clamp_min(1e-30)
        v = r[..., None] * direction
        z = stereo_project_t(mobius_add_t(mu, stereo_exp_mu0_t(v, k), k), k)
        d_q = stereo_distance_t(mu, z, k)
        log_q = (-d_q * d_q / (2.0 * sigma * sigma)
                 - riem_log_partition_t(n, sigma, cc))
        d_p = stereo_distance_t(torch.zeros_like(z), z, k)
        log_p = (-d_p * d_p / 2.0
                 - riem_log_partition_t(n, torch.ones_like(sigma), cc))
        return z, log_q, log_p, log_q - log_p

    def forward(self, x_bin, noise):
        """Per-example (elbo, log_px, kl_total); x_bin (B, D) f64."""
        feats = self.encode(x_bin)
        zs, kls = [], []
        for c, cn in zip(self.comps, noise["comps"]):
            z, _lq, _lp, kl = self._component_draw(c, feats, cn)
            zs.append(z)
            kls.append(kl)
        z = torch.cat(zs, dim=-1)
        logits = self.decode(z)
        log_px = (x_bin * logits
                  - torch.nn.functional.softplus(logits)).sum(-1)
        kl_total = sum(kls)
        return log_px - self.beta * kl_total, log_px, kl_total


class TorchTrainerReplica:
    """Adam + curvature burn-in, mirroring mvae_tpu.train.Trainer
    (trainer.py:97-117 make_optimizer/_mask_curvature_grads)."""

    def __init__(self, model: TorchVAEReplica, lr=1e-3, curvature_lr=1e-4,
                 burnin_epochs=10, steps_per_epoch=1):
        self.model = model
        groups = [{"params": model.net_params(), "lr": lr}]
        curv = model.curv_params()
        if curv:
            groups.append({"params": curv, "lr": curvature_lr})
        self.opt = torch.optim.Adam(groups, betas=(0.9, 0.999), eps=1e-8)
        self.burnin_steps = burnin_epochs * steps_per_epoch
        self.step = 0

    def train_step(self, x_bin, noise):
        self.opt.zero_grad(set_to_none=False)
        elbo, log_px, kl = self.model.forward(x_bin, noise)
        loss = -elbo.mean()
        loss.backward()
        for c in self.model.comps:
            if "c_param" not in c:
                continue
            if c["fixed"] or self.step < self.burnin_steps:
                # keep grad present-but-zero: Adam still advances this
                # param's step/moment decay, exactly like the traced mask
                # in trainer.py:104-117 feeding zeros through optax.adam
                c["c_param"].grad = torch.zeros_like(c["c_param"])
        self.opt.step()
        self.step += 1
        return {"loss": float(loss.detach()),
                "elbo": float(elbo.mean().detach()),
                "bce": float(-log_px.mean().detach()),
                "kl": float(kl.mean().detach())}

    def train_epoch(self, train_data, perm, step_noises, bs):
        stats = None
        for s, noise in enumerate(step_noises):
            rows = perm[s * bs:(s + 1) * bs]
            x = _to_t(train_data[rows])
            # binarize in the data shape (u_bin mirrors the Trainer's
            # (bs,)+data_shape draw), then flatten for the MLP exactly as
            # vae.encode does
            x_bin = (_to_t(noise["u_bin"]) < x).to(DT).reshape(len(rows), -1)
            stats = self.train_step(x_bin, noise)
        return stats
