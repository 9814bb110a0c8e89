"""Estimator-semantics parity: this framework vs an independent PyTorch-f64
replica of the REFERENCE estimator (tests/parity/torch_oracle.py).

For every judged latent geometry, identical weights + identical inputs +
identical latent draws must produce (SURVEY §3.2-3.3):

* identical encoder features, decoder logits, and Bernoulli log p(x|z);
* identical PRINCIPAL-BRANCH posterior/prior log-densities (sharp, ~1e-9:
  the oracle implements the reference's principal-branch wrapped-normal
  log_prob; the jax principal branch must match it exactly);
* a quantified, non-negative wrap-image delta between this framework's
  EXACT spherical density (wrap-image sum) and the principal branch — the
  one deliberate estimator difference. At trained-regime sigma it is
  < 1e-4 nat (recorded in PARITY.md); at sigma ~ 0.7 it can reach ~0.5 nat
  on individual samples, which is the principal branch being wrong, not us;
* identical single-sample-KL ELBO and IWAE-n log-likelihood composition.

This pins the 0.1-nat north-star down to semantics: any residual LL gap vs
the paper tables must then come from data/training, not estimator math.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components, reparametrize
from mvae_tpu.distributions import normal as jnormal
from mvae_tpu.models import vae
from mvae_tpu.ops import stable

from . import torch_oracle as oracle

F64 = jnp.float64

SPECS = ["e6", "h6", "d6", "s6:wrapped", "s6", "p6", "p6:vmf", "u6",
         "h2,s2,e2"]

DATA_DIM = 48
H_DIM = 40
BATCH = 16
SIGMA = 0.25  # trained-regime posterior scale (see _setup)


def _np(a):
    return np.asarray(a)


def _np_tree(tree):
    return jax.tree.map(np.asarray, tree)


def _setup(spec, wraps=1):
    """Model + batch with the sigma heads pinned near a TRAINED-regime
    posterior scale (~0.25): at init sigma ~ softplus(0) ~ 0.7, where the
    exact-vs-principal wrap mass on positive curvature is O(0.1) nat and
    parity tolerances would have to be meaninglessly loose."""
    comps = parse_components(spec, fixed_curvature=True, wraps=wraps)
    cfg = vae.VAEConfig(components=comps, data_shape=(DATA_DIM,),
                        arch="mlp", h_dim=H_DIM)
    params = vae.init_params(jax.random.key(0), cfg, dtype=F64)
    b_sig = math.log(math.expm1(SIGMA))  # softplus(b_sig) == SIGMA
    new_comps = []
    for comp, cp in zip(comps, params["components"]):
        cp = dict(cp)
        if comp.posterior != "vmf":  # vMF kappa has no wrap-image issue
            cp["w_sig"] = 0.05 * cp["w_sig"]
            cp["b_sig"] = jnp.full_like(cp["b_sig"], b_sig)
        new_comps.append(cp)
    params["components"] = tuple(new_comps)
    x = (jax.random.uniform(jax.random.key(1), (BATCH, DATA_DIM), F64)
         > 0.5).astype(F64)
    return cfg, params, x


def _jax_component_pass(key, cfg, params, feats):
    """Replicates forward_from_features' per-component loop, returning the
    pieces (mu, scale, k, rep) the oracle needs."""
    keys = jax.random.split(key, len(cfg.components))
    out = []
    for comp, cp, ck in zip(cfg.components, params["components"], keys):
        mu, scale, k = comp.posterior_params(cp, feats)
        rep = reparametrize(ck, comp, cp, feats)
        out.append((comp, mu, scale, k, rep))
    return out


def _jax_principal_log_q(man, z, mu, sigma, k):
    """This framework's density restricted to the principal branch with
    the EXACT (unmollified) log-det — the reference's semantics, for the
    sharp oracle comparison."""
    v = man.inverse_sample_projection_mu0(z, mu, k)
    r = stable.safe_norm(v)
    return jnormal.log_prob(v, jnp.zeros((), v.dtype), sigma) \
        - man.logdet_exp_mu0(r, k)


def _oracle_log_q_log_p(comp, mu, scale, k, z):
    """Reference-semantics posterior/prior log-densities at z."""
    kind = comp.manifold.kind
    kf = float(k)
    if comp.posterior == "normal":
        log_q = oracle.gaussian_log_prob(_np(z) - _np(mu), _np(scale))
        log_p = oracle.gaussian_log_prob(_np(z), 1.0)
        return log_q, log_p
    if comp.posterior == "vmf":
        m = comp.dim + 1
        if kind == "p":
            z_t = oracle.projected_to_sphere(_np(z), kf)
            mu_t = oracle.projected_to_sphere(_np(mu), kf)
        else:
            z_t, mu_t = _np(z), _np(mu)
        log_q = oracle.vmf_log_prob(z_t, mu_t, _np(scale), kf)
        log_p = oracle.t(np.full(
            z.shape[:-1], oracle.hyperspherical_uniform_log_prob(m, kf)))
        return log_q, log_p
    # wrapped
    log_q = oracle.wrapped_normal_log_prob(kind, _np(z), _np(mu),
                                           _np(scale), kf)
    if kind in ("h", "s"):
        mu0 = (oracle.lorentz_mu0(comp.dim, kf) if kind == "h"
               else oracle.sphere_mu0(comp.dim, kf))
    else:
        mu0 = np.zeros(comp.dim)
    log_p = oracle.wrapped_normal_log_prob(
        kind, _np(z), np.broadcast_to(_np(mu0), _np(z).shape), 1.0, kf)
    return log_q, log_p


# Wrap-image delta bounds at trained-regime scales. The posterior at sigma
# 0.25 has wrap mass below f64 noise, but the PRIOR at sigma 1 on K = 1,
# n = 6 keeps real mass in the nearest image: the 1/sin^5 logdet
# concentration near the antipode amplifies the Gaussian tail, reaching
# ~0.14 nat per draw at radius ~2.5 and log 2 in the limit r -> pi (equal
# principal/image mass at the injectivity radius). Only positive-curvature
# kinds have wrap images at all; wraps=0 strict mode removes them entirely.
_WRAP_TOL = {"s": 0.25, "p": 0.25, "u": 0.25}


def _wrap_tol(comp, wraps=1):
    if wraps == 0:
        return 1e-9  # strict parity mode: both sides are principal-branch
    return _WRAP_TOL.get(comp.manifold.kind, 1e-9)


@pytest.mark.parametrize("spec", SPECS)
class TestForwardParity:
    def test_encoder_and_decoder_match(self, spec):
        cfg, params, x = _setup(spec)
        np_params = _np_tree(params)
        feats = vae.encode(cfg, params, x)
        feats_t = oracle.mlp_encoder(np_params["encoder"], _np(x))
        np.testing.assert_allclose(_np(feats), feats_t.numpy(), rtol=1e-12)

        pieces = _jax_component_pass(jax.random.key(2), cfg, params, feats)
        z = jnp.concatenate([rep.z for *_, rep in pieces], axis=-1)
        logits = vae.decode(cfg, params, z)
        logits_t = oracle.mlp_decoder(np_params["decoder"], _np(z))
        np.testing.assert_allclose(_np(logits), logits_t.numpy(),
                                   rtol=1e-10, atol=1e-11)
        log_px_z = vae.bernoulli_log_prob(logits, x).sum(-1)
        log_px_z_t = oracle.bernoulli_log_prob(logits_t, _np(x))
        np.testing.assert_allclose(_np(log_px_z), log_px_z_t.numpy(),
                                   rtol=1e-9, atol=1e-8)

    def test_principal_branch_densities_match_sharply(self, spec):
        """The SHARP cross-framework check: jax principal branch == torch
        oracle to f64 noise, for posterior and prior, on every geometry."""
        cfg, params, x = _setup(spec)
        feats = vae.encode(cfg, params, x)
        pieces = _jax_component_pass(jax.random.key(3), cfg, params, feats)
        for comp, mu, scale, k, rep in pieces:
            log_q_t, log_p_t = _oracle_log_q_log_p(comp, mu, scale, k, rep.z)
            if comp.posterior == "wrapped":
                man = comp.manifold
                lq0 = _jax_principal_log_q(man, rep.z, mu, scale, k)
                mu0 = jnp.broadcast_to(man.mu0(k, rep.z.dtype),
                                       rep.z.shape)
                lp0 = _jax_principal_log_q(man, rep.z, mu0,
                                           jnp.ones((), rep.z.dtype), k)
            else:  # normal / vmf: no wrap images, the full density is sharp
                lq0, lp0 = rep.log_q, rep.log_p
            np.testing.assert_allclose(
                _np(lq0), log_q_t.numpy(), rtol=1e-9, atol=2e-9,
                err_msg=f"{spec}/{comp.name} log_q")
            np.testing.assert_allclose(
                _np(lp0), log_p_t.numpy(), rtol=1e-9, atol=2e-9,
                err_msg=f"{spec}/{comp.name} log_p")

    def test_wrap_image_delta_quantified(self, spec):
        """The one deliberate estimator difference: jax sums wrap images,
        the reference does not. The delta must be >= 0 (wrap mass only
        adds) and below the trained-regime bound."""
        cfg, params, x = _setup(spec)
        feats = vae.encode(cfg, params, x)
        pieces = _jax_component_pass(jax.random.key(3), cfg, params, feats)
        for comp, mu, scale, k, rep in pieces:
            if comp.posterior != "wrapped":
                continue
            man = comp.manifold
            lq0 = _np(_jax_principal_log_q(man, rep.z, mu, scale, k))
            mu0 = jnp.broadcast_to(man.mu0(k, rep.z.dtype), rep.z.shape)
            lp0 = _np(_jax_principal_log_q(man, rep.z, mu0,
                                           jnp.ones((), rep.z.dtype), k))
            dq = _np(rep.log_q) - lq0
            dp = _np(rep.log_p) - lp0
            # wrap mass only adds; the round-4 shell MOLLIFIER perturbs
            # the full density by up to ~(delta*(x/pi)^3/sin x)^2/2 per
            # dim (~1e-7 at these draw radii), hence the small negative
            # allowance against the exact-log-det principal reference
            assert dq.min() > -1e-6 and dp.min() > -1e-6, (spec, comp.name)
            # posterior at sigma 0.25: wrap mass below noise; prior at
            # sigma 1: up to ~0.03 nat on these draws (measured r <~ 2)
            assert dq.max() < 1e-6, (spec, comp.name, dq.max())
            assert dp.max() < 5e-2, (spec, comp.name, dp.max())

    @pytest.mark.parametrize("wraps", [0, 1])
    def test_elbo_composition_matches(self, spec, wraps):
        if wraps == 1 and _wraps_modes(spec) == [0]:
            pytest.skip("wraps has no effect for this spec (no wrapped "
                        "positive-curvature component)")
        """ELBO = log p(x|z) - sum_c KL_c with the reference's KL choice
        per family (analytic for normal/vMF, single-sample MC otherwise).
        wraps=0 is the strict reference-estimator mode: agreement to f64
        noise; wraps=1 differs by the quantified prior wrap mass."""
        cfg, params, x = _setup(spec, wraps=wraps)
        feats = vae.encode(cfg, params, x)
        key = jax.random.key(4)
        pieces = _jax_component_pass(key, cfg, params, feats)

        # jax side, composed exactly as vae.elbo does
        fwd = vae.forward_from_features(key, cfg, params, x, feats)
        elbo_jax = _np(fwd.log_px_z - jnp.sum(fwd.kl_per_comp, axis=-1))

        # oracle side from the SAME z draws
        z = jnp.concatenate([rep.z for *_, rep in pieces], axis=-1)
        logits_t = oracle.mlp_decoder(_np_tree(params)["decoder"], _np(z))
        log_px_z_t = oracle.bernoulli_log_prob(logits_t, _np(x)).numpy()
        kl_total = np.zeros(BATCH)
        for comp, mu, scale, k, rep in pieces:
            if comp.posterior == "normal":
                kl = oracle.normal_kl_std(_np(mu), _np(scale)).numpy()
            elif comp.posterior == "vmf":
                kl = oracle.vmf_kl_to_uniform(
                    comp.dim + 1, _np(scale), float(k)).numpy()
                kl = np.broadcast_to(kl, (BATCH,))
            else:
                log_q_t, log_p_t = _oracle_log_q_log_p(comp, mu, scale, k,
                                                       rep.z)
                kl = (log_q_t - log_p_t).numpy()
            kl_total = kl_total + kl
        elbo_t = log_px_z_t - kl_total
        tol = max(_wrap_tol(c, wraps) for c in cfg.components) * 2
        np.testing.assert_allclose(elbo_jax, elbo_t, atol=tol, rtol=1e-7)


def _wraps_modes(spec):
    """wraps only changes any density when a WRAPPED posterior lives on a
    positive-curvature kind (s/p/u) — vMF posteriors pair with the uniform
    prior and negative curvature has no wrap images. Everything else would
    compile (and test) the identical program twice."""
    comps = parse_components(spec, fixed_curvature=True)
    if any(c.manifold.kind in ("s", "p", "u") and c.posterior != "vmf"
           for c in comps):
        return [0, 1]
    return [0]


@pytest.mark.parametrize("spec,wraps",
                         [(s, w) for s in SPECS for w in _wraps_modes(s)])
def test_iwae_composition_matches(spec, wraps):
    """IWAE-n: identical log-weights (to wrap-image delta; to f64 noise in
    the wraps=0 strict-parity mode) and identical logsumexp - log n
    composition; also pins vae.log_likelihood to the replicated key/chunk
    structure."""
    n_samples, chunk = 40, 20
    cfg, params, x = _setup(spec, wraps=wraps)
    feats = vae.encode(cfg, params, x)
    key = jax.random.key(5)

    # replicate vae.log_likelihood's key tree exactly
    chunk_keys = jax.random.split(key, n_samples // chunk)
    sample_keys = [sk for ck in chunk_keys
                   for sk in jax.random.split(ck, chunk)]

    log_w_jax, log_w_t = [], []
    for sk in sample_keys:
        fwd = vae.forward_from_features(sk, cfg, params, x, feats)
        log_w_jax.append(_np(fwd.log_px_z + fwd.log_p - fwd.log_q))
        # oracle recomputation at the same z
        pieces = _jax_component_pass(sk, cfg, params, feats)
        z = jnp.concatenate([rep.z for *_, rep in pieces], axis=-1)
        logits_t = oracle.mlp_decoder(_np_tree(params)["decoder"], _np(z))
        lw = oracle.bernoulli_log_prob(logits_t, _np(x)).numpy()
        for comp, mu, scale, k, rep in pieces:
            log_q_t, log_p_t = _oracle_log_q_log_p(comp, mu, scale, k, rep.z)
            lw = lw + log_p_t.numpy() - log_q_t.numpy()
        log_w_t.append(lw)

    log_w_jax = np.stack(log_w_jax)
    log_w_t = np.stack(log_w_t)
    tol = max(_wrap_tol(c, wraps) for c in cfg.components) * 2
    np.testing.assert_allclose(log_w_jax, log_w_t, atol=tol, rtol=1e-7)

    ll_jax = _np(vae.log_likelihood(key, cfg, params, x, n_samples, chunk))
    ll_manual = _np(jax.scipy.special.logsumexp(
        jnp.asarray(log_w_jax), axis=0) - jnp.log(float(n_samples)))
    np.testing.assert_allclose(ll_jax, ll_manual, rtol=1e-10)

    ll_t = oracle.iwae_log_likelihood(log_w_t).numpy()
    np.testing.assert_allclose(ll_jax, ll_t, atol=tol, rtol=1e-7)
