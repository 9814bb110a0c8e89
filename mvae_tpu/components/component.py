"""Latent-space components: one constant-curvature factor + posterior family.

Capability parity with ``mt/mvae/components/`` + ``mt/mvae/sampling/`` in
oskopek/mvae [UNVERIFIED]: a Component binds (manifold, latent dim, posterior
family, curvature parameter, encoder heads), and its sampling procedure maps
shared encoder features to a reparameterized draw with log q / log p / KL
(analytic KL where the reference has it — Euclidean normal and vMF-vs-
uniform — single-sample MC estimate ``log q(z|x) - log p(z)`` otherwise,
matching the reference's ELBO semantics, SURVEY.md §7 hard part #4).

TPU-native shape: a Component is a STATIC dataclass (hashable, trace-time
dispatch); its learnable state is a plain dict pytree
{w_mu, b_mu, w_sig, b_sig, c_param} living in the model params. The full
product latent runs as straight-line jitted code over the component list.

Posterior families:
  'wrapped'    WrappedNormal(mu, sigma), prior WrappedNormal(mu0, 1)
  'normal'     Euclidean diagonal normal, prior N(0, I), analytic KL
  'vmf'        von Mises-Fisher(mu, kappa), prior HypersphericalUniform,
               analytic KL. On 's' the density lives on the radius-R
               sphere directly; on 'p' (the reference's
               ProjectedSphericalVmfProcedure [LOW CONF]) the vMF is
               sampled on the embedded S^n and pushed through the
               stereographic isometry — densities w.r.t. the Riemannian
               measure are isometry-invariant, so log q / log p / KL are
               evaluated in sphere coordinates with m = dim + 1.
  'riemannian' RiemannianNormal(mu, sigma), prior RiemannianNormal(mu0, 1)
               (h/d kinds)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..distributions import (hyperspherical_uniform, normal,
                             riemannian_normal, von_mises_fisher,
                             wrapped_normal)
from ..ops import Manifold
from ..ops import stable

POSTERIORS = ("wrapped", "normal", "vmf", "riemannian")

DEFAULT_POSTERIOR = {
    "e": "normal",
    "h": "wrapped",
    "d": "wrapped",
    "s": "vmf",
    "p": "wrapped",
    "u": "wrapped",
}

_VALID = {
    "normal": ("e",),
    "wrapped": ("e", "h", "d", "s", "p", "u"),
    "vmf": ("s", "p"),
    "riemannian": ("h", "d"),
}


@dataclasses.dataclass(frozen=True)
class Component:
    """Static descriptor of one latent factor.

    scalar_sigma: the reference's ``scalar_parametrization`` flag — one
    shared (isotropic) posterior scale per component instead of a diagonal
    one (vMF/Riemannian posteriors are scalar-concentration by nature).
    """

    manifold: Manifold
    posterior: str
    fixed_curvature: bool = True
    scalar_sigma: bool = False
    # wrap-image pairs summed in wrapped-normal densities on positive
    # curvature: 1 = exact density at trained sigma (default); 0 = the
    # reference's PRINCIPAL-BRANCH-ONLY estimator, for strict parity runs
    wraps: int = 1
    # injectivity-radius soft cap on wrapped posterior scales when the
    # curvature can be positive (cap_sigma_positive_k, the round-4
    # stability fix). False = the raw reference model class (no cap) —
    # for basin/bias studies; uncapped components route to the jnp tail
    # (the fused kernel bakes the cap in).
    sigma_cap: bool = True

    def __post_init__(self):
        if self.posterior not in POSTERIORS:
            raise ValueError(f"unknown posterior {self.posterior!r}")
        if self.manifold.kind not in _VALID[self.posterior]:
            raise ValueError(
                f"posterior {self.posterior!r} unsupported on manifold kind "
                f"{self.manifold.kind!r} (valid: {_VALID[self.posterior]})")

    @property
    def dim(self) -> int:
        return self.manifold.dim

    @property
    def ambient_dim(self) -> int:
        return self.manifold.ambient_dim

    @property
    def name(self) -> str:
        return f"{self.manifold.kind}{self.manifold.dim}"

    # --- parameters ---------------------------------------------------------

    def init_params(self, key, feature_dim: int, init_k: float = 1.0,
                    dtype=jnp.float32):
        """Head weights + curvature leaf. Heads follow the reference shape:
        Linear -> tangent mu at mu0 (expmap'd), Linear -> softplus scale."""
        k_mu, k_sig = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(jnp.asarray(feature_dim, dtype))
        n_scale = self.n_scale
        params = {
            "w_mu": (scale * jax.random.normal(
                k_mu, (feature_dim, self.dim), dtype)),
            "b_mu": jnp.zeros((self.dim,), dtype),
            "w_sig": (scale * jax.random.normal(
                k_sig, (feature_dim, n_scale), dtype)),
            "b_sig": jnp.zeros((n_scale,), dtype),
        }
        if self.manifold.has_curvature_param:
            params["c_param"] = self.manifold.init_curvature_param(
                init_k, dtype)
        return params

    def curvature(self, params):
        if not self.manifold.has_curvature_param:
            return jnp.zeros((), jnp.result_type(params["w_mu"]))
        return self.manifold.curvature(params["c_param"])

    # --- posterior parameter heads ------------------------------------------

    @property
    def n_scale(self) -> int:
        """Width of the scale head (1 for scalar-concentration families)."""
        if self.posterior in ("vmf", "riemannian") or self.scalar_sigma:
            return 1
        return self.dim

    @property
    def head_width(self) -> int:
        """Total head output width (mu tangent + scale), for GEMM fusion."""
        return self.dim + self.n_scale

    def posterior_params_from_raw(self, params, raw):
        """raw (..., head_width) pre-activations -> (mu ambient, scale, k).

        Split out so the model can run ALL components' heads as ONE fused
        GEMM (the per-component tiny matmuls dominated the product-latent
        step time on TPU)."""
        k = self.curvature(params)
        mu_tan = raw[..., :self.dim]
        mu = self.manifold.exp_map_mu0(mu_tan, k)
        raw_sig = raw[..., self.dim:]
        if self.posterior == "vmf":
            # concentration: softplus + 1 keeps the Wood sampler in its
            # efficient regime and matches the s-vae-style head
            scale = jax.nn.softplus(raw_sig).squeeze(-1) + 1.0
        else:
            scale = jax.nn.softplus(raw_sig)  # sigma > 0
            if self.posterior == "riemannian":
                scale = scale.squeeze(-1)
            elif (self.posterior == "wrapped"
                  and self.manifold.curvature_sign >= 0
                  and self.manifold.kind != "e"
                  and self.sigma_cap):
                # wrapped on s/p/u: saturate at the injectivity radius
                scale = cap_sigma_positive_k(scale, k)
        return mu, scale, k

    def posterior_params(self, params, features):
        """features (..., F) -> (mu ambient, scale, k)."""
        raw = jnp.concatenate(
            [features @ params["w_mu"] + params["b_mu"],
             features @ params["w_sig"] + params["b_sig"]], axis=-1)
        return self.posterior_params_from_raw(params, raw)


def cap_sigma_positive_k(sigma, k):
    """Saturating posterior-scale cap at the positive-K injectivity radius
    pi R = pi / sqrt(K) (round-4 stability fix, applied to wrapped
    posteriors on manifolds whose curvature can be positive).

    Rationale: on a compact space, wrapped normals with sigma beyond the
    injectivity radius are statistically indistinguishable from uniform —
    the tangent parametrization loses identifiability, and any truncation
    of the wrap-image sum underestimates log q there, which round 3's
    trainer exploited as free ELBO (sigma drifted to 38 = 6 periods;
    results/r4_nan_probe_s6-wrapped.json). The cap is a smooth p=6
    soft-min:  sigma_eff = cap * t * (1 + t^6)^(-1/6),  t = sigma/cap —
    identity to <0.02% for sigma <= cap/3 (so moderate-sigma parity with
    the reference family is untouched), asymptoting to cap = pi R.

    Smooth in K through 0: for K <= 0 the clamp floor makes cap ~ 1e6 pi
    and the correction underflows to exactly 0 (sigma unchanged), so the
    same traced expression serves the universal manifold mid-crossing.
    """
    cap = jnp.pi * jax.lax.rsqrt(jnp.maximum(k, 1e-12))
    t = jnp.minimum(sigma / cap, 8.0)       # gradient ~2e-6 beyond t=8
    t2 = t * t
    return cap * t * (1.0 + t2 * t2 * t2) ** (-1.0 / 6.0)


class Reparametrized(NamedTuple):
    """Per-component reparameterization result (reference namedtuple parity)."""

    z: jax.Array        # (..., ambient_dim) latent draw
    log_q: jax.Array    # (...,) posterior log-density at z
    log_p: jax.Array    # (...,) prior log-density at z
    kl: jax.Array       # (...,) KL estimate used in the ELBO


def reparametrize(key, comp: Component, params, features,
                  raw=None) -> Reparametrized:
    """Sample z ~ q(.|features) with log q, log p, and the ELBO KL term.

    Pass ``raw`` (the component's slice of a fused head GEMM) to skip the
    per-component head matmuls."""
    man = comp.manifold
    if raw is None:
        mu, scale, k = comp.posterior_params(params, features)
    else:
        mu, scale, k = comp.posterior_params_from_raw(params, raw)
    dtype = features.dtype

    if comp.posterior == "normal":
        z = normal.sample(key, mu, scale)
        log_q = normal.log_prob(z, mu, scale)
        zero = jnp.zeros((), dtype)
        log_p = normal.log_prob(z, zero, jnp.ones((), dtype))
        kl = normal.kl_std(mu, scale)
        return Reparametrized(z, log_q, log_p, kl)

    if comp.posterior == "wrapped":
        z, log_q = wrapped_normal.sample_and_log_prob(key, man, mu, scale, k,
                                                      wraps=comp.wraps)
        log_p = wrapped_normal.log_prob_mu0(man, z, jnp.ones((), dtype), k,
                                            wraps=comp.wraps)
        kl = log_q - log_p
        return Reparametrized(z, log_q, log_p, kl)

    if comp.posterior == "vmf":
        if man.kind == "p":
            # vMF on the projected sphere P^n: sample on the EMBEDDED S^n
            # and push through the stereographic isometry. Projected
            # coordinates are not norm-constrained (P^n's mu0 is the zero
            # vector), so running the vMF machinery in them would pin |z|
            # and collapse the posterior to an S^{n-1} slice — the round-1
            # bug. Densities w.r.t. the Riemannian measure are invariant
            # under the isometry, so log q / log p are evaluated at the
            # sphere pre-images with ambient m = dim + 1.
            from ..ops import sphere as _sphere
            mu_s = _sphere.projected_to_sphere(mu, k)
            z_s = von_mises_fisher.sample(key, mu_s, scale, k)
            z = _sphere.sphere_to_projected(z_s, k)
        else:
            mu_s = mu
            z_s = z = von_mises_fisher.sample(key, mu, scale, k)
        log_q = von_mises_fisher.log_prob(z_s, mu_s, scale, k)
        log_p = hyperspherical_uniform.log_prob(z_s, k)
        kl = von_mises_fisher.kl_to_uniform(comp.dim + 1, scale)
        return Reparametrized(z, log_q, log_p, kl)

    if comp.posterior == "riemannian":
        z = riemannian_normal.sample(key, man, mu, scale, k)
        log_q = riemannian_normal.log_prob(man, z, mu, scale, k)
        mu0 = man.mu0(k, dtype)
        log_p = riemannian_normal.log_prob(man, z, mu0, jnp.ones((), dtype),
                                           k)
        kl = log_q - log_p
        return Reparametrized(z, log_q, log_p, kl)

    raise AssertionError(comp.posterior)


def sample_prior(key, comp: Component, params, shape, dtype=jnp.float32):
    """Draw from the component prior (for generation / ancestral sampling)."""
    man = comp.manifold
    k = comp.curvature(params)
    if comp.posterior == "normal":
        return jax.random.normal(key, shape + (comp.dim,), dtype)
    if comp.posterior == "vmf":
        # uniform prior on the sphere; for 'p' push it through the
        # stereographic isometry (the uniform measure maps to the
        # Riemannian-uniform measure on P^n)
        z_s = hyperspherical_uniform.sample(key, shape, comp.dim + 1, k,
                                            dtype)
        if man.kind == "p":
            from ..ops import sphere as _sphere
            return _sphere.sphere_to_projected(z_s, k)
        return z_s
    if comp.posterior == "riemannian":
        mu0 = jnp.broadcast_to(man.mu0(k, dtype), shape + (man.ambient_dim,))
        return riemannian_normal.sample(key, man, mu0,
                                        jnp.ones(shape, dtype), k)
    mu0 = jnp.broadcast_to(man.mu0(k, dtype), shape + (man.ambient_dim,))
    return wrapped_normal.sample(key, man, mu0, jnp.ones((), dtype), k)
