"""Fused Pallas kernels for the ENTIRE per-component training tail.

The product-latent training step spends roughly half its device time in
~50 tiny XLA fusions: per-component head activations (``exp_map_mu0`` of
the mu head, softplus scales), reparameterized draws, exact posterior /
prior log-densities and the single-sample MC KL — all on (batch, n<=12)
arrays where the fixed per-fusion cost dominates the few KB of work
(SURVEY.md §3.2 hot spots; RESULTS_r3.md §2 profile table). This module
fuses that whole tail — EVERY component of the product latent at once —
into ONE forward Pallas kernel and ONE backward Pallas kernel.

Design:

* **Batch along lanes.** Every (B, n) tensor computes transposed as n
  sublane rows of B lanes, so a full-width op costs ceil(n/8) * B/128
  vregs instead of the 128-lane-padded cost XLA pays in (B, n<=12)
  orientation. Blocks are passed in natural (B, .) orientation and
  transposed ONCE in VMEM (the same trick as
  ``manifold_kernels._stereo_dist_kernel``), so the surrounding XLA
  program sees zero relayouts.
* **The backward kernel is not hand-derived.** It recomputes the forward
  tile under ``jax.vjp`` INSIDE the kernel body (VMEM-resident) and
  applies the transposed chain to the incoming cotangents — one kernel
  replaces the backward fusion swarm exactly as the forward kernel
  replaces the forward one, and the differentiated math is BY
  CONSTRUCTION the same expression graph the forward kernel runs.

Families covered (eligibility is whole-product — models/vae.py falls back
to the jnp path if any component is unsupported):

  'normal' on e         mu + sigma*eps, analytic KL.
  'wrapped' on h        tangent draw -> PT -> exp on the hyperboloid. The
                        principal preimage of the emitted z is the drawn
                        tangent itself (K < 0: exp_mu0 is injective), so
                        log q is evaluated at v directly — mathematically
                        identical to the jnp round trip, without its f32
                        round-trip noise.
  'wrapped' on d/p/u    the stereographic Gram-coefficient chain of
                        ``manifold_kernels._make_reparam_kernel`` (sign-
                        specialized series, wrap-image pairs on K > 0),
                        plus the in-tile mu head.
  'wrapped' on s        the EMBEDDED-sphere chain (ops/sphere.py chord
                        forms: norm-pinned PT, renormalizing exp, arcsin
                        chord distance), sharing the drawn-radius branch
                        sum and prior wrap sum with the stereographic
                        tile (``_logq_drawn_rows`` / ``_logp_prior_rows``).
  'vmf' on s (dim 2)    the m = 3 closed forms: exact inverse-CDF cosine
                        (``distributions.von_mises_fisher._sample_w_m3``),
                        Householder to mu, and log C_3 / A_3 via the
                        half-integer Bessel closed forms
                        I_{1/2}(x) = sqrt(2/(pi x)) sinh x,
                        A_3(kappa) = coth kappa - 1/kappa — equal to the
                        library's series ``log_ive`` path to ~1e-6.
  'vmf' on s (m != 3)   NOT in the kernel family — jnp tail by
                        capability. The round-4 external-Wood-cosine
                        ("wx") operand channel measured 0.84x (s6,
                        B=1024) and 0.85x at its best-case shape
                        (s12:vmf, B=2048 — results/r5_vmf_m13_ab.json):
                        the Wood rejection sampler serializes between
                        the head GEMM and the kernel on every shape
                        tested, so the channel was DELETED in round 5
                        (VERDICT r4 #8) rather than left as dead
                        opt-in code in the hottest file.

Reference: the tail is the ELBO estimator composition of
``mt/mvae/models/vae.py`` + ``mt/mvae/sampling/`` in oskopek/mvae
[UNVERIFIED] (SURVEY.md §3.2); the fusion itself is TPU-native design
with no reference analog.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import stable
from .manifold_kernels import (_arctandiv_u_sgn, _atan_poly, _interpret,
                               _log_max, _log_sindiv_u_sgn,
                               _log_sindiv_u_sgn_soft, _sindiv_u_kernel,
                               _tandiv_u_sgn)

_LOG_2PI = 1.8378770664093453
_LOG_4PI = math.log(4.0 * math.pi)
_BLK = 1024  # lanes per grid step; VMEM per block is ~(W+E+Z)*BLK*4 ~ 200KB


def use_fused_tail() -> bool:
    """Default ON on compiled backends (production train/eval tail);
    interpret mode (CPU tests) is opt-in via MVAE_FUSED_TAIL=1."""
    v = os.environ.get("MVAE_FUSED_TAIL", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


# Routing-table version actually traced into programs — recorded per run
# (models/vae.py::fused_path_report) so cross-round throughput/LL rows say
# which policy generation they ran under (VERDICT r4 #7). Bump when
# component_supported / product_fused_default change.
ROUTING_POLICY = "r5-measured-product-v3"  # v3: vMF m != 3 wx channel
# deleted (capability, was policy-routed-away in v2 — traced programs
# identical for every v2 product; only the report's reason string moved
# from "jnp tail measured faster" to "unsupported component")


def component_supported(comp) -> bool:
    """Static (component -> kernel CAPABILITY) predicate. Whether the
    fused tail is the better ROUTE for a given product is a separate,
    measured question — see ``product_fused_default``."""
    if comp.posterior == "normal":
        return comp.dim <= 32
    if comp.posterior == "wrapped":
        if (comp.manifold.curvature_sign >= 0 and comp.manifold.kind != "e"
                and not comp.sigma_cap):
            return False  # the kernel bakes the sigma cap in; uncapped
            # (basin-study) components must take the jnp tail
        return (comp.manifold.kind in ("h", "d", "p", "u", "s")
                and comp.dim <= 32)
    if comp.posterior == "vmf":
        # dim 2 (m = 3) only: the loop-free exact inverse-CDF cosine
        # in-tile. Other dims need the Wood rejection cosine, whose
        # external-operand channel measured slower than the jnp tail at
        # every shape incl. large-B s12 (0.85x, r5 A/B) and was deleted.
        # 'p'-kind vMF needs the stereographic isometry push-through —
        # jnp path always.
        return comp.manifold.kind == "s" and comp.dim == 2
    return False


def product_fused_default(comps) -> bool:
    """Auto-routing policy: is the fused tail measured FASTER than the jnp
    tail for this product on the real chip? (RESULTS_r4 §8 table; B=1024,
    h_dim=400 probe — ratios were stable across the family.)

    * >= 2 components: YES — 1.11x (h2,s2,e2), 1.12x (3s2), 1.17x (2h2):
      the per-component fusion swarm is what the kernel amortizes.
    * lone wrapped component on u/p: YES — 1.19x (u6), 1.20x (p6): the
      sign-agnostic / wrap-image branch-sum chains are fusion-heavy even
      alone.
    * lone e/h/d/s component: NO — 0.82x (e6), 0.96x (h6), 0.96x (d6):
      XLA already handles one cheap chain well; two kernel launches plus
      in-VMEM transposes cost more than they save.

    ``MVAE_FUSED_TAIL=1`` overrides this policy (everything capable runs
    fused — the CPU-interpret test mode); ``=0`` disables the kernel.
    """
    if len(comps) >= 2:
        return True
    c = comps[0]
    return (c.posterior == "wrapped" and c.manifold.curvature_sign >= 0
            and c.manifold.kind != "e")


def noise_rows(comp) -> int:
    """Rows of pre-drawn standard noise the tile consumes per example."""
    return comp.dim + (1 if comp.posterior == "vmf" else 0)


def draw_noise_t(key, comps, batch: int, dtype):
    """(E, B) standard noise mirroring the jnp path's key discipline
    EXACTLY (split per component; vMF splits again into (w, direction)),
    so fused-vs-jnp paths are draw-for-draw comparable."""
    keys = jax.random.split(key, len(comps))
    rows = []
    for comp, ck in zip(comps, keys):
        if comp.posterior == "vmf":
            k_w, k_dir = jax.random.split(ck)
            u = jax.random.uniform(k_w, (batch,), dtype=dtype,
                                   minval=1e-7)
            rows.append(u[None, :])
            g = jax.random.normal(k_dir, (batch, comp.dim), dtype=dtype)
            rows.append(g.T)
        else:
            eps = jax.random.normal(ck, (batch, comp.dim), dtype=dtype)
            rows.append(eps.T)
    return jnp.concatenate(rows, axis=0)


# --- Mosaic-safe series helpers not already in manifold_kernels --------------


def _cos_u_sgn(u, sign):
    """stable.cos_u with cosh via exp (no Mosaic cosh lowering); the
    curvature-pinned kinds drop the branch they cannot take."""
    small, us, uc = stable._split_series_window(u)
    series = stable._poly(us, [-1.0 / 2, 1.0 / 24, -1.0 / 720, 1.0 / 40320])
    x = jnp.sqrt(jnp.abs(uc))
    if sign > 0:
        closed = jnp.cos(x)
    elif sign < 0:
        xc = jnp.clip(x, 0.0, 85.0)
        closed = 0.5 * (jnp.exp(xc) + jnp.exp(-xc))
    else:
        xc = jnp.clip(x, 0.0, 85.0)
        closed = jnp.where(uc > 0, jnp.cos(x),
                           0.5 * (jnp.exp(xc) + jnp.exp(-xc)))
    return jnp.where(small, series, closed)


def _acosh_1p(u):
    return jnp.log1p(u + jnp.sqrt(jnp.maximum(u, 0.0) * (u + 2.0)))


def _arcsindiv_u_pos(w):
    """stable.arcsindiv_u pinned to w >= 0 (sphere chord-distance form),
    with the asin branch as atan (Mosaic has no asin lowering either):
    asin(x) = atan(x / sqrt(1 - x^2)), x clamped inside the domain the
    same way stable.arcsindiv_u clamps."""
    small, ws, wc = stable._split_series_window(w)
    series = stable._poly(ws, [1.0 / 6, 3.0 / 40, 15.0 / 336, 105.0 / 3456])
    e = stable.eps(w.dtype)
    pos_w = jnp.clip(wc, stable.tiny(w.dtype), 1.0 - e)
    sw = jnp.sqrt(pos_w)
    closed = _atan_poly(sw * jax.lax.rsqrt(jnp.maximum(1.0 - pos_w, e))) / sw
    return jnp.where(small, series, closed)


# --- per-family tile chains (all arrays (rows, B); scalars (1, B)) -----------


def _sig_rows(comp, raw):
    """softplus scale head rows, broadcast to (dim, B) for diagonal math."""
    sig = jax.nn.softplus(raw[comp.dim:])
    return jnp.broadcast_to(sig, (comp.dim, sig.shape[1]))


def _tile_normal(comp, raw, eps):
    n = comp.dim
    mu = raw[:n]
    sig = _sig_rows(comp, raw)
    z = mu + sig * eps
    lq = jnp.sum(-0.5 * (eps * eps + _LOG_2PI) - jnp.log(sig), axis=0,
                 keepdims=True)
    lp = jnp.sum(-0.5 * (z * z + _LOG_2PI), axis=0, keepdims=True)
    kl = 0.5 * jnp.sum(sig * sig + mu * mu - 1.0 - 2.0 * jnp.log(sig),
                       axis=0, keepdims=True)
    return z, kl, lq, lp


def _tile_wrapped_lorentz(comp, raw, eps, k):
    """WrappedNormal chain on the hyperboloid (ops/lorentz.py formulas,
    batch-along-lanes). K < 0 pinned: exp_mu0 is injective, so the
    principal preimage of z is the drawn tangent v itself and log q is
    evaluated there directly (the jnp path's inverse round trip is the
    identity up to f32 noise)."""
    n = comp.dim
    dt = raw.dtype
    tin = stable.tiny(dt)
    c = jnp.maximum(-k, tin)
    inv_sqrt_c = jax.lax.rsqrt(c)
    mu_tan = raw[:n]
    sig = _sig_rows(comp, raw)

    # mu = exp_map_mu0(mu_tan): z = cos_u*mu0 + sindiv_u*(0, v); project()
    # then recomputes the time coordinate from the spatial part
    r2m = jnp.sum(mu_tan * mu_tan, axis=0, keepdims=True)
    mu_sp = _sindiv_u_kernel(k * r2m) * mu_tan
    sp2 = jnp.sum(mu_sp * mu_sp, axis=0, keepdims=True)
    mu_t = jnp.sqrt(1.0 / c + sp2)

    v = sig * eps
    # PT_{mu0->mu}((0, v)) = (0,v) + c<mu,(0,v)>_L/(2+e) (mu0 + mu), with
    # e = alpha-1 in the cancellation-free difference form
    d_t = mu_t - inv_sqrt_c
    e_a = jnp.maximum(c * (sp2 - d_t * d_t), 0.0) / 2.0
    sv = jnp.sum(mu_sp * v, axis=0, keepdims=True)
    coef = c * sv / (2.0 + e_a)
    u_t = coef * (inv_sqrt_c + mu_t)
    u_sp = v + coef * mu_sp
    # z = exp_map(mu, u): theta^2-argument t = -c * <u,u>_L
    usq = jnp.maximum(jnp.sum(u_sp * u_sp, axis=0, keepdims=True)
                      - u_t * u_t, 0.0)
    tt = -c * usq
    cu = _cos_u_sgn(tt, -1)
    sd = _sindiv_u_kernel(tt)
    z_sp = cu * mu_sp + sd * u_sp
    zsp2 = jnp.sum(z_sp * z_sp, axis=0, keepdims=True)
    z_t = jnp.sqrt(1.0 / c + zsp2)  # project()

    # log q at the principal preimage v (orthonormal mu0 frame)
    rv2 = jnp.sum(v * v, axis=0, keepdims=True)
    lq = (jnp.sum(-0.5 * (eps * eps + _LOG_2PI) - jnp.log(sig), axis=0,
                  keepdims=True)
          - (n - 1.0) * _log_sindiv_u_sgn(k * rv2, -1))
    # log p: radius r0 = d(mu0, z) via the stable acosh_1p difference form
    dz_t = z_t - inv_sqrt_c
    e0 = jnp.maximum(c * (zsp2 - dz_t * dz_t), 0.0) / 2.0 + tin
    r0 = _acosh_1p(e0) * inv_sqrt_c
    r02 = r0 * r0
    lp = (-0.5 * r02 - 0.5 * n * _LOG_2PI
          - (n - 1.0) * _log_sindiv_u_sgn(k * r02, -1))
    z = jnp.concatenate([z_t, z_sp], axis=0)
    return z, lq - lp, lq, lp


def _tile_wrapped_sphere(comp, raw, eps, k):
    """WrappedNormal chain on the EMBEDDED sphere S^n (ops/sphere.py
    formulas, batch-along-lanes; K > 0 pinned): exp_map_mu0 mu head,
    sigma saturating at the injectivity radius (components.
    cap_sigma_positive_k twin), chord-form norm-pinned parallel transport
    mu0 -> mu, exp at mu with renormalizing projection; log q by the
    shared drawn-radius branch sum and log p at the chord-form arcsin
    distance from mu0 (both via the helpers the stereographic tile
    traces, so every stability-critical expression is shared)."""
    n = comp.dim
    dt = raw.dtype
    tin = stable.tiny(dt)
    e = stable.eps(dt)
    kk = jnp.maximum(k, tin)
    sqrt_k = jnp.sqrt(kk)
    r_rad = 1.0 / sqrt_k
    mu_tan = raw[:n]
    sig = _sig_rows(comp, raw)
    # saturating cap at the injectivity radius (identical expression to
    # components.component.cap_sigma_positive_k)
    capr = jnp.pi * jax.lax.rsqrt(jnp.maximum(k, 1e-12))
    tc_ = jnp.minimum(sig / capr, 8.0)
    tc2 = tc_ * tc_
    sig = capr * tc_ * (1.0 + tc2 * tc2 * tc2) ** (-1.0 / 6.0)

    # mu = exp_map_mu0(mu_tan); project() renormalizes to radius R
    r2m = jnp.sum(mu_tan * mu_tan, axis=0, keepdims=True)
    t_m = kk * r2m
    m_t = _cos_u_sgn(t_m, 1) * r_rad
    m_sp = _sindiv_u_kernel(t_m) * mu_tan
    sp2_m = jnp.sum(m_sp * m_sp, axis=0, keepdims=True)
    mnorm = jnp.sqrt(m_t * m_t + sp2_m + tin)
    sc = r_rad / mnorm
    mu_t = m_t * sc
    mu_sp = m_sp * sc
    sp2 = sp2_m * sc * sc

    v = sig * eps
    vsq = jnp.sum(v * v, axis=0, keepdims=True)
    s2 = jnp.sum(eps * eps, axis=0, keepdims=True)
    ls = jnp.sum(jnp.log(jnp.maximum(sig, tin)), axis=0, keepdims=True)

    # PT_{mu0->mu}((0, v)): chord-form alpha, norm pinned to |v|
    # (ops/sphere.parallel_transport)
    d_t = mu_t - r_rad
    chord2 = d_t * d_t + sp2
    alpha = 1.0 - kk * chord2 / 2.0
    den = jnp.maximum(1.0 + alpha, e)
    coef = kk * jnp.sum(mu_sp * v, axis=0, keepdims=True) / den
    w_t = -coef * (r_rad + mu_t)
    w_sp = v - coef * mu_sp
    nv = jnp.sqrt(vsq + tin)
    nw = jnp.sqrt(w_t * w_t + jnp.sum(w_sp * w_sp, axis=0, keepdims=True)
                  + tin)
    pin = nv / nw
    u_t = w_t * pin
    u_sp = w_sp * pin

    # z = exp_map(mu, u); project() renormalizes
    usq = u_t * u_t + jnp.sum(u_sp * u_sp, axis=0, keepdims=True)
    tt = kk * usq
    cu = _cos_u_sgn(tt, 1)
    sd = _sindiv_u_kernel(tt)
    z_t = cu * mu_t + sd * u_t
    z_sp = cu * mu_sp + sd * u_sp
    zn = jnp.sqrt(z_t * z_t + jnp.sum(z_sp * z_sp, axis=0, keepdims=True)
                  + tin)
    zsc = r_rad / zn
    z_t = z_t * zsc
    z_sp = z_sp * zsc
    z = jnp.concatenate([z_t, z_sp], axis=0)

    logq = _logq_drawn_rows(n, comp.wraps, 1, kk, vsq, s2, ls, dt)

    # log p: r0 = 2R asin(|z - mu0| / 2R) — the chord form of
    # ops/sphere.distance (exact and stable where acos loses all digits)
    dz_t = z_t - r_rad
    chord0 = dz_t * dz_t + jnp.sum(z_sp * z_sp, axis=0, keepdims=True)
    half = jnp.sqrt(chord0 + tin) / 2.0
    half = jnp.minimum(half, (1.0 - e) / sqrt_k)
    r0 = 2.0 * half * _arcsindiv_u_pos(kk * half * half)
    logp = _logp_prior_rows(n, comp.wraps, 1, kk, r0, dt)
    return z, logq - logp, logq, logp


def _tile_vmf(comp, raw, eps, k):
    """vMF(mu, kappa) on S^2 (m = 3, the only dim in the kernel family —
    larger m needs the Wood rejection cosine, measured slower as an
    external operand and deleted in r5): Householder sampling +
    log-density + analytic KL (distributions/von_mises_fisher.py
    semantics). kappa >= 1 by the softplus+1 head, so every expression
    here is well-conditioned. The cosine w comes from the exact in-tile
    inverse CDF (the marginal is exponential in w at m = 3); log C_3 /
    A_3 use the half-integer closed forms."""
    n = comp.dim
    m = n + 1
    assert m == 3, "fused vMF tile is m = 3 only"
    dt = raw.dtype
    tin = stable.tiny(dt)
    e = stable.eps(dt)
    kk = jnp.maximum(k, tin)
    sqrt_k = jnp.sqrt(kk)
    r = 1.0 / sqrt_k
    mu_tan = raw[:n]
    kap = jax.nn.softplus(raw[n:n + 1]) + 1.0

    # mu = exp_map_mu0 on the sphere; project() renormalizes to radius R
    r2m = jnp.sum(mu_tan * mu_tan, axis=0, keepdims=True)
    t_m = kk * r2m
    m_t = _cos_u_sgn(t_m, 1) * r
    m_sp = _sindiv_u_kernel(t_m) * mu_tan
    mnorm = jnp.sqrt(m_t * m_t + jnp.sum(m_sp * m_sp, axis=0, keepdims=True)
                     + tin)
    scale = r / mnorm
    mu_u_t = m_t * scale * sqrt_k        # unit-sphere coords
    mu_u_sp = m_sp * scale * sqrt_k

    # cosine via the exact inverse CDF (stable expm1/log1p form)
    u_eps = eps[0:1]
    kap_s = jnp.maximum(kap, 1e-6)
    w = 1.0 + jnp.log1p((1.0 - u_eps)
                        * (jnp.exp(-2.0 * kap_s) - 1.0)) / kap_s
    w = jnp.clip(w, -1.0 + 1e-7, 1.0 - 1e-7)
    g = eps[1:3]
    vdir = g / jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True) + tin)
    sin_w = jnp.sqrt(jnp.maximum(1.0 - w * w, tin))
    zp_sp = sin_w * vdir                 # frame-aligned sample (w, zp_sp)

    # Householder e1 -> mu_unit (degenerate at mu ~ e1 -> identity)
    uh_t = 1.0 - mu_u_t
    uh_sp = -mu_u_sp
    un = jnp.sqrt(uh_t * uh_t + jnp.sum(uh_sp * uh_sp, axis=0, keepdims=True)
                  + tin)
    inv_un = 1.0 / jnp.maximum(un, e)
    uht = uh_t * inv_un
    uhs = uh_sp * inv_un
    dotu = uht * w + jnp.sum(uhs * zp_sp, axis=0, keepdims=True)
    zu_t = w - 2.0 * dotu * uht
    zu_sp = zp_sp - 2.0 * dotu * uhs
    deg = un < e
    zu_t = jnp.where(deg, w, zu_t)
    zu_sp = jnp.where(deg, zp_sp, zu_sp)
    z = jnp.concatenate([zu_t * r, zu_sp * r], axis=0)

    # log C_3(kappa) with log I_{1/2}e^{-x} = 0.5 log(2/(pi x))
    #                                         + log1p(-e^{-2x}) - log 2
    log_ive_nu = (0.5 * jnp.log(2.0 / (jnp.pi * kap))
                  + jnp.log1p(-jnp.exp(-2.0 * kap)) - math.log(2.0))
    a_m = 1.0 / jnp.tanh(kap) - 1.0 / kap
    log_unit_area = _LOG_4PI
    log_cm = ((m / 2.0 - 1.0) * jnp.log(kap) - (m / 2.0) * _LOG_2PI
              - (log_ive_nu + kap))
    cos = mu_u_t * zu_t + jnp.sum(mu_u_sp * zu_sp, axis=0, keepdims=True)
    area = (m - 1) / 2.0 * jnp.log(kk)   # -(m-1) log R density area term
    lq = log_cm + kap * cos + area
    lp = jnp.broadcast_to(-log_unit_area + area, lq.shape)
    # analytic KL: kappa A_m(kappa) + log C_m + log Area(unit S^{m-1})
    kl = kap * a_m + log_cm + log_unit_area
    return z, kl, lq, lp


def _tile_wrapped_stereo(comp, raw, eps, k):
    """WrappedNormal chain on the kappa-stereographic family (d/p/u):
    the Gram-coefficient mobius math of manifold_kernels._make_reparam_kernel
    plus the in-tile mu head (exp_map_mu0 of the raw tangent).

    Round-4 stability semantics (matching distributions/wrapped_normal
    ``_sample_log_prob_drawn`` + components ``cap_sigma_positive_k``):
    sigma saturates at the positive-K injectivity radius; log q is the
    drawn-radius branch sum — the principal radius is the SCALAR wrap of
    the drawn |v| and the z-scores come from the drawn direction
    (quad = |eps|^2/|v|^2), so no f32 inverse round trip exists for the
    optimizer to farm; the log-det rides the shell-mollified |sin|."""
    sign = comp.manifold.curvature_sign
    wraps = comp.wraps
    n = comp.dim
    dt = raw.dtype
    e = stable.eps(dt)
    tin = stable.tiny(dt)
    mu_tan = raw[:n]
    sig = _sig_rows(comp, raw)
    if sign >= 0:
        # saturating cap at the injectivity radius (identical expression
        # to components.component.cap_sigma_positive_k)
        capr = jnp.pi * jax.lax.rsqrt(jnp.maximum(k, 1e-12))
        tc_ = jnp.minimum(sig / capr, 8.0)
        tc2 = tc_ * tc_
        sig = capr * tc_ * (1.0 + tc2 * tc2 * tc2) ** (-1.0 / 6.0)

    negk = jnp.minimum(k, -tin)
    smax = (1.0 - e) * jax.lax.rsqrt(-negk)  # K<0 ball radius

    def ball_clamp(x, xn2):
        """stereographic.project: pull K<0 points inside the open ball."""
        s = jnp.where(k < 0, jnp.minimum(
            1.0, smax * jax.lax.rsqrt(jnp.maximum(xn2, tin))), 1.0)
        return x * s, jnp.maximum(xn2 * s * s, 0.0)

    # mu = exp_map_mu0(mu_tan) = project(0.5 * tandiv * mu_tan)
    r2m = jnp.sum(mu_tan * mu_tan, axis=0, keepdims=True)
    gm = 0.5 * _tandiv_u_sgn(k * r2m / 4.0, sign)
    mu = gm * mu_tan
    if sign <= 0:
        mu, _ = ball_clamp(mu, gm * gm * r2m)
    x2 = jnp.sum(mu * mu, axis=0, keepdims=True)
    ls = jnp.sum(jnp.log(jnp.maximum(sig, tin)), axis=0, keepdims=True)

    v = sig * eps
    vsq = jnp.sum(v * v, axis=0, keepdims=True)
    xv = jnp.sum(mu * v, axis=0, keepdims=True)
    s2 = jnp.sum(eps * eps, axis=0, keepdims=True)

    g = 0.5 * _tandiv_u_sgn(k * vsq / 4.0, sign)
    if sign <= 0:
        g = g * jnp.where(k < 0, jnp.minimum(
            1.0, smax * jax.lax.rsqrt(jnp.maximum(g * g * vsq, tin))), 1.0)

    # z = mobius_add(mu, g v) via per-example scalar coefficients
    gxv = g * xv
    g2v = g * g * vsq
    a = 1.0 - 2.0 * k * gxv - k * g2v
    b = (1.0 + k * x2) * g
    den = 1.0 - 2.0 * k * gxv + k * k * x2 * g2v
    den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
    inv_den = 1.0 / den
    z = (a * inv_den) * mu + (b * inv_den) * v
    zn2 = jnp.sum(z * z, axis=0, keepdims=True)
    if sign <= 0:
        z, zn2 = ball_clamp(z, zn2)

    logq = _logq_drawn_rows(n, wraps, sign, k, vsq, s2, ls, dt)

    # log p: prior WrappedNormal(mu0, 1) at z — the preimage radius is the
    # direct arctan form from z (no round trip; isotropic sigma = 1)
    r0 = 2.0 * jnp.sqrt(zn2 + tin) * _arctandiv_u_sgn(k * zn2, sign)
    logp = _logp_prior_rows(n, wraps, sign, k, r0, dt)
    return z, logq - logp, logq, logp


def _logq_drawn_rows(n, wraps, sign, k, vsq, s2, ls, dt):
    """Drawn-radius branch-sum log q on (1, B) rows — the in-tile twin of
    ``distributions.wrapped_normal._sample_log_prob_drawn`` (round-trip-
    free; r^2 * quad == |eps|^2 exactly). Shared by the stereographic
    (d/p/u) and embedded-sphere (s) wrapped tiles so both trace the SAME
    stability-critical expressions."""
    tin = stable.tiny(dt)
    vsq_g = vsq + tin
    r = jnp.sqrt(vsq_g)
    quad = s2 / vsq_g
    half_l2pi = 0.5 * n * _LOG_2PI

    if sign < 0:
        # pinned negative curvature never wraps: principal preimage = v
        return (-0.5 * s2 - ls - half_l2pi
                - (n - 1.0) * _log_sindiv_u_sgn_soft(k * vsq_g, sign))
    kpos = jnp.maximum(k, 1e-20)
    sqk = jnp.sqrt(kpos)
    period = (2.0 * jnp.pi / sqk).astype(dt)
    rp_w = jnp.abs(r - period * jnp.floor(r / period + 0.5))
    rp = rp_w if sign > 0 else jnp.where(k > 0, rp_w, r)
    if wraps == 0:
        u_arg = (kpos * rp * rp if sign > 0
                 else jnp.where(k > 0, kpos * rp * rp, k * vsq_g))
        return (-0.5 * rp * rp * quad - ls - half_l2pi
                - (n - 1.0) * _log_sindiv_u_sgn_soft(u_arg, sign))
    x_red = sqk * rp
    terms = []
    for m in range(-(wraps + 3), wraps + 4):
        rb_raw = rp + m * period
        if m == 0:
            live, rb = None, rb_raw
        else:
            live = (k > 0) & (rb_raw * rb_raw * quad < 1e30)
            rb = jnp.where(live, rb_raw, rp)
        logn = -0.5 * rb * rb * quad - ls - half_l2pi
        if m == 0:
            # removable zero at rp = 0: series-windowed
            # log(sin x / x) (the split form below is -inf when
            # an f32 draw wraps to rp == 0 exactly — the d2p2e2
            # eval NaN; see wrapped_normal.py)
            u0 = (kpos * rp * rp if sign > 0
                  else jnp.where(k > 0, kpos * rp * rp,
                                 k * vsq_g))
            logdet = (n - 1.0) * _log_sindiv_u_sgn_soft(u0, sign)
        else:
            log_sin_b = stable.log_abs_sin_soft(
                x_red, taper_x=sqk * jnp.abs(rb))
            sph = log_sin_b - jnp.log(
                jnp.maximum(sqk * jnp.abs(rb), tin))
            if sign > 0:
                logdet = (n - 1.0) * sph
            else:
                logdet = (n - 1.0) * jnp.where(
                    k > 0, sph,
                    _log_sindiv_u_sgn_soft(k * vsq_g, sign))
        t_b = logn - logdet
        if live is not None:
            t_b = jnp.where(live, t_b,
                            jnp.full_like(t_b, -1e30))
        terms.append(t_b)
    mx = terms[0]
    for t_b in terms[1:]:
        mx = jnp.maximum(mx, t_b)
    acc = jnp.zeros_like(mx)
    for t_b in terms:
        acc = acc + jnp.exp(t_b - mx)
    return mx + jnp.log(acc)


def _logp_prior_rows(n, wraps, sign, k, r0, dt):
    """Prior WrappedNormal(mu0, 1) log-density on (1, B) rows from the
    preimage radius r0 (principal branch + one wrap-image pair for
    positive-capable kinds) — the in-tile twin of
    ``wrapped_normal._log_prob_from_principal`` at isotropic sigma = 1."""
    tin = stable.tiny(dt)
    half_l2pi = 0.5 * n * _LOG_2PI
    r02 = r0 * r0
    logp = (-0.5 * r02 - half_l2pi
            - (n - 1.0) * _log_sindiv_u_sgn_soft(k * r02, sign))
    if wraps <= 0 or sign < 0:
        return logp
    period = (2.0 * jnp.pi
              / jnp.sqrt(jnp.maximum(k, 1e-20))).astype(dt)
    cap = 1e15
    sqk0 = jnp.sqrt(jnp.maximum(k, 1e-20))
    terms = [logp]
    for sgn in (1.0, -1.0):
        rb_raw = r0 + sgn * period
        live = (k > 0) & (jnp.abs(rb_raw) < cap)
        rb = jnp.where(live, rb_raw, r0)
        logn_b = -0.5 * rb * rb - half_l2pi
        lsk_b = stable.log_abs_sin_soft(
            sqk0 * r0, taper_x=sqk0 * jnp.abs(rb)) - jnp.log(sqk0)
        logd_b = (n - 1.0) * (lsk_b - _log_max(jnp.abs(rb), tin))
        terms.append(jnp.where(live, logn_b - logd_b,
                               jnp.full_like(logp, -1e30)))
    m = jnp.maximum(jnp.maximum(terms[0], terms[1]), terms[2])
    return m + jnp.log(jnp.exp(terms[0] - m)
                       + jnp.exp(terms[1] - m)
                       + jnp.exp(terms[2] - m))


# --- whole-product tile + pallas_call plumbing -------------------------------


def _tail_tile(comps, raw_t, eps_t, kx):
    """(W, B) raw rows + (E, B) noise rows + (nc, B) curvature rows
    -> (z (Z, B), aux (nc+2, B) = [kl rows; log_q; log_p])."""
    zs, kls = [], []
    lq = 0.0
    lp = 0.0
    ro = eo = 0
    for i, comp in enumerate(comps):
        raw = raw_t[ro:ro + comp.head_width]
        ro += comp.head_width
        epsc = eps_t[eo:eo + noise_rows(comp)]
        eo += noise_rows(comp)
        kc = kx[i:i + 1]
        if comp.posterior == "normal":
            z, kl, q, p = _tile_normal(comp, raw, epsc)
        elif comp.posterior == "vmf":
            z, kl, q, p = _tile_vmf(comp, raw, epsc, kc)
        elif comp.manifold.kind == "h":
            z, kl, q, p = _tile_wrapped_lorentz(comp, raw, epsc, kc)
        elif comp.manifold.kind == "s":
            z, kl, q, p = _tile_wrapped_sphere(comp, raw, epsc, kc)
        else:
            z, kl, q, p = _tile_wrapped_stereo(comp, raw, epsc, kc)
        zs.append(z)
        kls.append(kl)
        lq = lq + q
        lp = lp + p
    z = jnp.concatenate(zs, axis=0)
    aux = jnp.concatenate(kls + [lq, lp], axis=0)
    return z, aux


def _tile_io(comps, raw_bt, eps_bt, kx_bt):
    """Natural-orientation wrapper: transposes happen ONCE in VMEM."""
    z, aux = _tail_tile(comps, raw_bt.T, eps_bt.T, kx_bt.T)
    return z.T, aux.T


def _pad_cols(a, bp, value=0.0):
    pad = bp - a.shape[0]
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], value, a.dtype)], axis=0)


def _dims(comps):
    W = sum(c.head_width for c in comps)
    E = sum(noise_rows(c) for c in comps)
    Z = sum(c.ambient_dim for c in comps)
    return W, E, Z


def _specs(shapes, block):
    return [pl.BlockSpec((block, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for w in shapes]


def _fwd_pallas(comps, raw_bt, eps_bt, kx_bt):
    B = raw_bt.shape[0]
    W, E, Z = _dims(comps)
    nc = len(comps)
    block = min(_BLK, -(-B // 128) * 128)
    bp = -(-B // block) * block
    # pads: raw 0 (softplus(0) scale — finite chain), noise 0.5 (valid for
    # both the normal rows and the vMF uniform row), curvature edge value
    # (keeps padded lanes on the same trace-time-live branch)
    raw_p = _pad_cols(raw_bt, bp)
    eps_p = _pad_cols(eps_bt, bp, 0.5)
    kx_p = kx_bt if bp == B else jnp.concatenate(
        [kx_bt, jnp.broadcast_to(kx_bt[-1:], (bp - B, nc))], axis=0)

    def fwd_kernel(raw_ref, eps_ref, kx_ref, z_ref, aux_ref):
        z, aux = _tile_io(comps, raw_ref[:], eps_ref[:], kx_ref[:])
        z_ref[:] = z
        aux_ref[:] = aux

    z, aux = pl.pallas_call(
        fwd_kernel,
        grid=(bp // block,),
        in_specs=_specs((W, E, nc), block),
        out_specs=tuple(_specs((Z, nc + 2), block)),
        out_shape=(jax.ShapeDtypeStruct((bp, Z), raw_bt.dtype),
                   jax.ShapeDtypeStruct((bp, nc + 2), raw_bt.dtype)),
        interpret=_interpret(),
    )(raw_p, eps_p, kx_p)
    return z[:B], aux[:B]


def _bwd_pallas(comps, res, cts):
    """Shared backward: in-kernel jax.vjp over (raw, kx)."""
    raw_bt, eps_bt, kx_bt = res
    dz, daux = cts
    B = raw_bt.shape[0]
    W, E, Z = _dims(comps)
    nc = len(comps)
    block = min(_BLK, -(-B // 128) * 128)
    bp = -(-B // block) * block
    raw_p = _pad_cols(raw_bt, bp)
    eps_p = _pad_cols(eps_bt, bp, 0.5)
    kx_p = kx_bt if bp == B else jnp.concatenate(
        [kx_bt, jnp.broadcast_to(kx_bt[-1:], (bp - B, nc))], axis=0)
    dz_p = _pad_cols(dz, bp)       # zero cotangents on padded lanes
    daux_p = _pad_cols(daux, bp)
    in_ops = [raw_p, eps_p, kx_p, dz_p, daux_p]
    in_widths = [W, E, nc, Z, nc + 2]
    out_widths = [W, nc]

    def bwd_kernel(raw_ref, eps_ref, kx_ref, dz_ref, daux_ref,
                   draw_ref, dkx_ref):
        eps = eps_ref[:]

        def f(raw, kxv):
            return _tile_io(comps, raw, eps, kxv)
        _, vjp = jax.vjp(f, raw_ref[:], kx_ref[:])
        for ref, ct in zip((draw_ref, dkx_ref),
                           vjp((dz_ref[:], daux_ref[:]))):
            ref[:] = ct

    outs = pl.pallas_call(
        bwd_kernel,
        grid=(bp // block,),
        in_specs=_specs(tuple(in_widths), block),
        out_specs=tuple(_specs(tuple(out_widths), block)),
        out_shape=tuple(jax.ShapeDtypeStruct((bp, w), raw_bt.dtype)
                        for w in out_widths),
        interpret=_interpret(),
    )(*in_ops)
    return tuple(o[:B] for o in outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tail_call(comps, raw_bt, eps_bt, kx_bt):
    return _fwd_pallas(comps, raw_bt, eps_bt, kx_bt)


def _tail_call_fwd(comps, raw_bt, eps_bt, kx_bt):
    return _fwd_pallas(comps, raw_bt, eps_bt, kx_bt), (raw_bt, eps_bt, kx_bt)


def _tail_call_bwd(comps, res, cts):
    draw, dkx = _bwd_pallas(comps, res, cts)
    return draw, jnp.zeros_like(res[1]), dkx


_tail_call.defvjp(_tail_call_fwd, _tail_call_bwd)


def reparam_all(key, comps, comp_params, raw_all):
    """Full product-latent reparameterization from the fused-head GEMM
    output, as ONE forward (and one backward) Pallas kernel.

    raw_all: (B, W) concatenated per-component [mu | scale] head
    pre-activations (models/vae.py::_fused_head_raw layout).
    Returns (z (B, Z), log_q (B,), log_p (B,), kl (B, nc), curvatures (nc,)).
    """
    comps = tuple(comps)
    B = raw_all.shape[0]
    dt = raw_all.dtype
    kvec = jnp.stack([comp.curvature(cp)
                      for comp, cp in zip(comps, comp_params)]).astype(dt)
    kx_bt = jnp.broadcast_to(kvec[None, :], (B, len(comps)))
    eps_bt = draw_noise_t(key, comps, B, dt).T
    z, aux = _tail_call(comps, raw_all, eps_bt, kx_bt)
    nc = len(comps)
    return (z, aux[:, nc], aux[:, nc + 1], aux[:, :nc], kvec)


def reparam_all_jnp(key, comps, comp_params, raw_all):
    """jnp oracle: the tile math evaluated OUTSIDE pallas (same noise,
    same expression graph) — for kernel-equivalence tests."""
    comps = tuple(comps)
    B = raw_all.shape[0]
    dt = raw_all.dtype
    kvec = jnp.stack([comp.curvature(cp)
                      for comp, cp in zip(comps, comp_params)]).astype(dt)
    kx = jnp.broadcast_to(kvec[:, None], (len(comps), B))
    eps_t = draw_noise_t(key, comps, B, dt)
    z, aux = _tail_tile(comps, raw_all.T, eps_t, kx)
    nc = len(comps)
    return (z.T, aux[nc], aux[nc + 1], aux[:nc].T, kvec)
