"""Wrapped normal on any constant-curvature manifold (pure functions).

The paper's workhorse posterior (``mt/mvae/distributions/wrapped_normal.py``
in oskopek/mvae [UNVERIFIED]): push a tangent Gaussian at the basepoint mu0
through parallel transport to mu and the exponential map,

    v ~ N(0, sigma) in orthonormal coords of T_mu0 M
    z = exp_mu(PT_{mu0->mu}(v)).

Because every manifold in :mod:`mvae_tpu.ops` exposes mu0-frame tangents in
an ORTHONORMAL basis, the log-det-Jacobian is the single radial expression
(n-1) log(sin_k(r)/r) for all six geometries (verified against numerical
Jacobians in tests/ops/test_manifolds.py) — where the reference carries
per-manifold log-det code paths.

Positive curvature subtlety: on S^n/P^n the exponential map is periodic, so
the exact density at z sums over ALL tangent preimages (wrap images)

    q(z) = sum_b N(v_b; 0, sigma) / |det J(v_b)|,
    v_b in {(r' + mT) v_hat} ∪ {-(T - r' + mT) v_hat},  T = 2 pi R,

truncated at `wraps` extra periods (mass beyond is ~exp(-(2 pi R)^2/2sigma^2)).
For K <= 0 the extra branches carry exactly zero mass and the formula
degrades to the familiar single-branch form, smoothly in K — so the same
jitted code path serves the universal manifold as its curvature crosses
zero. The reference evaluates only the principal branch; for the small
sigmas a trained VAE uses the difference is far below the 0.1-nat target,
but the extra branches make log_prob a true density at any sigma (verified
by importance-sampled normalization in tests).

All functions take the manifold descriptor + curvature leaf explicitly; no
distribution objects, no state — jit/vmap/shard_map-ready.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import stable
from . import normal

# Wrap-branch hygiene: a wrap image's z-score (rb / sigma) must stay far
# from f32/bf16 overflow even after squaring and summing over dims, or the
# 0-weight logsumexp gradient turns into 0 * inf = NaN. Branches beyond the
# cap carry ~exp(-(rb/sigma)^2/2) ~ 0 mass, so masking them is exact.
_ZSCORE_CAP = 1e15
# curvature floor inside the period: keeps d(period)/dK finite (K^-3/2
# overflows f32 below ~5e-26); branches at the floored period are masked by
# the z-score cap anyway
_K_FLOOR = 1e-20


def _log_abs_sindiv_k(r, k):
    """log(|sin_k(r)| / r), valid for any r >= 0 (multi-branch radii).

    Both branches ride the delta-mollified |sin| near the injectivity
    shell (bounded cot gradient — stable.log_abs_sin_soft). The sin is
    evaluated at the principal-REDUCED angle (accuracy + one shared
    |sin| across wrap branches) with the branch's UNREDUCED radius as
    the mollifier taper (full-wrap conjugate-point zeros floored, the
    removable zero at 0 exact)."""
    u = k * r * r
    # reuse the stable form where |u| is in its principal window; otherwise
    # fall back to log|sin(x)|/x for the spherical multi-wrap branch
    x = jnp.sqrt(jnp.maximum(u, stable.tiny(r.dtype)))
    two_pi = 2.0 * jnp.pi
    x_red = jnp.abs(x - two_pi * jnp.floor(x / two_pi + 0.5))
    sph = (stable.log_abs_sin_soft(x_red, taper_x=x)
           - jnp.log(jnp.maximum(x, stable.tiny(r.dtype))))
    principal = _log_sindiv_u_soft(u)
    # spherical x beyond the principal window (pi) needs the |sin| form
    return jnp.where(u > jnp.pi ** 2, sph, principal)


def sample(key, man, mu, sigma, k):
    """Draw z; mu has ambient coords, sigma broadcasts against (..., n)."""
    shape = mu.shape[:-1] + (man.dim,)
    v = sigma * jax.random.normal(key, shape, dtype=mu.dtype)
    return man.sample_projection_mu0(v, mu, k)


# Shared mollified log|sin| forms live in ops.stable (L0): the fused tail
# kernels and this module must trace the SAME expressions for the
# kernel-vs-jnp equality tests to stay exact.
_log_abs_sin_x = stable.log_abs_sin_soft
_log_sindiv_u_soft = stable.log_sindiv_u_soft


def _log_prob_from_principal(man, v, sigma, k, wraps: int):
    """Log q from the principal-branch tangent v (orthonormal mu0 frame).

    ``wraps`` counts wrap-image PAIRS summed for K > 0: ``wraps=0`` is the
    PRINCIPAL BRANCH ONLY — exactly the reference's estimator semantics
    (``mt/mvae/distributions/wrapped_normal.py`` [UNVERIFIED] evaluates one
    preimage) — and the default ``wraps=1`` adds the nearest image in each
    direction, making log_prob the exact density at trained-regime sigma
    (truncation error bounds tested in tests/distributions)."""
    n = man.dim
    dtype = v.dtype
    zero = jnp.zeros((), dtype=dtype)

    # Manifolds whose curvature sign is pinned non-positive (e/h/d) can
    # never wrap — skip the dead image branches AT TRACE TIME (the jitted
    # product-latent step stays lean; only s/p/u pay for wrapping).
    if man.curvature_sign < 0 or man.kind == "e":
        wraps = 0
    if wraps == 0:
        # density paths ride the shell-mollified log-det uniformly (for
        # K <= 0 kinds the two forms are identical)
        r = stable.safe_norm(v)
        sigma = jnp.maximum(sigma, stable.tiny(dtype))
        return (normal.log_prob(v, zero, sigma)
                - (n - 1) * stable.log_sindiv_u_soft(k * r * r))

    r = stable.safe_norm(v, keepdims=True)
    v_hat = v / r

    # geodesic period T = 2 pi / sqrt(K); only meaningful where K > 0
    period = (2.0 * math.pi
              / jnp.sqrt(jnp.maximum(k, _K_FLOOR))).astype(dtype)
    # smallest sigma across dims bounds the largest per-dim z-score
    # (floored: f32 softplus underflows to exactly 0 below raw ~ -88)
    sig_b = jnp.maximum(jnp.broadcast_to(sigma, v.shape),
                        stable.tiny(dtype))
    sig_min = jnp.min(sig_b, axis=-1, keepdims=True)

    # every branch shares the unit direction v_hat, so the n-dim Gaussian
    # term factorizes to SCALAR math in the branch radius:
    #   log N(rb v_hat; 0, sigma) = -rb^2/2 * sum((v_hat/sigma)^2) + const.
    # One n-dim pass here; each wrap image then costs a handful of scalar
    # ops (was: a full n-dim log_prob per branch — the dominant cost of
    # the s/p/u hot path, 5 branches at wraps=2).
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype
    quad = jnp.sum((v_hat / sig_b) ** 2, axis=-1, keepdims=True, dtype=acc)
    const = (-jnp.sum(jnp.log(sig_b), axis=-1, dtype=acc)
             - 0.5 * n * math.log(2.0 * math.pi))

    branches = [r]                         # principal, always live
    for m in range(1, wraps + 1):          # m-th image PAIR (signed radii)
        branches.append(r + m * period)
        branches.append(r - m * period)
    logps = []
    for i, rb_raw in enumerate(branches):
        if i == 0:
            rb, live = rb_raw, None
        else:
            # wrap images are dead for K <= 0 (universal mid-crossing) and
            # for K > 0 so small that (rb/sigma)^2 would overflow; evaluate
            # dead branches at the PRINCIPAL radius (finite, moderate — the
            # sanitized-where trick) and mask them out of the logsumexp
            live = (k > 0) & (jnp.abs(rb_raw) < _ZSCORE_CAP * sig_min)
            rb = jnp.where(live, rb_raw, r)
        rb_abs = jnp.abs(rb).squeeze(-1)
        logn = -0.5 * (rb * rb * quad).squeeze(-1).astype(acc) + const
        logdet = (n - 1) * _log_abs_sindiv_k(rb_abs, k)
        logp = logn - logdet
        if live is not None:
            logp = jnp.where(live.squeeze(-1), logp,
                             jnp.asarray(-1e30, logp.dtype))
        logps.append(logp)
    out = jax.scipy.special.logsumexp(jnp.stack(logps, axis=-1), axis=-1)
    return out


def log_prob(man, z, mu, sigma, k, wraps: int = 1):
    """Exact log-density w.r.t. the Riemannian measure.

    Conditioning caveat: the principal preimage comes from the f32
    ``log_map`` + inverse-PT round trip, whose O(eps) DIRECTION noise is
    amplified by 1/sigma_j in the quadratic form. Safe for the isotropic /
    moderate-sigma uses in this codebase (prior densities, tests); for the
    density of a distribution's OWN sample use ``sample_and_log_prob``,
    which is round-trip-free (see below).
    """
    v = man.inverse_sample_projection_mu0(z, mu, k)
    return _log_prob_from_principal(man, v, sigma, k, wraps)


def _sample_log_prob_drawn(man, v, sigma, k, wraps: int):
    """log q(z) for z = exp_mu(PT(v)) evaluated WITHOUT the inverse round
    trip — the round-4 stability fix.

    Exactness: every tangent preimage of z along the drawn geodesic is
    (r + m T) v_hat with r = |v|, T = 2 pi R (the preimage set of a great
    circle), so the density needs only the drawn direction and scalar
    radius arithmetic:

        log q = logsumexp_m [ N(rb_m v_hat; 0, sigma) - logdet(rb_m) ],
        N(rb v_hat; 0, sigma) has z-scores (rb / r) * eps  — all moderate.

    Round 3 instead reconstructed the principal preimage via the f32
    exp -> log_map -> inverse-PT round trip; its O(eps * |v|) direction
    noise lands in dims where sigma_j is small and the quadratic form
    amplifies it by 1/sigma_j^2 — at the observed sigma_min 2.6e-18 that
    produced log q ~ -1e18 and a loss of -9.6e17 the optimizer farmed as
    free ELBO (the s6:wrapped / d2p2e2 NaN spiral; results/
    r4_nan_probe_s6-wrapped.json postmortem). Here the preimage direction
    is the drawn one BY CONSTRUCTION, so no round trip exists to leak.

    ``wraps=0`` is the reference's principal-branch-only estimator: the
    principal radius is the scalar wrap rp = |((r + T/2) mod T) - T/2|,
    again with no round trip.
    """
    n = man.dim
    dtype = v.dtype
    acc = jnp.float32 if dtype == jnp.bfloat16 else dtype

    # representability floor: f32 softplus underflows to EXACTLY 0 below
    # raw ~ -88, and 0/0 here would NaN; 1e-15 is far below any
    # statistically meaningful posterior scale
    sig_b = jnp.maximum(jnp.broadcast_to(sigma, v.shape),
                        stable.tiny(dtype))
    eps_z = v / sig_b                       # the standard draw, exactly
    s2 = jnp.sum(eps_z * eps_z, axis=-1, dtype=acc)
    const = (-jnp.sum(jnp.log(sig_b), axis=-1, dtype=acc)
             - 0.5 * n * math.log(2.0 * math.pi))

    vsq = jnp.sum(v * v, axis=-1) + stable.tiny(dtype)
    r = jnp.sqrt(vsq)
    quad = s2 / vsq                         # r^2 * quad == s2 exactly

    if man.curvature_sign < 0 or man.kind == "e":
        # exp_mu0 injective: the drawn tangent IS the principal preimage
        u = k * vsq
        return -0.5 * s2 + const - (n - 1) * stable.log_sindiv_u(u)

    # positive curvature reachable (s/p/u): principal radius by scalar
    # wrap; T is huge for K <= 0 (universal mid-crossing) so rp == r there
    kpos = jnp.maximum(k, _K_FLOOR)
    sqrt_k = jnp.sqrt(kpos)
    period = (2.0 * math.pi / sqrt_k).astype(dtype)
    # scalar wrap to the nearest lattice point (floor form — the same
    # expression the fused tail kernel traces, so kernel-vs-library
    # comparisons stay exact; Mosaic lowers floor everywhere)
    rp = jnp.abs(r - period * jnp.floor(r / period + 0.5))

    if wraps == 0:
        u = jnp.where(k > 0, kpos * rp * rp, k * vsq)
        rp_eff = jnp.where(k > 0, rp, r)
        return (-0.5 * rp_eff * rp_eff * quad + const
                - (n - 1) * _log_sindiv_u_soft(u))

    # |sin(sqrt(K) rb)| is branch-independent: evaluate sin ONCE at the
    # principal-reduced angle; each branch gets its own mollifier taper
    # keyed on its UNREDUCED radius (conjugate-point zeros floored, the
    # removable zero at 0 exact — stable.log_abs_sin_soft)
    x_red = sqrt_k * rp
    tin = stable.tiny(dtype)
    logps = []
    for m in range(-(wraps + 3), wraps + 4):
        rb_raw = rp + m * period
        if m == 0:
            live, rb = None, rb_raw
        else:
            # dead when K <= 0 or when the branch z-score would overflow
            # (all-tiny sigma: quad ~ 1/sigma^2); evaluate dead branches
            # at the principal radius (sanitized-where)
            live = (k > 0) & (rb_raw * rb_raw * quad < 1e30)
            rb = jnp.where(live, rb_raw, rp)
        logn = -0.5 * rb * rb * quad + const
        if m == 0:
            # the m = 0 branch's log-det zero at rp = 0 is the REMOVABLE
            # one (logdet -> 0): use the series-windowed log(sin x / x)
            # form. The split sph below is -inf there when a drawn radius
            # lands within half an ulp of a full period (f32 wrap gives
            # rp == 0 EXACTLY, and taper_x = 0 kills the mollifier floor
            # too) — observed once in 5M IWAE draws of the r4 matrix
            # (d2p2e2 example 8535, sample 175: NaN headline LL).
            u0 = (kpos * rp * rp if man.curvature_sign > 0
                  else jnp.where(k > 0, kpos * rp * rp, k * vsq))
            logdet = (n - 1) * _log_sindiv_u_soft(u0)
        else:
            log_sin_b = stable.log_abs_sin_soft(
                x_red, taper_x=sqrt_k * jnp.abs(rb))
            # logdet(rb) = (n-1) [log|sin| - log(sqrt(K) |rb|)];
            # smooth-in-K principal form when K can cross zero (kind 'u')
            sph = log_sin_b - jnp.log(jnp.maximum(sqrt_k * jnp.abs(rb),
                                                  tin))
            if man.curvature_sign > 0:
                logdet = (n - 1) * sph
            else:
                logdet = (n - 1) * jnp.where(
                    k > 0, sph, _log_sindiv_u_soft(k * vsq))
        logp = logn - logdet
        if live is not None:
            logp = jnp.where(live, logp, jnp.asarray(-1e30, logp.dtype))
        logps.append(logp)
    return jax.scipy.special.logsumexp(jnp.stack(logps, axis=-1), axis=-1)


def sample_and_log_prob(key, man, mu, sigma, k, wraps: int = 1):
    """Draw z and its log q(z) (reference ``rsample_log_prob`` semantics).

    The density is the exact multi-branch wrapped density of the sampled
    point, evaluated round-trip-free from the drawn tangent (see
    ``_sample_log_prob_drawn`` — the round-4 f32 stability fix).
    """
    shape = mu.shape[:-1] + (man.dim,)
    v = sigma * jax.random.normal(key, shape, dtype=mu.dtype)
    z = man.sample_projection_mu0(v, mu, k)
    logq = _sample_log_prob_drawn(man, v, sigma, k, wraps)
    return z, logq


def log_prob_mu0(man, z, sigma, k, wraps: int = 1):
    """log-density of the prior WrappedNormal(mu0, sigma)."""
    v = man.log_map_mu0(z, k)
    return _log_prob_from_principal(man, v, sigma, k, wraps)
