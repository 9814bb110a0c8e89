"""Fused Pallas TPU kernels for the hot manifold ops (L1 native path).

The reference's manifold math rides on stock PyTorch CUDA elementwise
kernels (oskopek/mvae has no native code of its own — SURVEY.md §2); the
TPU-native equivalent is this module: each op is ONE VMEM-resident pass
over the batch — the Gram reductions and all the curvature-stable scalar
math (series windows included) happen per tile without rematerializing
intermediates in HBM.

Layout design (the round-2 rewrite; measured on TPU v5e at (1M, 128) f32,
see kernels/roofline.py for the current numbers and the roofline model):

* Per-row Gram values are tree-reduced with ``keepdims`` and packed into a
  single (B, m) tile that is transposed ONCE to (m, B); all per-row scalar
  math (series windows, atan/atanh polynomials, clamps) then runs on
  batch-along-lanes vregs at full VPU width.  The round-1 kernels instead
  relayouted each (B,) reduction separately, which dominated their runtime
  (3 relayouts ≈ 6 us per 2048-row block).
* Per-row *multipliers* that must scale (B, n) row-major data are
  back-transposed as one (m, B) -> (B, m) tile and lane-broadcast (native
  splat), never recomputed in broadcast layout.
* Scalar-result kernels write a (B, 1) column block (no relayout at all).
* Mosaic's ``jnp.tan`` lowering measures ~28x slower than ``sin``/``cos``
  on v5e, so the K>0 closed branch of ``tandiv`` uses sin/cos; ``atan``
  has no Mosaic lowering at all and uses a minimax polynomial.

Measured effective bandwidth at (1M, 128) f32 (HBM roofline 819 GB/s):

  lorentz_distance   pallas ~700 GB/s (~86%); XLA path ~730 GB/s (tie).
  stereo_distance    pallas ~460 GB/s vs XLA ~325 GB/s (1.4x) — the op is
                     bound by the three cross-lane Gram reductions, not
                     bandwidth; ~460 GB/s is ~90% of the computed binding
                     (VPU) roofline, see roofline.py.
  wrapped_sample     pallas ~375 GB/s vs XLA ~275 GB/s (1.4x) — same
                     story with five reductions + two series tails.

At VAE-training shapes (batch ~1k, n <= 12) the whole op fits in one tile
and is dispatch-bound, where XLA's own fusion of the jnp path is equally
good — so these three kernels stay opt-in (`MVAE_PALLAS=1` or the
`use_pallas` flag) and the jnp path remains the oracle in tests.  The
default-on Pallas win lives in kernels/decoder_kernels.py (IWAE eval).

Layout contract: inputs are (B, n) f32 with n <= 128; B is padded to the
block size internally. Backward passes reuse the jnp reference ops (XLA
fuses them well), via jax.custom_vjp.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import stable, stereographic, lorentz

BLOCK_B = 2048

# Mosaic has no atan lowering; minimax odd polynomial on [0,1] (max abs
# error 6.3e-9, fitted at Chebyshev nodes) + pi/2 reflection for |x| > 1.
_ATAN_COEFFS = (9.9999990555e-01, -3.3332657853e-01, 1.9986537489e-01,
                -1.4164333375e-01, 1.0507319787e-01, -7.2479506631e-02,
                3.9899560051e-02, -1.4458697075e-02, 2.4682466265e-03)
_HALF_PI = 1.5707963267948966
_LOG_2PI = 1.8378770664093453


def _atan_poly(x):
    """Elementwise atan for Pallas kernels (f32 accuracy)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    t = jnp.where(inv, 1.0 / jnp.maximum(ax, 1.0), ax)
    t2 = t * t
    acc = jnp.zeros_like(t)
    for coef in reversed(_ATAN_COEFFS):
        acc = acc * t2 + coef
    r = t * acc
    r = jnp.where(inv, _HALF_PI - r, r)
    return jnp.sign(x) * r


def _arctandiv_u_kernel(w):
    """stable.arctandiv_u with the atan branch replaced by _atan_poly
    (identical series window and atanh branch)."""
    small, ws, wc = stable._split_series_window(w)
    series = stable._poly(ws, [-1.0 / 3, 1.0 / 5, -1.0 / 7, 1.0 / 9,
                               -1.0 / 11])
    pos_w = jnp.maximum(wc, stable.tiny(w.dtype))
    sw_pos = jnp.sqrt(pos_w)
    e = stable.eps(w.dtype)
    neg_w = jnp.clip(-wc, stable.tiny(w.dtype), (1.0 - e) ** 2)
    sw_neg = jnp.sqrt(neg_w)
    closed = jnp.where(wc > 0,
                       _atan_poly(sw_pos) / sw_pos,
                       stable.atanh_clamped(sw_neg) / sw_neg)
    return jnp.where(small, series, closed)


def _tandiv_u_kernel(u):
    """stable.tandiv_u with the K>0 tan branch via sin/cos (Mosaic's tan
    lowering measures ~28x slower than sin+cos on v5e)."""
    small, us, uc = stable._split_series_window(u)
    series = stable._poly(us, [1.0 / 3, 2.0 / 15, 17.0 / 315, 62.0 / 2835,
                               1382.0 / 155925])
    pos_u = jnp.maximum(uc, stable.tiny(u.dtype))
    su = jnp.sqrt(pos_u)
    neg_u = jnp.maximum(-uc, stable.tiny(u.dtype))
    sn = jnp.sqrt(neg_u)
    closed = jnp.where(uc > 0, jnp.sin(su) / (jnp.cos(su) * su),
                       jnp.tanh(sn) / sn)
    return jnp.where(small, series, closed)


def _interpret() -> bool:
    """CPU tests run the kernels in interpreter mode."""
    return jax.default_backend() == "cpu"


def use_pallas() -> bool:
    return os.environ.get("MVAE_PALLAS", "0") == "1"


def _pad_batch(a, block: int):
    b = a.shape[0]
    pad = (-b) % block
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, b


# --- stereographic (Poincare / projected-sphere / universal) distance -------


def _stereo_dist_kernel(x_ref, y_ref, k_ref, o_ref):
    i = pl.program_id(0)
    x = x_ref[:]
    y = y_ref[:]
    k = k_ref[0]
    # three packed tree reductions -> ONE (B,3)->(3,B) relayout; the whole
    # transcendental tail then runs batch-along-lanes at full VPU width
    packed = jnp.concatenate([
        jnp.sum(x * x, axis=1, keepdims=True),
        jnp.sum(y * y, axis=1, keepdims=True),
        jnp.sum(x * y, axis=1, keepdims=True),
    ], axis=1).T                                       # (3, B) compact
    x2, y2, xy = packed[0:1], packed[1:2], packed[2:3]
    # |(-x) (+)_K y|^2 from the Gram values only (no vector materialization)
    a = 1.0 + 2.0 * k * xy - k * y2      # coefficient of -x in the numerator
    b = 1.0 + k * x2                     # coefficient of y
    den = 1.0 + 2.0 * k * xy + k * k * x2 * y2
    den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
    w2 = (a * a * x2 + b * b * y2 - 2.0 * a * b * xy) / (den * den)
    w2 = jnp.maximum(w2, 0.0)
    d = 2.0 * jnp.sqrt(w2 + 1e-30) * _arctandiv_u_kernel(k * w2)
    # row-block store (a (1,B)->(B,1) column transpose costs ~0.7 us/block
    # on v5e — measured 488 vs 743 GB/s end to end)
    o_ref[i % 8, :] = d[0]


def _stereo_dist_fwd_pallas(x, y, k):
    (xp, b0) = _pad_batch(x, BLOCK_B)
    (yp, _) = _pad_batch(y, BLOCK_B)
    bp, n = xp.shape
    nb = bp // BLOCK_B
    nbp = -(-nb // 8) * 8
    out = pl.pallas_call(
        _stereo_dist_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, BLOCK_B), lambda i: (i // 8, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbp, BLOCK_B), x.dtype),
        interpret=_interpret(),
    )(xp, yp, jnp.reshape(k, (1,)).astype(x.dtype))
    return out[:nb].reshape(-1)[:b0]


@jax.custom_vjp
def stereo_distance(x, y, k):
    """Fused gyrovector distance d(x, y) = 2 arctan_k(|(-x)+y|); any K."""
    return _stereo_dist_fwd_pallas(x, y, k)


def _stereo_dist_vjp_fwd(x, y, k):
    return _stereo_dist_fwd_pallas(x, y, k), (x, y, k)


def _stereo_dist_vjp_bwd(res, g):
    x, y, k = res
    # backward through the jnp reference (XLA-fused, numerically identical)
    _, vjp = jax.vjp(lambda xx, yy, kk: stereographic.distance(xx, yy, kk),
                     x, y, k)
    return vjp(g)


stereo_distance.defvjp(_stereo_dist_vjp_fwd, _stereo_dist_vjp_bwd)


# --- Lorentz hyperboloid distance --------------------------------------------


def _lorentz_dist_kernel(x_ref, y_ref, k_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]
    c = jnp.maximum(-k_ref[0], 1e-30)
    d = y - x
    # Lorentzian |d|^2 = sum_i d_i^2 - 2 d_0^2 (cancellation-free form)
    dsq = jnp.sum(d * d, axis=1) - 2.0 * d[:, 0] * d[:, 0]
    e = jnp.maximum(c * dsq / 2.0, 0.0) + 1e-30
    dist = stable.acosh_1p(e) / jnp.sqrt(c)
    o_ref[:] = dist.reshape(o_ref.shape)


def _lorentz_dist_fwd_pallas(x, y, k):
    (xp, b0) = _pad_batch(x, BLOCK_B)
    (yp, _) = _pad_batch(y, BLOCK_B)
    bp, n = xp.shape
    out = pl.pallas_call(
        _lorentz_dist_kernel,
        grid=(bp // BLOCK_B,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_B // 128, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp // 128, 128), x.dtype),
        interpret=_interpret(),
    )(xp, yp, jnp.reshape(k, (1,)).astype(x.dtype))
    return out.reshape(-1)[:b0]


@jax.custom_vjp
def lorentz_distance(x, y, k):
    """Fused hyperboloid distance R*acosh(1 + c|y-x|_L^2/2)."""
    return _lorentz_dist_fwd_pallas(x, y, k)


def _lorentz_dist_vjp_fwd(x, y, k):
    return _lorentz_dist_fwd_pallas(x, y, k), (x, y, k)


def _lorentz_dist_vjp_bwd(res, g):
    x, y, k = res
    _, vjp = jax.vjp(lambda xx, yy, kk: lorentz.distance(xx, yy, kk), x, y, k)
    return vjp(g)


lorentz_distance.defvjp(_lorentz_dist_vjp_fwd, _lorentz_dist_vjp_bwd)


# --- fused wrapped-normal IWAE reparam (stereographic family) ----------------
#
# The PRODUCTION manifold kernel (round-3): one VMEM pass computes, for a
# whole importance-sample chunk, the full wrapped-normal reparam chain of
# models.vae.log_likelihood —
#
#   z    = mu (+)_K exp_0(sigma * eps)        (sample projection at mu0)
#   logq = WrappedNormal(mu, sigma).log_prob(z)   [exact: principal preimage
#          radius via (-mu) (+) z, plus wrap-image pairs on K > 0]
#   logp = WrappedNormal(mu0, 1).log_prob(z)      (the IWAE prior term)
#
# Layout: batch along LANES, latent dim n (<= 32) along sublanes — the same
# orientation as kernels/decoder_kernels.py, so the emitted z feeds the
# fused decoder with ZERO relayout: eps arrives (S, n, B), mu/sigma (n, B)
# are fetched once per batch block and REUSED across the whole sample grid
# axis, z leaves as (S, n, B). In the natural (S, B, n<=12) orientation XLA
# pads the trailing dim 16x and every elementwise pass in the ~50-op reparam
# chain pays that padding; here all per-(sample, example) scalars are
# (1, B) compact rows.

_REPARAM_BLK = 512  # lanes per (8-sample x lanes) packed tile


def use_fused_reparam() -> bool:
    """Default ON on compiled backends (production IWAE path); interpret
    mode (CPU tests) is opt-in via MVAE_FUSED_REPARAM=1."""
    v = os.environ.get("MVAE_FUSED_REPARAM", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


def _log_max(x, floor):
    return jnp.log(jnp.maximum(x, floor))


# Sign-specialized series helpers: a component's curvature SIGN is static
# (manifold.curvature_sign — 'd' is pinned negative, 'p' positive, 'u'
# free), so pinned kinds skip the transcendental branch they can never
# take. Each dropped branch removes a sin/cos/exp chain per tile — at the
# packed (8, BLK) tail width these dominate the kernel's VPU time.


def _tandiv_u_sgn(u, sign):
    small, us, uc = stable._split_series_window(u)
    series = stable._poly(us, [1.0 / 3, 2.0 / 15, 17.0 / 315, 62.0 / 2835,
                               1382.0 / 155925])
    su = jnp.sqrt(jnp.abs(uc))
    if sign > 0:
        closed = jnp.sin(su) / (jnp.cos(su) * su)
    elif sign < 0:
        closed = jnp.tanh(su) / su
    else:
        closed = jnp.where(uc > 0, jnp.sin(su) / (jnp.cos(su) * su),
                           jnp.tanh(su) / su)
    return jnp.where(small, series, closed)


def _arctandiv_u_sgn(w, sign):
    small, ws, wc = stable._split_series_window(w)
    series = stable._poly(ws, [-1.0 / 3, 1.0 / 5, -1.0 / 7, 1.0 / 9,
                               -1.0 / 11])
    e = stable.eps(w.dtype)
    tin = stable.tiny(w.dtype)
    if sign > 0:
        sw = jnp.sqrt(jnp.maximum(wc, tin))
        closed = _atan_poly(sw) / sw
    elif sign < 0:
        sw = jnp.sqrt(jnp.clip(-wc, tin, (1.0 - e) ** 2))
        closed = stable.atanh_clamped(sw) / sw
    else:
        sw_p = jnp.sqrt(jnp.maximum(wc, tin))
        sw_n = jnp.sqrt(jnp.clip(-wc, tin, (1.0 - e) ** 2))
        closed = jnp.where(wc > 0, _atan_poly(sw_p) / sw_p,
                           stable.atanh_clamped(sw_n) / sw_n)
    return jnp.where(small, series, closed)


def _log_sindiv_u_sgn(u, sign):
    small, us, uc = stable._split_series_window(u)
    sd_m1 = us * (-1.0 / 6 + us * (1.0 / 120 + us * (-1.0 / 5040
                                                     + us * (1.0 / 362880))))
    series = jnp.log1p(sd_m1)
    e = stable.eps(u.dtype)
    su = jnp.sqrt(jnp.abs(uc))
    if sign > 0:
        x_sph = jnp.clip(su, e, jnp.pi * (1.0 - 1e-6))
        closed = jnp.log(jnp.sin(x_sph) / x_sph)
    elif sign < 0:
        closed = su + jnp.log1p(-jnp.exp(-2.0 * su)) - jnp.log(2.0 * su)
    else:
        x_sph = jnp.clip(su, e, jnp.pi * (1.0 - 1e-6))
        sph = jnp.log(jnp.sin(x_sph) / x_sph)
        hyp = su + jnp.log1p(-jnp.exp(-2.0 * su)) - jnp.log(2.0 * su)
        closed = jnp.where(uc > 0, sph, hyp)
    return jnp.where(small, series, closed)


def _log_sindiv_u_sgn_soft(u, sign):
    """_log_sindiv_u_sgn with the mollified spherical branch (bounded
    derivative at the injectivity shell — stable.log_abs_sin_soft); the
    wrapped-normal DENSITY paths use this form (round-4 stability fix),
    geometric ops keep the exact one."""
    small, us, uc = stable._split_series_window(u)
    sd_m1 = us * (-1.0 / 6 + us * (1.0 / 120 + us * (-1.0 / 5040
                                                     + us * (1.0 / 362880))))
    series = jnp.log1p(sd_m1)
    e = stable.eps(u.dtype)
    su = jnp.sqrt(jnp.abs(uc))
    hyp = None
    if sign <= 0:
        hyp = su + jnp.log1p(-jnp.exp(-2.0 * su)) - jnp.log(2.0 * su)
    if sign > 0:
        closed = stable.log_abs_sin_soft(su) - jnp.log(jnp.maximum(su, e))
    elif sign < 0:
        closed = hyp
    else:
        sph = stable.log_abs_sin_soft(su) - jnp.log(jnp.maximum(su, e))
        closed = jnp.where(uc > 0, sph, hyp)
    return jnp.where(small, series, closed)


def _make_reparam_kernel(n: int, wraps: int, sign: int):
    """Latent dim n on the LEADING (grid-unrolled) axis; each block is
    (n, 8, L) = n fully-packed (8 sublane x L lane) batch tiles covering
    8 importance samples x L examples. Reductions over n are then plain
    vector adds of packed vregs and the whole ~100-op per-(sample,
    example) scalar tail runs at FULL vreg occupancy — the two layouts
    tried first (batch-on-lanes with per-row (1, B) scalars; 8-sample
    sublane packing of (8, n, B) tiles) measured 1.5-1.8x SLOWER than
    XLA on v5e because narrow rows idle 7/8 sublanes / axis-1 reductions
    relayout per sample."""

    def kernel(eps_ref, mu_ref, sig_ref, ls_ref, smin_ref, x2_ref, k_ref,
               zt_ref, lq_ref, lp_ref):
        eps = eps_ref[:]                              # (n, 8, L)
        mu = mu_ref[:]                                # (n, 1, L)
        sig = sig_ref[:]
        k = k_ref[0]
        dt = eps.dtype
        e = stable.eps(dt)
        tin = stable.tiny(dt)

        v = eps * sig
        # reductions over the leading axis: n-1 packed vector adds each
        vsq = jnp.sum(v * v, axis=0)                  # (8, L)
        xv = jnp.sum(mu * v, axis=0)
        s2 = jnp.sum(eps * eps, axis=0)               # = sum((v/sig)^2)
        x2 = x2_ref[0]        # sum(mu*mu) hoisted out of the sample grid
        ls = ls_ref[0]                                # sum(log sig), hoisted
        smin = smin_ref[0]                            # min sig, hoisted

        # exp_0 radial factor with the K<0 ball clamp of stereographic.project
        g = 0.5 * _tandiv_u_sgn(k * vsq / 4.0, sign)
        if sign <= 0:
            negk = jnp.minimum(k, -tin)
            # ball radius (K<0); k is an SMEM scalar so smax is scalar math
            smax = jnp.sqrt((1.0 - e) * (1.0 - e) / (-negk))
            g = g * jnp.where(k < 0, jnp.minimum(
                1.0, smax * jax.lax.rsqrt(jnp.maximum(g * g * vsq, tin))),
                1.0)

        # z = mobius_add(mu, g*v) via per-sample scalar coefficients
        gxv = g * xv
        g2v = g * g * vsq
        a = 1.0 - 2.0 * k * gxv - k * g2v             # coefficient of mu
        b = (1.0 + k * x2) * g                        # coefficient of v
        den = 1.0 - 2.0 * k * gxv + k * k * x2 * g2v
        den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
        inv_den = 1.0 / den                   # ONE (8, L) reciprocal: a
        p = a * inv_den                       # division per full-width
        q = b * inv_den                       # element costs 6x more
        z = p[None] * mu + q[None] * v                # (n, 8, L)
        zn2 = jnp.sum(z * z, axis=0)
        if sign <= 0:
            scale = jnp.where(k < 0, jnp.minimum(   # final project() clamp
                1.0, smax * jax.lax.rsqrt(jnp.maximum(zn2, tin))), 1.0)
            z = z * scale[None]
            zn2 = jnp.maximum(zn2 * scale * scale, 0.0)
        zt_ref[:] = z
        del smin  # legacy input (kept in the call signature/layout)

        # log q: drawn-radius branch sum (round-4 stability fix, matching
        # distributions.wrapped_normal._sample_log_prob_drawn). Every
        # preimage of z along the drawn geodesic is (r + m T) v_hat with
        # r = |v|, so the density needs only the SCALAR wrap of the drawn
        # radius and z-scores from the drawn direction (r^2 quad = |eps|^2)
        # — the mobius inverse round trip this kernel previously ran had
        # O(eps * |v|) f32 direction noise that 1/sigma_j^2 amplified
        # (the d2p2e2 NaN spiral; see wrapped_normal.py).
        vsq_g = vsq + tin
        r = jnp.sqrt(vsq_g)
        quad = s2 / vsq_g
        half_l2pi = 0.5 * n * _LOG_2PI

        if sign < 0:
            logq = (-0.5 * s2 - ls - half_l2pi
                    - (n - 1.0) * _log_sindiv_u_sgn_soft(k * vsq_g, sign))
        else:
            kpos = jnp.maximum(k, 1e-20)
            sqk = jnp.sqrt(kpos)
            period = (2.0 * jnp.pi / sqk).astype(dt)
            rp_w = jnp.abs(r - period * jnp.floor(r / period + 0.5))
            rp = rp_w if sign > 0 else jnp.where(k > 0, rp_w, r)
            if wraps == 0:
                u_arg = (kpos * rp * rp if sign > 0
                         else jnp.where(k > 0, kpos * rp * rp, k * vsq_g))
                logq = (-0.5 * rp * rp * quad - ls - half_l2pi
                        - (n - 1.0) * _log_sindiv_u_sgn_soft(u_arg, sign))
            else:
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
                        # log(sin x / x) (the split form below is -inf
                        # when an f32 draw wraps to rp == 0 exactly —
                        # the d2p2e2 eval NaN; see wrapped_normal.py)
                        u0 = (kpos * rp * rp if sign > 0
                              else jnp.where(k > 0, kpos * rp * rp,
                                             k * vsq_g))
                        logdet = (n - 1.0) * _log_sindiv_u_sgn_soft(
                            u0, sign)
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
                logq = mx + jnp.log(acc)

        # prior WrappedNormal(mu0, 1): radius is just |log_map_mu0(z)|
        r0 = 2.0 * jnp.sqrt(zn2 + tin) * _arctandiv_u_sgn(k * zn2, sign)
        r02 = r0 * r0
        logp = -0.5 * r02 - half_l2pi \
            - (n - 1.0) * _log_sindiv_u_sgn_soft(k * r02, sign)

        if wraps > 0 and sign >= 0:
            # prior wrap-image pair (isotropic sigma = 1: nearest images
            # only — the rest carry exp(-(2 pi R)^2/2) mass)
            period = (2.0 * jnp.pi
                      / jnp.sqrt(jnp.maximum(k, 1e-20))).astype(dt)
            sqk0 = jnp.sqrt(jnp.maximum(k, 1e-20))
            terms = [logp]
            for sgn in (1.0, -1.0):
                rb_raw = r0 + sgn * period
                live = (k > 0) & (jnp.abs(rb_raw) < 1e15)
                rb = jnp.where(live, rb_raw, r0)
                logn_b = -0.5 * rb * rb - half_l2pi
                lsk_b = stable.log_abs_sin_soft(
                    sqk0 * r0, taper_x=sqk0 * jnp.abs(rb)) - jnp.log(sqk0)
                logd_b = (n - 1.0) * (lsk_b - _log_max(jnp.abs(rb), tin))
                terms.append(jnp.where(live, logn_b - logd_b,
                                       jnp.full_like(logp, -1e30)))
            m = jnp.maximum(jnp.maximum(terms[0], terms[1]), terms[2])
            logp = m + jnp.log(jnp.exp(terms[0] - m)
                               + jnp.exp(terms[1] - m)
                               + jnp.exp(terms[2] - m))

        lq_ref[:] = jnp.broadcast_to(logq, lq_ref.shape)
        lp_ref[:] = jnp.broadcast_to(logp, lp_ref.shape)

    return kernel


def _sindiv_u_kernel(u):
    """stable.sindiv_u with the sinh branch via exp (Mosaic has no sinh
    lowering); same series window and clamps."""
    small, us, uc = stable._split_series_window(u)
    series = stable._poly(us, [-1.0 / 6, 1.0 / 120, -1.0 / 5040,
                               1.0 / 362880])
    su = jnp.sqrt(jnp.abs(uc))
    sc = jnp.clip(su, -85.0, 85.0)
    sinh = 0.5 * (jnp.exp(sc) - jnp.exp(-sc))
    closed = jnp.where(uc > 0, jnp.sin(su) / su, sinh / su)
    return jnp.where(small, series, closed)


def wrapped_reparam_stereo_t(eps, mu_t, sigma_t, k, wraps: int = 1,
                             sign: int = 0):
    """Fused IWAE reparam for the kappa-stereographic family (d/p/u kinds).

    eps:     (n, S, B) standard-normal tangent draws — latent dim LEADING
             (the layout the kernel consumes with zero relayout; draw it
             directly in this shape)
    mu_t:    (n, B) posterior basepoints (coordinate space)
    sigma_t: (n, B) posterior scales
    k:       scalar curvature (any sign)
    sign:    static curvature sign (-1 'd', +1 'p', 0 'u') — pinned kinds
             compile without the transcendental branches they cannot take
    Returns (z (n, S, B), log_q (S, B), log_p (S, B)); z is the draw,
    log_q its exact posterior log-density (wrap images per ``wraps``),
    log_p the WrappedNormal(mu0, 1) prior log-density. Eval-only (IWAE has
    no backward); the jnp oracle is _wrapped_reparam_jnp.
    """
    n, S, b0 = eps.shape
    block = min(_REPARAM_BLK, -(-b0 // 128) * 128)
    pad = (-b0) % block
    sp = -(-S // 8) * 8
    if pad:
        eps = jnp.concatenate(
            [eps, jnp.zeros((n, S, pad), eps.dtype)], axis=2)
        mu_t = jnp.concatenate(
            [mu_t, jnp.zeros((n, pad), mu_t.dtype)], axis=1)
        sigma_t = jnp.concatenate(
            [sigma_t, jnp.ones((n, pad), sigma_t.dtype)], axis=1)
    if sp != S:  # pad the sample axis to the 8-per-step grid
        eps = jnp.concatenate(
            [eps, jnp.zeros((n, sp - S, eps.shape[2]), eps.dtype)], axis=1)
    bp = b0 + pad
    sigma_t = jnp.where(sigma_t > 0, sigma_t, 1.0)
    # per-example scalars hoisted out of the sample grid axis (computing
    # them in-kernel would redo an (n, B) pass S/8 times over — and mu's
    # (n, 1, B) tiles run at 1/8 sublane occupancy in-kernel, so the Gram
    # row is 6x cheaper out here too)
    ls_row = jnp.sum(jnp.log(sigma_t), axis=0, keepdims=True)[None]
    smin_row = jnp.min(sigma_t, axis=0, keepdims=True)[None]
    x2_row = jnp.sum(mu_t * mu_t, axis=0, keepdims=True)[None]
    mu3 = mu_t[:, None, :]                            # (n, 1, B)
    sig3 = sigma_t[:, None, :]

    z, lq, lp = pl.pallas_call(
        _make_reparam_kernel(n, wraps, sign),
        grid=(bp // block, sp // 8),
        in_specs=[
            pl.BlockSpec((n, 8, block), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, block), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, block), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block), lambda b, s: (0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((n, 8, block), lambda b, s: (0, s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda b, s: (s, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda b, s: (s, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, sp, bp), eps.dtype),
            jax.ShapeDtypeStruct((sp, bp), eps.dtype),
            jax.ShapeDtypeStruct((sp, bp), eps.dtype),
        ),
        interpret=_interpret(),
    )(eps, mu3, sig3, ls_row, smin_row, x2_row,
      jnp.reshape(k, (1,)).astype(eps.dtype))
    return z[:, :S, :b0], lq[:S, :b0], lp[:S, :b0]


def _wrapped_reparam_jnp(eps, mu_t, sigma_t, k, wraps: int = 1):
    """jnp oracle for wrapped_reparam_stereo_t: the exact composition the
    production path replaces (wrapped_normal on a 'u' descriptor covers
    d/p/u — one smooth-in-K implementation). eps is (n, S, B)."""
    from ..distributions import wrapped_normal
    from ..ops import Manifold
    n = eps.shape[0]
    man = Manifold("u", n)
    v = jnp.moveaxis(eps * sigma_t[:, None, :], 0, -1)   # (S, B, n)
    mu = mu_t.T
    sigma = sigma_t.T
    z = stereographic.sample_projection_mu0(v, mu, k)
    # round-4 semantics: log q of the drawn sample is round-trip-free
    logq = wrapped_normal._sample_log_prob_drawn(man, v, sigma, k, wraps)
    logp = wrapped_normal.log_prob_mu0(man, z, jnp.ones((), eps.dtype), k,
                                       wraps=wraps)
    return jnp.moveaxis(z, -1, 0), logq, logp
