"""Fused Pallas TPU kernels for the hot manifold ops (L1 native path).

The reference's manifold math rides on stock PyTorch CUDA elementwise
kernels (oskopek/mvae has no native code of its own — SURVEY.md §2); the
TPU-native equivalent is this module: each op is ONE VMEM-resident pass
over the batch — the three Gram reductions and all the curvature-stable
scalar math (series windows included) happen per tile without
rematerializing intermediates in HBM.

Measured on TPU v5e at (1M, 128) f32 (see kernels/roofline.py):

  lorentz_distance   pallas 710 GB/s (87% of the 819 GB/s HBM roofline;
                     XLA jnp path 721 GB/s) — the >=80% BASELINE target.
  stereo_distance    pallas 208 GB/s vs XLA 323 GB/s — this op is bound by
                     lane reductions + the dual-branch arctan/artanh tail,
                     not bandwidth, for BOTH paths; the jnp path stays
                     default.
  wrapped_sample     pallas 120 GB/s vs XLA 187 GB/s — same story.

At VAE-training shapes (batch ~1k, n <= 12) the whole op fits in one tile
and is dispatch-bound, where XLA's own fusion of the jnp path is equally
good — so the Pallas path is opt-in (`MVAE_PALLAS=1` or the `use_pallas`
flag) and the jnp path remains the oracle in tests.

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
    x = x_ref[:]
    y = y_ref[:]
    k = k_ref[0]
    rows2d = o_ref.shape  # (BLOCK_B // 128, 128): lane-friendly layout
    # per-row Gram values, reshaped OUT of the (B,) pseudo-1-D layout before
    # the transcendental tail (1-D maps to a single sublane on the VPU)
    x2 = jnp.sum(x * x, axis=1).reshape(rows2d)
    y2 = jnp.sum(y * y, axis=1).reshape(rows2d)
    xy = jnp.sum(x * y, axis=1).reshape(rows2d)
    # |(-x) (+)_K y|^2 from the Gram values only (no vector materialization):
    a = 1.0 + 2.0 * k * xy - k * y2      # coefficient of -x in the numerator
    b = 1.0 + k * x2                     # coefficient of y
    den = 1.0 + 2.0 * k * xy + k * k * x2 * y2
    den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
    w2 = (a * a * x2 + b * b * y2 - 2.0 * a * b * xy) / (den * den)
    w2 = jnp.maximum(w2, 0.0)
    o_ref[:] = 2.0 * jnp.sqrt(w2 + 1e-30) * _arctandiv_u_kernel(k * w2)


def _stereo_dist_fwd_pallas(x, y, k):
    (xp, b0) = _pad_batch(x, BLOCK_B)
    (yp, _) = _pad_batch(y, BLOCK_B)
    bp, n = xp.shape
    out = pl.pallas_call(
        _stereo_dist_kernel,
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


# --- fused wrapped-normal sample projection (stereographic family) -----------


def _wrapped_sample_kernel(v_ref, mu_ref, sigma_ref, k_ref, z_ref, lq_ref):
    """z = mu (+)_K exp_0(sigma*eps), logq = N(v) - (n-1) log(sin_k(r)/r),
    all in one VMEM pass. v_ref holds the PRE-SCALED tangent (sigma*eps)."""
    v = v_ref[:]
    mu = mu_ref[:]
    sigma = sigma_ref[:]
    k = k_ref[0]
    n = v.shape[1]

    vsq = jnp.sum(v * v, axis=1, keepdims=True)
    g = 0.5 * stable.tandiv_u(k * vsq / 4.0)
    y = g * v  # exp_0(v)

    x2 = jnp.sum(mu * mu, axis=1, keepdims=True)
    y2 = jnp.sum(y * y, axis=1, keepdims=True)
    xy = jnp.sum(mu * y, axis=1, keepdims=True)
    num = (1.0 - 2.0 * k * xy - k * y2) * mu + (1.0 + k * x2) * y
    den = 1.0 - 2.0 * k * xy + k * k * x2 * y2
    den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
    z_ref[:] = num / den

    r2 = vsq.squeeze(-1)
    logn = jnp.sum(-0.5 * (v / sigma) ** 2 - jnp.log(sigma), axis=1) \
        - 0.5 * n * 1.8378770664093453  # log(2 pi)
    logdet = (n - 1.0) * stable.log_sindiv_u(k * r2)
    lq_ref[:] = (logn - logdet).reshape(lq_ref.shape)


def _wrapped_sample_fwd_pallas(v, mu, sigma, k):
    (vp, b0) = _pad_batch(v, BLOCK_B)
    (mup, _) = _pad_batch(mu, BLOCK_B)
    sigma_full = jnp.broadcast_to(sigma, v.shape)
    (sigp, _) = _pad_batch(jnp.where(sigma_full > 0, sigma_full, 1.0),
                           BLOCK_B)
    sigp = jnp.where(sigp > 0, sigp, 1.0)  # padded rows: sigma=1 (no NaN)
    bp, n = vp.shape
    z, lq = pl.pallas_call(
        _wrapped_sample_kernel,
        grid=(bp // BLOCK_B,),
        in_specs=[
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_B, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, n), v.dtype),
            jax.ShapeDtypeStruct((bp // 128, 128), v.dtype),
        ),
        interpret=_interpret(),
    )(vp, mup, sigp, jnp.reshape(k, (1,)).astype(v.dtype))
    return z[:b0], lq.reshape(-1)[:b0]


def _wrapped_sample_jnp(v, mu, sigma, k):
    """jnp reference (oracle + backward path)."""
    from ..distributions import normal
    z = stereographic.sample_projection_mu0(v, mu, k)
    r = stable.safe_norm(v)
    logq = normal.log_prob(v, jnp.zeros((), v.dtype), sigma) \
        - (v.shape[-1] - 1) * stable.log_sin_k_div(r, k)
    return z, logq


@jax.custom_vjp
def wrapped_sample_stereo(v, mu, sigma, k):
    """Fused wrapped-normal push-forward + log-density on the
    kappa-stereographic family. v is the pre-scaled tangent draw."""
    return _wrapped_sample_fwd_pallas(v, mu, sigma, k)


def _ws_vjp_fwd(v, mu, sigma, k):
    return _wrapped_sample_fwd_pallas(v, mu, sigma, k), (v, mu, sigma, k)


def _ws_vjp_bwd(res, gs):
    v, mu, sigma, k = res
    _, vjp = jax.vjp(_wrapped_sample_jnp, v, mu, sigma, k)
    return vjp(gs)


wrapped_sample_stereo.defvjp(_ws_vjp_fwd, _ws_vjp_bwd)
