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


# --- fused wrapped-normal sample projection (stereographic family) -----------


def _wrapped_sample_kernel(v_ref, mu_ref, sigma_ref, k_ref, z_ref, lq_ref):
    """z = mu (+)_K exp_0(v), logq = N(v; 0, sigma) - (n-1) log(sin_k(r)/r),
    one VMEM pass. v_ref holds the PRE-SCALED tangent (sigma*eps).

    All per-row scalars (five packed Gram/log reductions, the tandiv and
    log_sindiv series tails, the mobius coefficients, and the K<0 ball
    clamps of ops.stereographic.project) are computed batch-along-lanes;
    the two final multipliers transpose back and lane-broadcast into z.
    """
    i = pl.program_id(0)
    v = v_ref[:]
    mu = mu_ref[:]
    sigma = sigma_ref[:]
    k = k_ref[0]
    n = v.shape[1]
    e = stable.eps(v.dtype)
    tin = stable.tiny(v.dtype)

    nv = v / sigma
    packed = jnp.concatenate([
        jnp.sum(v * v, axis=1, keepdims=True),
        jnp.sum(mu * mu, axis=1, keepdims=True),
        jnp.sum(mu * v, axis=1, keepdims=True),
        jnp.sum(nv * nv, axis=1, keepdims=True),
        jnp.sum(jnp.log(sigma), axis=1, keepdims=True),
    ], axis=1).T                                     # (5, B) compact
    vsq, x2, xv, s2, ls = (packed[0:1], packed[1:2], packed[2:3],
                           packed[3:4], packed[4:5])

    # exp_0 radial factor, with the same K<0 ball clamp ops.exp_map_mu0
    # applies through project()
    g = 0.5 * _tandiv_u_kernel(k * vsq / 4.0)
    negk = jnp.minimum(k, -tin)
    max2 = (1.0 - e) * (1.0 - e) / (-negk)           # ball radius^2 (K<0)
    y2_raw = g * g * vsq
    g = g * jnp.where(k < 0, jnp.minimum(
        1.0, jnp.sqrt(max2 / jnp.maximum(y2_raw, tin))), 1.0)

    # mobius_add(mu, g*v) from Gram values only
    gxv = g * xv
    g2v = g * g * vsq
    a = 1.0 - 2.0 * k * gxv - k * g2v                # coefficient of mu
    b = (1.0 + k * x2) * g                           # coefficient of v
    den = 1.0 - 2.0 * k * gxv + k * k * x2 * g2v
    den = jnp.where(jnp.abs(den) < 1e-6, 1e-6, den)
    p = a / den
    q = b / den
    # final project() clamp (K<0): |z|^2 from the same Gram values
    zn2 = p * p * x2 + 2.0 * p * q * xv + q * q * vsq
    scale = jnp.where(k < 0, jnp.minimum(
        1.0, jnp.sqrt(max2 / jnp.maximum(zn2, tin))), 1.0)
    p = p * scale
    q = q * scale

    logn = -0.5 * s2 - ls - 0.5 * n * _LOG_2PI
    logdet = (n - 1.0) * stable.log_sindiv_u(k * vsq)
    lq_ref[i % 8, :] = (logn - logdet)[0]            # row-block store

    pq = jnp.concatenate([p, q], axis=0).T           # (B, 2) back-transpose
    z_ref[:] = pq[:, 0:1] * mu + pq[:, 1:2] * v


def _wrapped_sample_fwd_pallas(v, mu, sigma, k):
    (vp, b0) = _pad_batch(v, BLOCK_B)
    (mup, _) = _pad_batch(mu, BLOCK_B)
    sigma_full = jnp.broadcast_to(sigma, v.shape)
    (sigp, _) = _pad_batch(jnp.where(sigma_full > 0, sigma_full, 1.0),
                           BLOCK_B)
    sigp = jnp.where(sigp > 0, sigp, 1.0)  # padded rows: sigma=1 (no NaN)
    bp, n = vp.shape
    nb = bp // BLOCK_B
    nbp = -(-nb // 8) * 8
    z, lq = pl.pallas_call(
        _wrapped_sample_kernel,
        grid=(nb,),
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
            pl.BlockSpec((8, BLOCK_B), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, n), v.dtype),
            jax.ShapeDtypeStruct((nbp, BLOCK_B), v.dtype),
        ),
        interpret=_interpret(),
    )(vp, mup, sigp, jnp.reshape(k, (1,)).astype(v.dtype))
    return z[:b0], lq[:nb].reshape(-1)[:b0]


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
