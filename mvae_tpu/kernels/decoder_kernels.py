"""Fused MLP-decoder + Bernoulli log-likelihood Pallas kernel (IWAE path).

This is the default-ON Pallas kernel: it owns the hot op of the north-star
metric (IWAE-500 marginal LL, SURVEY.md §3.3 — reference
``mt/mvae/models/vae.py::log_likelihood`` [UNVERIFIED]), computing

    ll(z, x) = sum_pixels [ x * logits - softplus(logits) ],
    logits   = relu(z @ W1 + b1) @ W2 + b2

for z of shape (S, B, Z) against x of shape (B, D), entirely in VMEM.

Why it exists (all measured on TPU v5e, see roofline.py):

* **Precision.** XLA's *default* f32 dot on TPU is a single bf16 pass:
  the unfused jnp eval path silently carries up to ~1 nat of per-sample
  log p(x|z) error, which an estimator chasing a 0.1-nat reproduction
  target cannot absorb. Both GEMMs here compute the three bf16 product
  terms of the hi/lo split (hi*hi + hi*lo + lo*hi, f32 accumulation; the
  dropped lo*lo term is O(2^-16)) as ONE MXU dot over operands
  CONCATENATED along the contraction axis - [zh zl zh] @ [w_hi w_hi
  w_lo]^T. One K=3Z dot issues a third of the passes of three K=Z dots
  (K pads to the 128-deep systolic array either way), which at this
  model's tiny latent dims is where the MXU time goes: measured on v5e
  at the production IWAE shape (S=125, B=2048, Z=8, H=400, D=784),
  3.02 ms vs 3.76 ms for the 3-dot form (84 vs 65 Tmac/s counted at 3x
  MACs) with identical accuracy (max err ~2e-3 nats per 784-pixel row
  vs a full-f32 oracle, same as 3-dot).
* **Fusion.** ``h`` and ``logits`` never round-trip HBM (~9.5 KB/row
  saved), and the x tile is fetched once per batch block and REUSED
  across the whole importance-sample grid axis.
* **Layout.** Everything runs TRANSPOSED - batch along lanes:
  z arrives as (S, Z, B), x as (D, B), weights as (H, Z)/(D, H), and the
  pixel reduction is a cross-SUBLANE sum. In the natural orientation the
  (S, B, Z<=12) tensors tile as T(8,128) with the trailing dim padded
  8->128: XLA materializes a 16x-padded z buffer through a slow kLoop
  pad-fusion and the kernel DMA reads at 8/128 lane efficiency
  (measured: ~49 ms of pure layout overhead per IWAE-500 eval at
  B=2048, more than the kernel's entire MXU time).

End-to-end on the h2,s2,e2 MNIST VAE, IWAE-500 at B=2048 (v5e): 18.1 ms
through this kernel vs 35.5 ms for the f32-grade (Precision.HIGHEST)
XLA path it replaces - 1.96x - and ~2e-3-nat agreement with it, where
the bf16-grade XLA default (12.3 ms) is off by up to ~1 nat per sample.

Eval-only (IWAE has no backward); models.vae.log_likelihood routes here
for depth-1 MLP decoders unless MVAE_FUSED_DECODER=0.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_C = 512  # max batch lanes per tile (hardware-validated at D=784, H=400)

# VMEM working-set proxy, in bytes, calibrated so the hardware-validated
# (Z=8, H=400, D=784, block=512) configuration sits exactly at the budget:
# concat-K bf16 weights (3 segments each) + double-buffered per-lane tiles
# (x, h + its 3-segment bf16 concat, logits + bce term). Larger (D, H)
# shrink the block instead of blowing past VMEM at Mosaic compile
# (round-2 ADVICE #4).
_VMEM_BUDGET = 6 * 400 * (8 + 784) + 2 * 512 * (12 * 784 + 10 * 400)


def _block_lanes(Z: int, H: int, D: int) -> int:
    """Largest lane-block (multiple of 128, <= BLOCK_C) within the budget;
    0 if even 128 lanes don't fit (ineligible shape)."""
    weights = 6 * H * (Z + D)
    per_lane = 2 * (12 * D + 10 * H)
    blk = (_VMEM_BUDGET - weights) // per_lane
    return max(0, min(BLOCK_C, (blk // 128) * 128))


def use_fused_decoder() -> bool:
    """Default ON on compiled backends; interpret mode (CPU tests) is
    opt-in via MVAE_FUSED_DECODER=1 (it is exact but slow)."""
    v = os.environ.get("MVAE_FUSED_DECODER", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


def use_fused_train_decoder() -> bool:
    """Default OFF (opt-in via MVAE_FUSED_TRAIN_DECODER=1): measured on
    v5e, fusing the train decode+BCE NET-LOSES against XLA's own fusion
    of this segment — 13.4k vs 13.1k steps/s at (B=1024, H=400), 8.0k vs
    6.7k at H=1024. XLA already keeps the BCE reduce and the backward
    dlogits fusion at their HBM floors and streams each weight once,
    while the kernel re-fetches its invariant weight blocks per batch
    block. Kept as a tested, documented negative result."""
    v = os.environ.get("MVAE_FUSED_TRAIN_DECODER", "auto")
    if v in ("0", "1"):
        return v == "1"
    return False


def _split(a):
    """f32 -> (hi, lo) bf16 pair with a = hi + lo up to 2^-16 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cat_weight(w):
    """(K, M) f32 weight -> (M, 3K) bf16 ``[hi | hi | lo]`` concat-K
    operand: dotted against the activation's ``[xh ; xl ; xh]`` stack it
    yields hi@xh + hi@xl + lo@xh in ONE MXU pass (f32 accumulation)."""
    hi, lo = _split(w.T)
    return jnp.concatenate([hi, hi, lo], axis=1)


_DN = (((1,), (0,)), ((), ()))


def _mm_cat(wc, x):
    """~f32-accurate (M,3K)@(K,N): stacks the bf16 hi/lo split of x along
    the contraction axis to match the ``[hi | hi | lo]`` weight concat
    (the dropped lo@lo term is O(2^-16))."""
    xh, xl = _split(x)
    xcat = jnp.concatenate([xh, xl, xh], axis=0)
    return jax.lax.dot_general(wc, xcat, _DN,
                               preferred_element_type=jnp.float32)


def _decode_bce_kernel(zt_ref, xt_ref, w1c_ref, b1_ref, w2c_ref, b2_ref,
                       o_ref):
    s = pl.program_id(1)
    ht = _mm_cat(w1c_ref[:], zt_ref[0]) + b1_ref[:]         # (H, BLOCK)
    ht = jnp.maximum(ht, 0.0)
    logits = _mm_cat(w2c_ref[:], ht) + b2_ref[:]            # (D, BLOCK)
    # stable x*l - softplus(l); pixel sum = cross-sublane reduction
    t = xt_ref[:] * logits - (jnp.maximum(logits, 0.0)
                              + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    o_ref[s % 8, :] = jnp.sum(t, axis=0, keepdims=True)[0]


def fused_decode_bce(z, x, w1, b1, w2, b2):
    """log p(x | z) for a depth-1 ReLU MLP Bernoulli decoder.

    z: (S, B, Z) latent draws; x: (B, D) targets in [0, 1].
    Returns (S, B) f32 per-(sample, example) pixel-sum log-likelihood.
    """
    # transpose to batch-along-lanes OUTSIDE the kernel: (S,B,Z<=12)
    # buffers tile T(8,128) with the trailing dim padded 16x; (S,Z,B) and
    # (D,B) tile compactly and DMA at full lane width
    return fused_decode_bce_t(jnp.swapaxes(z, 1, 2),
                              jnp.swapaxes(x, 0, 1).astype(jnp.float32),
                              w1, b1, w2, b2)


def fused_decode_bce_t(zt, xt, w1, b1, w2, b2):
    """Transposed-input entry: zt (S, Z, B), xt (D, B) already
    batch-along-lanes — the layout one XLA moveaxis away from what the
    fused reparam kernel (manifold_kernels.wrapped_reparam_stereo_t)
    emits (a (Z,S,B)->(S,Z,B) leading-axes swap, ~15us per IWAE chunk at
    production shapes; Mosaic cannot take Z on a middle block dim of
    size 1, so the swap stays outside)."""
    S, Z, B = zt.shape
    D = xt.shape[0]
    H = w1.shape[1]
    block = min(_block_lanes(Z, H, D), -(-B // 128) * 128)
    assert block >= 128, f"shape (Z={Z}, H={H}, D={D}) exceeds VMEM budget"
    pad = (-B) % block
    if pad:
        zt = jnp.concatenate(
            [zt, jnp.zeros((S, Z, pad), zt.dtype)], axis=2)
        xt = jnp.concatenate([xt, jnp.zeros((D, pad), xt.dtype)], axis=1)
    bp = B + pad
    w1c = _cat_weight(w1)                             # (H, 3Z)
    w2c = _cat_weight(w2)                             # (D, 3H)
    sp = -(-S // 8) * 8  # out rows padded to a sublane multiple

    out = pl.pallas_call(
        _decode_bce_kernel,
        grid=(bp // block, S),
        in_specs=[
            pl.BlockSpec((1, Z, block), lambda b, s: (s, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, block), lambda b, s: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * Z), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 1), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block), lambda b, s: (s // 8, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp, bp), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(zt, xt, w1c, b1[:, None], w2c, b2[:, None])
    return out[:S, :B]


# --- TRAINING-path fused decode + BCE (custom VJP) ---------------------------
#
# The train step's decoder tail cost three HBM-bound fusions beyond the
# GEMMs themselves: the forward BCE reduce (reads logits + x, ~8 us at
# batch 1024), the backward dlogits fusion (reads logits + x again), and
# the logits round trip between them. This kernel computes, in ONE pass
# per batch block,
#
#     h       = relu(z @ W1 + b1)            (kept for the wgrad GEMM)
#     logits  = h @ W2 + b2                  (never leaves VMEM)
#     ll      = sum_D [x * logits - softplus(logits)]
#     glogits = x - sigmoid(logits)          (= d ll / d logits)
#
# so the backward pass is NOTHING but the four GEMMs XLA already fuses
# into the Adam update (dl = ct * glogits folds into their operands).
#
# Precision contract: operands are cast to bf16 in VMEM and accumulated
# in f32 — exactly XLA's DEFAULT f32 dot on TPU (one bf16 pass), i.e.
# the same numerics the jnp training path runs; the BCE epilogue is f32.
# (The IWAE eval kernel above instead pays 3 split passes for ~f32
# accuracy — the 0.1-nat estimator needs it, the training loss does not.)

_TRAIN_BLK = 512  # batch rows per grid step (VMEM ~7 MB incl. pipelining)

_DNN = (((1,), (0,)), ((), ()))


def _mm_bf16(a, b):
    """One-pass bf16 MXU dot with f32 accumulation (XLA-default grade)."""
    return jax.lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16), _DNN,
                               preferred_element_type=jnp.float32)


def _train_decode_body(z, x, w1, b1, w2, b2):
    """Pure-jnp tile math (also the CPU/equivalence twin)."""
    h = jnp.maximum(_mm_bf16(z, w1) + b1, 0.0)
    logits = _mm_bf16(h, w2) + b2
    sp = jnp.maximum(logits, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ll = jnp.sum(x * logits - sp, axis=1)
    glogits = x - 1.0 / (1.0 + jnp.exp(-logits))
    return ll, h, glogits


def _train_decode_kernel(z_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         ll_ref, h_ref, gl_ref):
    ll, h, gl = _train_decode_body(z_ref[:], x_ref[:], w1_ref[:], b1_ref[:],
                                   w2_ref[:], b2_ref[:])
    ll_ref[:] = ll[:, None]
    h_ref[:] = h
    gl_ref[:] = gl


def _train_decode_fwd_pallas(z, x, w1, b1, w2, b2):
    B, Z = z.shape
    D = x.shape[1]
    H = w1.shape[1]
    block = min(_TRAIN_BLK, -(-B // 128) * 128)
    pad = (-B) % block
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, Z), z.dtype)])
        x = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)])
    bp = B + pad
    ll, h, gl = pl.pallas_call(
        _train_decode_kernel,
        grid=(bp // block,),
        in_specs=[
            pl.BlockSpec((block, Z), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Z, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # (block, 1) column: lane dim 1 == the full array dim, which
            # Mosaic accepts (a (block//128, 128) row block would need its
            # sublane dim divisible by 8)
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, H), jnp.float32),
            jax.ShapeDtypeStruct((bp, D), jnp.float32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(z, x, w1, b1[None, :], w2, b2[None, :])
    return ll.reshape(-1)[:B], h[:B], gl[:B]


@jax.custom_vjp
def train_decode_bce(z, x, w1, b1, w2, b2):
    """Per-example log p(x|z) for the TRAIN forward (depth-1 MLP decoder,
    XLA-default bf16-grade GEMMs); z (B, Z), x (B, D) -> (B,)."""
    ll, _, _ = _train_decode_fwd_pallas(z, x, w1, b1, w2, b2)
    return ll


def _train_decode_vjp_fwd(z, x, w1, b1, w2, b2):
    ll, h, gl = _train_decode_fwd_pallas(z, x, w1, b1, w2, b2)
    return ll, (z, h, gl, w1, w2)


def _train_decode_vjp_bwd(res, dll):
    """Four GEMMs (which fuse into the Adam updates) + two bias sums.
    The per-example cotangent scale dll is applied to the SMALLER (B, H)
    side everywhere — XLA measured a standalone 5 us (B, D) fusion for
    ``dll * glogits``, so that product is never materialized."""
    z, h, gl, w1, w2 = res
    hs = dll[:, None] * h                       # (B, H): 2x cheaper than gl
    db2 = _mm_bf16(gl.T, dll[:, None])[:, 0]    # matvec: sum_b dll_b gl_bd
    dw2 = _mm_bf16(hs.T, gl)
    dh = dll[:, None] * _mm_bf16(gl, w2.T) * (h > 0)
    db1 = jnp.sum(dh, axis=0)
    dw1 = _mm_bf16(z.T, dh)
    dz = _mm_bf16(dh, w1.T)
    return dz, jnp.zeros_like(gl), dw1, db1, dw2, db2


train_decode_bce.defvjp(_train_decode_vjp_fwd, _train_decode_vjp_bwd)
