"""Pallas-kernel vs jnp-path equivalence (SURVEY.md §4 implication (c)).

On CPU the kernels run in interpreter mode — same kernel code, exact
semantics check; the TPU-compiled path is exercised by bench/roofline runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.kernels import (lorentz_distance, stereo_distance,
                              wrapped_reparam_stereo_t)
from mvae_tpu.kernels.manifold_kernels import _wrapped_reparam_jnp
from mvae_tpu.ops import lorentz, stable, stereographic

F32 = jnp.float32
B, N = 256, 8


def mk_points(seed, scale=0.3):
    return scale * jax.random.normal(jax.random.key(seed), (B, N), F32)


class TestStereoDistance:
    @pytest.mark.parametrize("k", [-1.0, -0.3, 0.4, 1.0])
    def test_matches_jnp(self, k):
        kk = F32(k)
        # valid coordinate-space points (inside the ball for K < 0)
        x = stereographic.exp_map_mu0(mk_points(0, 0.6), kk)
        y = stereographic.exp_map_mu0(mk_points(1, 0.6), kk)
        ours = stereo_distance(x, y, kk)
        oracle = stereographic.distance(x, y, kk)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                                   rtol=2e-5, atol=1e-6)

    def test_unpadded_batch(self):
        kk = F32(-1.0)
        x = stereographic.exp_map_mu0(mk_points(0, 0.6), kk)[:100]
        y = stereographic.exp_map_mu0(mk_points(1, 0.6), kk)[:100]
        out = stereo_distance(x, y, F32(-1.0))
        assert out.shape == (100,)
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(stereographic.distance(x, y, F32(-1.0))),
            rtol=2e-5, atol=1e-6)

    def test_grads_match_jnp(self):
        kk = F32(-0.7)
        x = stereographic.exp_map_mu0(mk_points(0, 0.5), kk)
        y = stereographic.exp_map_mu0(mk_points(1, 0.5), kk)
        g1 = jax.grad(lambda a: jnp.sum(stereo_distance(a, y, kk)))(x)
        g2 = jax.grad(lambda a: jnp.sum(stereographic.distance(a, y, kk)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


class TestLorentzDistance:
    @pytest.mark.parametrize("k", [-1.0, -0.4])
    def test_matches_jnp(self, k):
        kk = F32(k)
        x = lorentz.exp_map_mu0(mk_points(2, 0.5), kk)
        y = lorentz.exp_map_mu0(mk_points(3, 0.5), kk)
        ours = lorentz_distance(x, y, kk)
        oracle = lorentz.distance(x, y, kk)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                                   rtol=2e-5, atol=1e-6)

    def test_grad_k(self):
        kk = F32(-0.8)
        x = lorentz.exp_map_mu0(mk_points(2, 0.5), kk)
        y = lorentz.exp_map_mu0(mk_points(3, 0.5), kk)
        g1 = jax.grad(lambda k_: jnp.sum(lorentz_distance(x, y, k_)))(kk)
        g2 = jax.grad(lambda k_: jnp.sum(lorentz.distance(x, y, k_)))(kk)
        np.testing.assert_allclose(float(g1), float(g2), rtol=1e-5)


def _reparam_setup(seed, S=3, n=6, b=130, mu_scale=0.4, sig_lo=0.5,
                   sig_hi=1.2, k=-1.0):
    ks = jax.random.split(jax.random.key(seed), 3)
    kk = F32(k)
    eps = jax.random.normal(ks[0], (n, S, b), F32)  # latent dim LEADING
    mu = stereographic.exp_map_mu0(
        mu_scale * jax.random.normal(ks[1], (b, n), F32), kk)
    sig = sig_lo + (sig_hi - sig_lo) * jax.random.uniform(ks[2], (n, b),
                                                          dtype=F32)
    return eps, mu.T, sig, kk


class TestWrappedReparam:
    """The production IWAE reparam kernel vs the exact jnp composition
    (sample projection + principal-preimage log q + prior log p)."""

    @pytest.mark.parametrize("k", [-1.0, -0.2, 0.0, 0.3, 0.9])
    @pytest.mark.parametrize("wraps", [0, 1])
    def test_matches_jnp(self, k, wraps):
        eps, mu_t, sig_t, kk = _reparam_setup(4, k=k)
        z1, lq1, lp1 = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk,
                                                wraps=wraps)
        z2, lq2, lp2 = _wrapped_reparam_jnp(eps, mu_t, sig_t, kk,
                                            wraps=wraps)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=3e-5, atol=1e-6)
        # log q carries an intrinsic f32 conditioning blow-up for draws
        # landing near the K>0 antipode (d logdet/d r ~ cot(theta) -> inf);
        # measured kernel-vs-f64-truth error there is <= 5e-4 at sigma<=1.2
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=1e-4, atol=3e-3)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                                   rtol=1e-4, atol=3e-3)

    def test_wrap_images_positive_k(self):
        """Large sigma on K > 0 puts real mass on the wrap images: the
        kernel's wraps=1 branch sum must track the F64 truth (the f32 jnp
        oracle itself carries antipode conditioning noise here), and differ
        measurably from wraps=0."""
        eps, mu_t, sig_t, kk = _reparam_setup(5, k=1.0, sig_lo=1.8,
                                              sig_hi=2.5, n=4)
        _, lq1, lp1 = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk, wraps=1)
        e64, m64, s64 = (jnp.asarray(a, jnp.float64)
                         for a in (eps, mu_t, sig_t))
        _, lq2, lp2 = _wrapped_reparam_jnp(e64, m64, s64,
                                           jnp.float64(kk), wraps=1)
        # measured: max 0.025 (near-antipode rows), p99 4e-4
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=1e-4, atol=0.08)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                                   rtol=1e-4, atol=1e-4)
        _, lq0, _ = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk, wraps=0)
        assert float(jnp.max(jnp.abs(lq1 - lq0))) > 1e-3

    def test_scalar_sigma_and_unaligned_shapes(self):
        # b not a lane multiple, S not a sublane multiple, isotropic sigma
        eps, mu_t, _, kk = _reparam_setup(6, S=5, n=2, b=77, k=0.7)
        sig_t = jnp.full((2, 77), 0.8, F32)
        z1, lq1, lp1 = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk)
        z2, lq2, lp2 = _wrapped_reparam_jnp(eps, mu_t, sig_t, kk)
        assert z1.shape == (2, 5, 77) and lq1.shape == (5, 77)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=3e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                                   rtol=3e-5, atol=3e-5)

    def test_k_negative_boundary_stays_in_ball(self):
        """The kernel must apply the same K<0 ball clamps as the jnp path
        (ops.stereographic.project) — huge tangents may not escape. At this
        degenerate sigma the log-density value is CLAMP-DEFINED (the
        eps(dtype) atanh cap sets it, and the f32 jnp oracle additionally
        cancels in mobius_add at denw ~ 1e-6 — the kernel's componentwise
        form is the more accurate of the two), so the density contract
        here is finiteness, not equality."""
        eps, mu_t, _, kk = _reparam_setup(7, mu_scale=3.0, k=-1.0)
        sig_t = jnp.full(mu_t.shape, 40.0, F32)
        z1, lq1, lp1 = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk)
        z2, _, _ = _wrapped_reparam_jnp(eps, mu_t, sig_t, kk)
        max_norm = (1.0 - stable.eps(jnp.float32)) / jnp.sqrt(-kk)
        norms = jnp.sqrt(jnp.sum(z1 * z1, axis=0))
        assert float(jnp.max(norms)) <= float(max_norm) * (1 + 1e-6)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=1e-4, atol=1e-5)
        assert np.all(np.isfinite(np.asarray(lq1)))
        assert np.all(np.isfinite(np.asarray(lp1)))
