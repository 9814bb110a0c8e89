"""Pallas-kernel vs jnp-path equivalence (SURVEY.md §4 implication (c)).

On CPU the kernels run in interpreter mode — same kernel code, exact
semantics check; the TPU-compiled path is exercised by bench/roofline runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.distributions import normal
from mvae_tpu.kernels import (lorentz_distance, stereo_distance,
                              wrapped_sample_stereo)
from mvae_tpu.kernels.manifold_kernels import _wrapped_sample_jnp
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


class TestWrappedSample:
    @pytest.mark.parametrize("k", [-1.0, -0.2, 0.3, 0.9])
    def test_matches_jnp(self, k):
        kk = F32(k)
        v = 0.5 * jax.random.normal(jax.random.key(4), (B, N), F32)
        mu = stereographic.exp_map_mu0(mk_points(5, 0.4), kk)
        sigma = F32(0.8)
        z1, lq1 = wrapped_sample_stereo(v, mu, sigma, kk)
        z2, lq2 = _wrapped_sample_jnp(v, mu, sigma, kk)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=3e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=3e-5, atol=2e-5)

    def test_diagonal_sigma(self):
        kk = F32(-0.5)
        v = 0.5 * jax.random.normal(jax.random.key(6), (B, N), F32)
        mu = stereographic.exp_map_mu0(mk_points(7, 0.3), kk)
        sigma = jnp.linspace(0.5, 1.5, N, dtype=F32)
        z1, lq1 = wrapped_sample_stereo(v, mu, sigma, kk)
        z2, lq2 = _wrapped_sample_jnp(v, mu, sigma, kk)
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=3e-5, atol=2e-5)

    def test_grads_match_jnp(self):
        kk = F32(-0.6)
        v = 0.4 * jax.random.normal(jax.random.key(8), (B, N), F32)
        mu = stereographic.exp_map_mu0(mk_points(9, 0.3), kk)

        def loss_pallas(mu, k_):
            z, lq = wrapped_sample_stereo(v, mu, F32(0.9), k_)
            return jnp.sum(z) + jnp.sum(lq)

        def loss_jnp(mu, k_):
            z, lq = _wrapped_sample_jnp(v, mu, F32(0.9), k_)
            return jnp.sum(z) + jnp.sum(lq)

        g1 = jax.grad(loss_pallas, argnums=(0, 1))(mu, kk)
        g2 = jax.grad(loss_jnp, argnums=(0, 1))(mu, kk)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestWrappedSampleBallClamp:
    def test_k_negative_boundary_stays_in_ball(self):
        """ADVICE r1 #4: the kernel forward must apply the same K<0 ball
        clamp as the jnp oracle (ops.stereographic.project), so forward and
        custom-vjp backward see the same point at the boundary."""
        kk = F32(-1.0)
        # huge tangents push exp_0 / mobius output to the ball boundary
        v = 40.0 * jax.random.normal(jax.random.key(10), (B, N), F32)
        mu = stereographic.exp_map_mu0(mk_points(11, 3.0), kk)
        sigma = F32(5.0)
        z1, lq1 = wrapped_sample_stereo(v, mu, sigma, kk)
        z2, lq2 = _wrapped_sample_jnp(v, mu, sigma, kk)
        max_norm = (1.0 - stable.eps(jnp.float32)) / jnp.sqrt(-kk)
        assert float(jnp.max(stable.safe_norm(z1))) <= float(max_norm) * (
            1 + 1e-6)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                                   rtol=1e-4, atol=1e-5)
