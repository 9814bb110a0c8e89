"""Fused decoder+Bernoulli-LL kernel vs the jnp oracle (interpret mode on
CPU — same kernel code the TPU compiles; SURVEY.md §4 implication (c))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.kernels.decoder_kernels import fused_decode_bce
from mvae_tpu.models import vae
from mvae_tpu.components import parse_components


def _oracle(z, x, w1, b1, w2, b2):
    h = jax.nn.relu(z @ w1 + b1)
    logits = h @ w2 + b2
    t = x[None] * logits - jax.nn.softplus(logits)
    return jnp.sum(t, axis=-1)


def _setup(S=4, B=96, Z=6, H=64, D=200, seed=0):
    ks = jax.random.split(jax.random.key(seed), 6)
    w1 = 0.4 * jax.random.normal(ks[0], (Z, H), jnp.float32)
    b1 = 0.1 * jax.random.normal(ks[1], (H,), jnp.float32)
    w2 = 0.15 * jax.random.normal(ks[2], (H, D), jnp.float32)
    b2 = 0.1 * jax.random.normal(ks[3], (D,), jnp.float32)
    z = jax.random.normal(ks[4], (S, B, Z), jnp.float32)
    x = (jax.random.uniform(ks[5], (B, D)) < 0.4).astype(jnp.float32)
    return z, x, w1, b1, w2, b2


class TestFusedDecodeBce:
    def test_matches_oracle(self):
        z, x, w1, b1, w2, b2 = _setup()
        ours = fused_decode_bce(z, x, w1, b1, w2, b2)
        ref = _oracle(z, x, w1, b1, w2, b2)
        assert ours.shape == ref.shape
        # 3-pass hi/lo GEMMs: ~1e-3 nats absolute on a few-hundred-nat row
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=5e-3, rtol=1e-5)

    def test_unaligned_batch_and_samples(self):
        # B not a multiple of the tile, S not a multiple of 8
        z, x, w1, b1, w2, b2 = _setup(S=5, B=77)
        ours = fused_decode_bce(z, x, w1, b1, w2, b2)
        ref = _oracle(z, x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=5e-3, rtol=1e-5)

    def test_many_samples_x_reuse(self):
        # S > 8 exercises the x-block reuse across the sample grid axis
        z, x, w1, b1, w2, b2 = _setup(S=19, B=32, D=96)
        ours = fused_decode_bce(z, x, w1, b1, w2, b2)
        ref = _oracle(z, x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=5e-3, rtol=1e-5)


class TestLogLikelihoodFusedPath:
    def test_matches_jnp_path(self, monkeypatch):
        """log_likelihood through the fused kernel == the jnp path (same
        PRNG draws; only the decode+BCE differs, within GEMM-split noise)."""
        cfg = vae.VAEConfig(components=parse_components("h2,s2,e2"),
                            data_shape=(40,), h_dim=48)
        params = vae.init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (13, 40)) < 0.4).astype(
            jnp.float32)
        key = jax.random.key(2)
        # the fused path groups samples into the largest divisor <= 128
        # (here: all 8) — give the reference run the same chunking so the
        # PRNG key tree (and therefore every latent draw) is identical
        monkeypatch.setenv("MVAE_FUSED_DECODER", "0")
        ll_ref = vae.log_likelihood(key, cfg, params, x, n_samples=8,
                                    chunk_size=8)
        monkeypatch.setenv("MVAE_FUSED_DECODER", "1")
        assert vae._fused_decoder_eligible(cfg, params)
        ll_fused = vae.log_likelihood(key, cfg, params, x, n_samples=8,
                                      chunk_size=4)
        np.testing.assert_allclose(np.asarray(ll_fused), np.asarray(ll_ref),
                                   atol=5e-3, rtol=1e-5)

    def test_reparam_chunk_kernel_matches_oracle(self, monkeypatch):
        """_reparam_chunk_t routes stereographic wrapped components through
        the fused Pallas reparam kernel; its slice of (zt, lq+lp) must match
        the jnp oracle recomputed with the same per-component eps fold."""
        from mvae_tpu.kernels.manifold_kernels import _wrapped_reparam_jnp
        monkeypatch.setenv("MVAE_FUSED_REPARAM", "1")
        cfg = vae.VAEConfig(components=parse_components("d4,e2"),
                            data_shape=(40,), h_dim=48)
        params = vae.init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (17, 40)) < 0.4).astype(
            jnp.float32)
        feats = vae.encode(cfg, params, x)
        ck = jax.random.key(3)
        assert vae._fused_reparam_eligible(cfg.components[0],
                                           params["components"][0])
        zt, lq, lp = vae._reparam_chunk_t(ck, cfg, params, feats, 4)
        assert zt.shape == (4, 6, 17) and lq.shape == (4, 17)
        comp, cp = cfg.components[0], params["components"][0]
        raws = vae._fused_head_raw(cfg, params, feats)
        mu, scale, k = comp.posterior_params_from_raw(cp, raws[0])
        eps = jax.random.normal(jax.random.fold_in(ck, 0), (4, 4, 17),
                                jnp.float32)
        zt0, lq0, lp0 = _wrapped_reparam_jnp(
            eps, mu.T, jnp.broadcast_to(scale, mu.shape).T, k,
            wraps=comp.wraps)
        np.testing.assert_allclose(np.asarray(zt[:, :4]),
                                   np.asarray(jnp.moveaxis(zt0, 0, 1)),
                                   rtol=3e-5, atol=1e-6)
        assert np.all(np.isfinite(np.asarray(lq)))
        assert np.all(np.isfinite(np.asarray(lp)))

    def test_log_likelihood_fused_reparam_statistical(self, monkeypatch):
        """End-to-end: log_likelihood with the fused reparam kernel ON is
        an IWAE estimate of the same quantity as the jnp path (different
        draws, same distribution): means must agree within MC noise."""
        cfg = vae.VAEConfig(components=parse_components("d6"),
                            data_shape=(40,), h_dim=48)
        params = vae.init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (32, 40)) < 0.4).astype(
            jnp.float32)
        key = jax.random.key(2)
        monkeypatch.setenv("MVAE_FUSED_DECODER", "1")
        monkeypatch.setenv("MVAE_FUSED_REPARAM", "0")
        ll_ref = vae.log_likelihood(key, cfg, params, x, n_samples=128,
                                    chunk_size=64)
        monkeypatch.setenv("MVAE_FUSED_REPARAM", "1")
        ll_fused = vae.log_likelihood(key, cfg, params, x, n_samples=128,
                                      chunk_size=64)
        # seed-pinned; IWAE-128 mean over 32 examples has ~0.05-nat std
        assert abs(float(jnp.mean(ll_fused)) - float(jnp.mean(ll_ref))) < 0.3

    def test_conv_arch_not_eligible(self):
        cfg = vae.VAEConfig(components=parse_components("e2"),
                            data_shape=(8, 8, 1), arch="conv", h_dim=32)
        params = vae.init_params(jax.random.key(0), cfg)
        assert not vae._fused_decoder_eligible(cfg, params)
