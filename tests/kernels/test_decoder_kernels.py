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


class TestTrainDecodeBce:
    """TRAIN-path fused decode+BCE kernel (decoder_kernels.train_decode_bce):
    XLA-default bf16-grade GEMMs + f32 BCE epilogue, custom VJP whose
    backward is the exact GEMM jaxpr XLA autodiff emits."""

    def _setup(self, B=200, Z=8, H=96, D=160):
        # explicit f32: the test profile enables x64, where jax.random
        # defaults to f64 and the f32-ref kernel rightly rejects the write
        F = jnp.float32
        z = 0.5 * jax.random.normal(jax.random.key(1), (B, Z), F)
        x = (jax.random.uniform(jax.random.key(2), (B, D)) > 0.5).astype(F)
        w1 = 0.1 * jax.random.normal(jax.random.key(3), (Z, H), F)
        w2 = 0.1 * jax.random.normal(jax.random.key(4), (H, D), F)
        return z, x, w1, jnp.zeros(H, F), w2, jnp.zeros(D, F)

    def test_matches_twin_and_f32_grade(self):
        from mvae_tpu.kernels import decoder_kernels as dk
        z, x, w1, b1, w2, b2 = self._setup()
        ll = dk.train_decode_bce(z, x, w1, b1, w2, b2)
        ll_t, _, _ = dk._train_decode_body(z, x, w1, b1[None, :], w2,
                                           b2[None, :])
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_t),
                                   rtol=1e-6, atol=1e-5)
        # against the true-f32 path: bf16-single-pass GEMM grade (the same
        # contract the jnp TRAINING path runs under XLA's default dot)
        h = jnp.maximum(z @ w1 + b1, 0.0)
        logits = h @ w2 + b2
        ll_f32 = jnp.sum(x * logits - (jnp.maximum(logits, 0.0)
                                       + jnp.log1p(jnp.exp(-jnp.abs(logits)))),
                         axis=1)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_f32),
                                   rtol=1e-3, atol=0.05)

    def test_custom_bwd_matches_twin_autodiff(self):
        from mvae_tpu.kernels import decoder_kernels as dk
        z, x, w1, b1, w2, b2 = self._setup()

        def loss_k(z, w1, b1, w2, b2):
            return jnp.mean(dk.train_decode_bce(z, x, w1, b1, w2, b2))

        def loss_t(z, w1, b1, w2, b2):
            ll, _, _ = dk._train_decode_body(z, x, w1, b1[None, :], w2,
                                             b2[None, :])
            return jnp.mean(ll)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(z, w1, b1, w2, b2)
        gt = jax.grad(loss_t, argnums=(0, 1, 2, 3, 4))(z, w1, b1, w2, b2)
        for a, b in zip(gk, gt):
            # bf16-operand dots in both paths; diffs are bf16 rounding
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)

    def test_unpadded_batch_and_vmap(self):
        from mvae_tpu.kernels import decoder_kernels as dk
        z, x, w1, b1, w2, b2 = self._setup(B=77)
        ll = dk.train_decode_bce(z, x, w1, b1, w2, b2)
        assert ll.shape == (77,)
        llv = jax.vmap(lambda zz: dk.train_decode_bce(zz, x, w1, b1, w2,
                                                      b2))(
            jnp.stack([z, z + 0.01]))
        np.testing.assert_allclose(np.asarray(llv[0]), np.asarray(ll),
                                   rtol=1e-6, atol=1e-6)

    def test_loss_fn_routing(self, monkeypatch):
        """End-to-end loss_fn: fused train decoder vs jnp decode — values
        and grads at bf16-GEMM tolerance; IWAE fallback keeps it OFF."""
        from mvae_tpu.components import parse_components
        from mvae_tpu.models import VAEConfig, init_params, loss_fn, vae
        comps = parse_components("e2")
        cfg = VAEConfig(components=comps, data_shape=(64,), h_dim=32)
        params = init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (96, 64)) > 0.5).astype(
            jnp.float32)
        key = jax.random.key(2)
        monkeypatch.setenv("MVAE_FUSED_TRAIN_DECODER", "1")
        assert vae._fused_train_decoder_eligible(cfg, params)
        (l1, _), g1 = jax.value_and_grad(
            lambda p: loss_fn(key, cfg, p, x), has_aux=True)(params)
        monkeypatch.setenv("MVAE_FUSED_TRAIN_DECODER", "0")
        (l2, _), g2 = jax.value_and_grad(
            lambda p: loss_fn(key, cfg, p, x), has_aux=True)(params)
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-3)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            # bf16-GEMM vs CPU-f32 jnp grade: bound the diff by the leaf's
            # own scale rather than elementwise (tiny grads have large
            # relative bf16 rounding)
            scale = max(float(np.max(np.abs(np.asarray(b)))), 1e-3)
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) \
                <= 0.05 * scale
