"""L4 tests: shapes through encode/decode, ELBO sanity, IWAE estimator
correctness on a tractable case, jit-vs-eager equivalence (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.models import (VAEConfig, elbo, forward, generate, init_params,
                             log_likelihood, loss_fn, reconstruct)

F32 = jnp.float32


def make_cfg(spec="h2,s2,e2", arch="mlp", data_shape=(20,), h_dim=32):
    return VAEConfig(components=parse_components(spec),
                     data_shape=data_shape, arch=arch, h_dim=h_dim)


def make_batch(key, cfg, n=8):
    return (jax.random.uniform(key, (n,) + cfg.data_shape) > 0.5).astype(F32)


class TestShapes:
    @pytest.mark.parametrize("spec", ["e4", "h2,s2,e2", "u3",
                                      "d2:riemannian,s2"])
    def test_mlp_forward(self, spec):
        cfg = make_cfg(spec)
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg)
        fwd = forward(jax.random.key(2), cfg, params, x)
        assert fwd.z.shape == (8, cfg.z_dim)
        assert fwd.log_px_z.shape == (8,)
        assert fwd.kl_per_comp.shape == (8, len(cfg.components))
        for a in (fwd.z, fwd.log_px_z, fwd.log_q, fwd.log_p):
            assert np.all(np.isfinite(np.asarray(a)))

    def test_conv_forward(self):
        cfg = make_cfg("u4", arch="conv", data_shape=(8, 8, 3))
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg, n=4)
        fwd = forward(jax.random.key(2), cfg, params, x)
        assert fwd.z.shape == (4, 4)
        assert np.all(np.isfinite(np.asarray(fwd.log_px_z)))
        recon = reconstruct(jax.random.key(3), cfg, params, x)
        assert recon.shape == x.shape

    def test_generate(self):
        cfg = make_cfg("h2,e2")
        params = init_params(jax.random.key(0), cfg)
        imgs = generate(jax.random.key(1), cfg, params, 5)
        assert imgs.shape == (5,) + cfg.data_shape
        assert np.all((np.asarray(imgs) >= 0) & (np.asarray(imgs) <= 1))


class TestElbo:
    def test_elbo_stats(self):
        cfg = make_cfg()
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg)
        value, stats = elbo(jax.random.key(2), cfg, params, x)
        assert value.shape == (8,)
        assert stats["kl_per_comp"].shape == (len(cfg.components),)
        # ELBO <= 0 for Bernoulli data... (log p(x|z) <= 0, KL >= 0 in exp)
        assert float(stats["elbo"]) < 0.0

    def test_jit_matches_eager(self):
        cfg = make_cfg("h2,e2")
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg)
        loss_e, _ = loss_fn(jax.random.key(2), cfg, params, x)
        loss_j, _ = jax.jit(loss_fn, static_argnums=(1,))(
            jax.random.key(2), cfg, params, x)
        np.testing.assert_allclose(float(loss_e), float(loss_j), rtol=2e-5)

    @pytest.mark.slow
    def test_grads_finite_all_geometries(self):
        cfg = make_cfg("e2,h2,d2,s2,p2,u2,s2:wrapped,d2:riemannian")
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg)

        def scalar_loss(p):
            l, _ = loss_fn(jax.random.key(2), cfg, p, x)
            return l

        g = jax.grad(scalar_loss)(params)
        flat, _ = jax.tree.flatten(g)
        for leaf in flat:
            assert np.all(np.isfinite(np.asarray(leaf)))


class TestIwae:
    def test_iwae_exceeds_elbo(self):
        """IWAE-n is a tighter bound than the 1-sample ELBO in expectation."""
        cfg = make_cfg("e3", h_dim=16, data_shape=(12,))
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg, n=16)
        elbo_fn = jax.jit(lambda k, p, xx: elbo(k, cfg, p, xx)[0])
        ll_fn = jax.jit(lambda k, p, xx: log_likelihood(
            k, cfg, p, xx, n_samples=100, chunk_size=20))
        elbos, lls = [], []
        for i in range(10):
            elbos.append(np.mean(np.asarray(
                elbo_fn(jax.random.key(10 + i), params, x))))
            lls.append(np.mean(np.asarray(
                ll_fn(jax.random.key(100 + i), params, x))))
        assert np.mean(lls) >= np.mean(elbos) - 0.05

    def test_iwae_converges_to_true_ll(self):
        """For a LINEAR-decoder Gaussian-latent model the true log p(x) is
        intractable, so instead check IWAE consistency: doubling n must not
        decrease the estimate (monotonicity in expectation) and estimates
        must stabilize."""
        cfg = make_cfg("e2", h_dim=8, data_shape=(6,))
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg, n=4)
        est = {}
        for n in (10, 100, 1000):
            ll_fn = jax.jit(lambda k, n=n: log_likelihood(
                k, cfg, params, x, n_samples=n, chunk_size=10))
            vals = [np.mean(np.asarray(ll_fn(jax.random.key(7 * i + n))))
                    for i in range(5)]
            est[n] = np.mean(vals)
        assert est[100] >= est[10] - 0.02
        assert est[1000] >= est[100] - 0.02
        assert abs(est[1000] - est[100]) < 0.1

    def test_iwae_jit(self):
        cfg = make_cfg("h2,s2,e2", h_dim=16, data_shape=(12,))
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg, n=4)
        f = jax.jit(lambda k, p, xx: log_likelihood(k, cfg, p, xx,
                                                    n_samples=40,
                                                    chunk_size=20))
        out = f(jax.random.key(2), params, x)
        assert out.shape == (4,)
        assert np.all(np.isfinite(np.asarray(out)))


class TestBf16:
    @pytest.mark.slow
    def test_bf16_forward_and_iwae_precision(self):
        """bf16 params/activations with f32 log-prob accumulation: the IWAE
        estimate must be close to the f32 one, not quantized to whole
        numbers (SURVEY.md §5 numerical-precision row)."""
        cfg = make_cfg("h2,s2,e2", h_dim=32, data_shape=(20,))
        p32 = init_params(jax.random.key(0), cfg, dtype=jnp.float32)
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
        x = make_batch(jax.random.key(1), cfg, n=16)
        ll32 = log_likelihood(jax.random.key(2), cfg, p32, x,
                              n_samples=100, chunk_size=20)
        ll16 = log_likelihood(jax.random.key(2), cfg, p16,
                              x.astype(jnp.bfloat16), n_samples=100,
                              chunk_size=20)
        assert ll16.dtype == jnp.float32
        # bf16 weights genuinely shift the model a little; the accumulation
        # bug this guards against was off by whole integers
        np.testing.assert_allclose(np.mean(np.asarray(ll16)),
                                   np.mean(np.asarray(ll32)), rtol=0.05)
        assert not np.allclose(np.asarray(ll16),
                               np.round(np.asarray(ll16)))

    @pytest.mark.slow
    def test_bf16_grads_finite(self):
        cfg = make_cfg("e2,h2,s2,u2", h_dim=16)
        params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        x = make_batch(jax.random.key(1), cfg).astype(jnp.bfloat16)
        g = jax.grad(lambda p: loss_fn(jax.random.key(2), cfg, p, x)[0])(
            params)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf, np.float32)))

    def test_bf16_conv_grads_finite(self):
        """--dtype bfloat16 with arch=conv: conv_transpose's VJP rejects
        the (f32 cotangent, bf16 kernel) pair an explicit f32
        preferred_element_type produces — regression for the round-4 fix
        in nets._conv_pet (the forward worked; only grads broke)."""
        cfg = VAEConfig(components=parse_components("u2"),
                        data_shape=(8, 8, 3), arch="conv", h_dim=16)
        params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        x = (jax.random.uniform(jax.random.key(1), (4, 8, 8, 3))
             > 0.5).astype(jnp.bfloat16)
        g = jax.grad(lambda p: loss_fn(jax.random.key(2), cfg, p, x)[0])(
            params)
        for leaf in jax.tree.leaves(g):
            assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


class TestTraining:
    def test_loss_decreases_smoke(self):
        """A few SGD steps on a tiny model must reduce the loss
        (the reference's train smoke test, SURVEY.md §4)."""
        import optax
        cfg = make_cfg("h2,s2,e2", h_dim=32, data_shape=(20,))
        params = init_params(jax.random.key(0), cfg)
        x = make_batch(jax.random.key(1), cfg, n=32)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            (l, _), g = jax.value_and_grad(
                lambda p: loss_fn(key, cfg, p, x), has_aux=True)(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, l

        losses = []
        for i in range(60):
            params, opt_state, l = step(params, opt_state, jax.random.key(i))
            losses.append(float(l))
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.5


class TestBf16ConvActivations:
    def test_switch_close_to_f32_and_grads_finite(self):
        """MVAE_BF16_CONV_ACT (bench A/B, VERDICT r4 #4): bf16 activations
        between the convs with f32 master weights — loss must track the
        f32 path to bf16 rounding and grads stay finite in the master
        dtype; OFF must be bit-identical to before (default unchanged)."""
        from mvae_tpu.models import nets
        cfg = VAEConfig(components=parse_components("u2"),
                        data_shape=(8, 8, 3), arch="conv", h_dim=16)
        params = init_params(jax.random.key(0), cfg)
        x = (jax.random.uniform(jax.random.key(1), (8, 8, 8, 3))
             > 0.5).astype(F32)

        def loss(p):
            return loss_fn(jax.random.key(2), cfg, p, x)[0]

        l_f32 = float(loss(params))
        try:
            nets.set_bf16_conv_activations(True)
            (l_b, _), g = jax.value_and_grad(
                lambda p: loss_fn(jax.random.key(2), cfg, p, x),
                has_aux=True)(params)
        finally:
            nets.set_bf16_conv_activations(False)
        assert np.isfinite(float(l_b))
        # image-scale BCE at bf16 logits: expect sub-percent drift
        assert abs(float(l_b) - l_f32) / abs(l_f32) < 0.02, (l_b, l_f32)
        for leaf in jax.tree.leaves(g):
            assert leaf.dtype == jnp.float32  # masters stay f32
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(loss(params)) == l_f32  # OFF: bit-identical


class TestBf16MatmulFlag:
    def test_flag_switches_gemm_precision(self):
        from mvae_tpu.models import nets
        p = {"w": jnp.ones((4, 3), jnp.float32),
             "b": jnp.zeros(3, jnp.float32)}
        x = jnp.full((2, 4), 1.0 / 3.0, jnp.float32)
        try:
            nets.set_bf16_matmul(True)
            lo = nets._linear(p, x)
            nets.set_bf16_matmul(False)
            hi = nets._linear(p, x)
        finally:
            nets.set_bf16_matmul(False)
        assert lo.dtype == jnp.float32  # f32 accumulate/output either way
        np.testing.assert_allclose(np.asarray(hi), 4.0 / 3.0, rtol=1e-7)
        assert abs(float(lo[0, 0]) - 4.0 / 3.0) > 1e-4  # bf16-rounded operands
