"""scalar_parametrization parity + universal curvature crossing zero under
actual gradient training (BASELINE config #5 mechanism, SURVEY.md §3.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mvae_tpu.components import parse_components, reparametrize
from mvae_tpu.ops import Manifold, universal


class TestScalarSigma:
    def test_head_widths(self):
        (iso,) = parse_components("h3", scalar_sigma=True)
        (diag,) = parse_components("h3")
        assert iso.n_scale == 1 and diag.n_scale == 3
        assert iso.head_width == 4 and diag.head_width == 6

    def test_isotropic_scale_broadcasts(self):
        (comp,) = parse_components("h3", scalar_sigma=True)
        params = comp.init_params(jax.random.key(0), 8, dtype=jnp.float64)
        feats = 0.1 * jax.random.normal(jax.random.key(1), (16, 8),
                                        jnp.float64)
        rep = reparametrize(jax.random.key(2), comp, params, feats)
        assert rep.z.shape == (16, 4)
        assert np.all(np.isfinite(np.asarray(rep.kl)))
        mu, scale, k = comp.posterior_params(params, feats)
        assert scale.shape == (16, 1)


class TestCurvatureCrossesZero:
    def test_gradient_training_crosses_zero(self):
        """Optimize the universal curvature so model distances match flat
        target distances scaled to favor NEGATIVE curvature, starting from
        POSITIVE K: gradient descent must drive K smoothly through 0 with
        finite gradients at every step (the reference's CIFAR u6 behavior)."""
        key = jax.random.key(0)
        x = 0.3 * jax.random.normal(key, (64, 4), jnp.float32)
        y = 0.3 * jax.random.normal(jax.random.key(1), (64, 4), jnp.float32)
        # target distances: universal distances at K = -0.8 (hyperbolic)
        target = universal.distance(x, y, jnp.float32(-0.8))

        def loss(k):
            d = universal.distance(x, y, k)
            return jnp.mean((d - target) ** 2)

        k = jnp.float32(0.9)  # start spherical
        opt = optax.adam(5e-2)
        state = opt.init(k)
        crossed = False
        prev = float(k)
        grad_fn = jax.jit(jax.grad(loss))  # compile once, 400 cheap steps
        for i in range(400):
            g = grad_fn(k)
            assert np.isfinite(float(g)), (i, float(k))
            upd, state = opt.update(g, state)
            k = optax.apply_updates(k, upd)
            if prev > 0 >= float(k):
                crossed = True
            prev = float(k)
        assert crossed, f"K never crossed zero (final K={float(k):.3f})"
        assert float(k) < -0.4  # converging toward the true -0.8
        assert float(loss(k)) < 1e-3


class TestUniversalComponentTraining:
    def test_u_component_curvature_learns_both_signs(self):
        """A u-latent's curvature leaf receives usable gradients at positive,
        ~zero, and negative K through the full reparametrize path."""
        (comp,) = parse_components("u3", fixed_curvature=False)
        params = comp.init_params(jax.random.key(0), 8, dtype=jnp.float32)
        feats = 0.2 * jax.random.normal(jax.random.key(1), (32, 8),
                                        jnp.float32)

        def kl_loss(p):
            rep = reparametrize(jax.random.key(2), comp, p, feats)
            return jnp.mean(rep.kl)

        grad_fn = jax.jit(jax.grad(kl_loss))  # one compile serves all k0
        for k0 in (1.0, 1e-4, 0.0, -1e-4, -1.0):
            p = dict(params)
            p["c_param"] = jnp.float32(k0)
            g = grad_fn(p)
            assert np.isfinite(float(g["c_param"])), k0
