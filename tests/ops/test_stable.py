"""L0 stable-math tests: f64 oracle agreement, smoothness through K=0,
finite gradients at the removable singularities (SURVEY.md §4, §7 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.ops import stable


def f64(x):
    return jnp.asarray(x, dtype=jnp.float64)


def f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


class TestAcosh1p:
    def test_matches_naive_f64(self):
        # naive oracle valid only where 1+u doesn't eat u's digits
        u = f64(np.logspace(-7, 3, 50))
        np.testing.assert_allclose(
            stable.acosh_1p(u), np.arccosh(1.0 + np.asarray(u)), rtol=1e-9)

    def test_tiny_u_beats_naive(self):
        """For u ~ 1e-10 the naive f64 arccosh(1+u) is wrong by ~1e-7 rel;
        ours matches the asymptotic series sqrt(2u)(1 - u/12 + ...)."""
        u = np.logspace(-14, -8, 20)
        oracle = np.sqrt(2 * u) * (1.0 - u / 12.0 + 3.0 * u ** 2 / 160.0)
        np.testing.assert_allclose(stable.acosh_1p(f64(u)), oracle, rtol=1e-13)

    def test_f32_accuracy_near_one(self):
        """Naive f32 acosh(1+u) loses all digits at u ~ 1e-7; ours doesn't."""
        u64 = np.logspace(-7, -3, 20)
        oracle = np.arccosh(1.0 + u64)
        ours = stable.acosh_1p(f32(u64))
        np.testing.assert_allclose(ours, oracle, rtol=2e-4)

    def test_grad_finite(self):
        g = jax.grad(lambda u: stable.acosh_1p(u))(f64(1e-8))
        assert np.isfinite(g)


class TestAtanh:
    def test_matches_f64(self):
        x = f64(np.linspace(-0.999, 0.999, 41))
        np.testing.assert_allclose(stable.atanh_clamped(x), np.arctanh(x),
                                   rtol=1e-12)

    def test_clamp_no_nan(self):
        out = stable.atanh_clamped(f32([-1.0, 1.0, 2.0]))
        assert np.all(np.isfinite(out))
        g = jax.grad(lambda x: stable.atanh_clamped(x))(f32(1.0))
        assert np.isfinite(g)


class TestSincFamily:
    """Each ratio f(u) must match its closed form on both sides of 0 and be
    smooth (value + gradient) through u = 0."""

    CASES = [
        (stable.sindiv_u, lambda x: np.sin(x) / x, lambda x: np.sinh(x) / x),
        (stable.cos_u, np.cos, np.cosh),
        (stable.tandiv_u, lambda x: np.tan(x) / x, lambda x: np.tanh(x) / x),
        (stable.arctandiv_u, lambda x: np.arctan(x) / x,
         lambda x: np.arctanh(x) / x),
        (stable.arcsindiv_u, lambda x: np.arcsin(x) / x,
         lambda x: np.arcsinh(x) / x),
    ]

    @pytest.mark.parametrize("fn,pos,neg", CASES)
    def test_matches_closed_form(self, fn, pos, neg):
        # positive side (stay below the tan pole / asin domain edge)
        u = f64(np.linspace(0.02, 0.9, 30))
        np.testing.assert_allclose(fn(u), pos(np.sqrt(np.asarray(u))),
                                   rtol=1e-10)
        # negative side
        if neg is np.cosh or "tanh" in getattr(neg, "__name__", ""):
            lo = -25.0
        else:
            lo = -0.9 if fn is stable.arctandiv_u else -25.0
        un = f64(np.linspace(lo, -0.02, 30))
        np.testing.assert_allclose(fn(un), neg(np.sqrt(-np.asarray(un))),
                                   rtol=1e-10)

    @pytest.mark.parametrize("fn,pos,neg", CASES)
    def test_series_window_continuity(self, fn, pos, neg):
        """Series and closed form agree at the window edges."""
        for edge in (0.009, 0.011, -0.009, -0.011):
            u = f64(edge)
            ref = (pos if edge > 0 else neg)(np.sqrt(abs(edge)))
            np.testing.assert_allclose(fn(u), ref, rtol=1e-9)

    @pytest.mark.parametrize("fn,pos,neg", CASES)
    def test_grad_smooth_through_zero(self, fn, pos, neg):
        g = jax.grad(lambda u: fn(u).sum())
        g0 = g(f64(0.0))
        assert np.isfinite(g0)
        # gradient continuous across the window edge
        gl, gr = g(f64(0.0099)), g(f64(0.0101))
        np.testing.assert_allclose(gl, gr, rtol=1e-3)
        gl, gr = g(f64(-0.0099)), g(f64(-0.0101))
        np.testing.assert_allclose(gl, gr, rtol=1e-3)


class TestLogSindiv:
    def test_matches_f64_both_signs(self):
        u = f64(np.linspace(0.02, 8.0, 40))
        x = np.sqrt(np.asarray(u))
        np.testing.assert_allclose(stable.log_sindiv_u(u),
                                   np.log(np.sin(x) / x), rtol=1e-9, atol=1e-12)
        un = f64(np.linspace(-40.0, -0.02, 40))
        xn = np.sqrt(-np.asarray(un))
        np.testing.assert_allclose(stable.log_sindiv_u(un),
                                   np.log(np.sinh(xn) / xn), rtol=1e-9)

    def test_large_hyperbolic_radius_no_overflow_f32(self):
        """log(sinh(x)/x) for x=80 overflows naive f32 sinh; ours is exact."""
        u = f32(-6400.0)  # x = 80
        out = stable.log_sindiv_u(u)
        oracle = 80.0 + np.log1p(-np.exp(-160.0)) - np.log(160.0)
        np.testing.assert_allclose(out, oracle, rtol=1e-6)

    def test_zero(self):
        np.testing.assert_allclose(stable.log_sindiv_u(f64(0.0)), 0.0,
                                   atol=1e-15)


class TestCurvatureWrappers:
    def test_tan_k_signs(self):
        r = f64(0.7)
        np.testing.assert_allclose(stable.tan_k(r, f64(1.0)), np.tan(0.7),
                                   rtol=1e-12)
        np.testing.assert_allclose(stable.tan_k(r, f64(-1.0)), np.tanh(0.7),
                                   rtol=1e-12)
        np.testing.assert_allclose(stable.tan_k(r, f64(0.0)), 0.7, rtol=1e-12)

    def test_arctan_k_inverts_tan_k(self):
        for k in (-2.0, -1e-3, 0.0, 1e-3, 1.5):
            r = f64(0.5)
            y = stable.tan_k(r, f64(k))
            np.testing.assert_allclose(stable.arctan_k(y, f64(k)), r,
                                       rtol=1e-10)

    def test_arcsin_k_inverts_sin_k(self):
        for k in (-2.0, -1e-4, 0.0, 1e-4, 1.5):
            r = f64(0.4)
            y = stable.sin_k(r, f64(k))
            np.testing.assert_allclose(stable.arcsin_k(y, f64(k)), r,
                                       rtol=1e-10)

    def test_grad_wrt_k_through_zero(self):
        """d tan_k / dK exists and is continuous at K = 0 (universal manifold
        requirement, SURVEY.md §3.5)."""
        r = f64(0.8)
        g = jax.grad(lambda k: stable.tan_k(r, k))
        g0 = g(f64(0.0))
        # analytic: d/dK [r + K r^3/3 + ...] at 0 = r^3/3
        np.testing.assert_allclose(g0, 0.8 ** 3 / 3.0, rtol=1e-8)
        np.testing.assert_allclose(g(f64(1e-5)), g(f64(-1e-5)), rtol=1e-3)

    def test_f32_grad_finite_everywhere(self):
        ks = f32(np.linspace(-5, 2, 29))
        g = jax.vmap(jax.grad(lambda k: stable.tan_k(f32(0.3), k)))(ks)
        assert np.all(np.isfinite(g))


class TestSafeNorm:
    def test_value(self):
        v = f64([[3.0, 4.0]])
        np.testing.assert_allclose(stable.safe_norm(v), [5.0], rtol=1e-12)

    def test_grad_at_zero_finite(self):
        g = jax.grad(lambda v: stable.safe_norm(v).sum())(f32(np.zeros((1, 3))))
        assert np.all(np.isfinite(g))
