"""utils.special vs scipy oracles (f64) and f32 sanity."""
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from mvae_tpu.utils import special


class TestLogIve:
    def test_vs_scipy_f64(self):
        x = jnp.asarray(np.logspace(-3, 2.5, 60), dtype=jnp.float64)
        for nu in (0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.5, 5.0):
            oracle = np.log(sps.ive(nu, np.asarray(x)))
            ours = special.log_ive(nu, x)
            np.testing.assert_allclose(ours, oracle, rtol=2e-6, atol=1e-7,
                                       err_msg=f"nu={nu}")

    def test_switch_point_continuity(self):
        for nu in (0.5, 2.5):
            lo = special.log_ive(nu, jnp.float64(39.9))
            hi = special.log_ive(nu, jnp.float64(40.1))
            oracle_lo = np.log(sps.ive(nu, 39.9))
            oracle_hi = np.log(sps.ive(nu, 40.1))
            np.testing.assert_allclose(lo, oracle_lo, rtol=1e-7)
            np.testing.assert_allclose(hi, oracle_hi, rtol=1e-7)

    def test_f32_finite(self):
        x = jnp.asarray(np.logspace(-3, 3, 40), dtype=jnp.float32)
        out = special.log_ive(2.5, x)
        assert np.all(np.isfinite(out))

    def test_bessel_ratio(self):
        x = jnp.asarray([0.1, 1.0, 10.0, 100.0], dtype=jnp.float64)
        for nu in (0.5, 1.5, 2.5):
            oracle = sps.ive(nu + 1, np.asarray(x)) / sps.ive(nu, np.asarray(x))
            np.testing.assert_allclose(special.bessel_ratio(nu, x), oracle,
                                       rtol=1e-6)


class TestErfcx:
    def test_vs_scipy(self):
        x = jnp.asarray(np.linspace(-8, 30, 77), dtype=jnp.float64)
        np.testing.assert_allclose(special.erfcx(x),
                                   sps.erfcx(np.asarray(x)), rtol=1e-6)

    def test_f32_no_overflow_positive(self):
        x = jnp.asarray([50.0, 500.0, 5000.0], dtype=jnp.float32)
        out = special.erfcx(x)
        oracle = sps.erfcx(np.asarray(x, np.float64))
        np.testing.assert_allclose(out, oracle, rtol=1e-5)
