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

    def test_large_nu_debye_branch(self):
        """ADVICE r4: the plain Hankel expansion diverges near the x=40
        switch for large nu (+1.44 nats at nu=15.5, x=41); the Debye
        uniform asymptotic must hold to ~1e-6 across the fused-tail's
        whole order range (vMF dims up to 32 -> nu up to 16.5, including
        the ratio's nu+1)."""
        x = jnp.asarray(np.logspace(-2, 3, 80), dtype=jnp.float64)
        for nu in (8.5, 10.0, 12.5, 15.5, 16.5):
            oracle = np.log(sps.ive(nu, np.asarray(x)))
            ours = special.log_ive(nu, x)
            np.testing.assert_allclose(ours, oracle, rtol=3e-6, atol=1e-7,
                                       err_msg=f"nu={nu}")
        # the exact points the advisor measured biased
        for nu, xv in ((15.5, 41.0), (15.5, 45.0), (15.5, 60.0),
                       (16.5, 41.0), (12.5, 42.0)):
            np.testing.assert_allclose(
                special.log_ive(nu, jnp.float64(xv)),
                np.log(sps.ive(nu, xv)), rtol=1e-6,
                err_msg=f"nu={nu}, x={xv}")

    def test_f32_finite(self):
        x = jnp.asarray(np.logspace(-3, 3, 40), dtype=jnp.float32)
        for nu in (2.5, 15.5):
            out = special.log_ive(nu, x)
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
