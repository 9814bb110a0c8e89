"""Round-4 positive-K wrapped-normal stability regression tests.

Root cause (VERDICT r3 #1; results/r4_nan_probe_s6-wrapped.json): the
committed 100-epoch matrix killed s6:wrapped (epoch 28) and d2p2e2
(epoch 44) with a KL spiral whose engine was the f32 principal-preimage
ROUND TRIP in ``sample_and_log_prob``: its O(eps * |v|) direction noise,
amplified by 1/sigma_j^2 in dims with collapsed sigma (observed
sigma_min 2.6e-18), produced log q ~ -1e18 which the optimizer farmed as
free ELBO — driving BOTH the sigma collapse and the sigma explosion
(sigma_max 38 = 6 geodesic periods, where the truncated wrap sum
underestimates log q — the second exploit).

The fix (this file pins it):
  * ``_sample_log_prob_drawn`` — log q of the sample from the DRAWN
    direction and scalar radius wrap only (no round trip to leak);
  * ``cap_sigma_positive_k`` — posterior scale saturates smoothly at the
    injectivity radius pi R (family stays complete: sigma ~ pi R is
    already near-uniform on a compact space);
  * ``stable.log_abs_sin_soft`` — shell-mollified log-det (bounded
    cot-type gradient).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.components.component import cap_sigma_positive_k, reparametrize
from mvae_tpu.distributions import wrapped_normal
from mvae_tpu.ops import Manifold, stable

F32 = jnp.float32
F64 = jnp.float64
REPRO = Path(__file__).resolve().parents[2] / "results" / \
    "r4_nan_repro_heads.npz"


def key(i):
    return jax.random.key(i)


class TestDrawnDensityNoRoundTrip:
    def test_collapsed_sigma_logq_bounded(self):
        """The death configuration, synthetically: wrapped draw with
        sigma_j spanning 2.6e-18 .. 4.0 on S^6 (K=1). Pre-fix log q hit
        -1e18 (round-trip noise x 1/sigma^2); drawn-direction log q stays
        physically scaled and the grads are finite."""
        man = Manifold("s", 6)
        k = jnp.asarray(1.0, F32)
        sigma = jnp.asarray([4.0, 2.6e-18, 0.5, 1e-6, 2.0, 1e-3], F32)
        mu_tan = jnp.asarray([12.0, -8.0, 3.0, 0.5, -20.0, 7.0], F32)

        def logq_sum(mu_tan, sigma, k):
            mu = man.exp_map_mu0(jnp.broadcast_to(mu_tan, (256, 6)), k)
            _, logq = wrapped_normal.sample_and_log_prob(
                key(0), man, mu, sigma, k)
            return jnp.sum(logq), logq

        (_, logq), grads = jax.value_and_grad(
            logq_sum, argnums=(0, 1, 2), has_aux=True)(mu_tan, sigma, k)
        logq = np.asarray(logq)
        assert np.all(np.isfinite(logq))
        # physical scale: |log q| <= ~ n(-log sigma_min) + drawn z-scores
        assert np.abs(logq).max() < 1e4, logq
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))

    def test_matches_round_trip_at_moderate_sigma(self):
        """Away from the pathology the drawn form IS the density: f64
        agreement with the independent log_prob round trip."""
        man = Manifold("s", 3)
        k = F64(1.0)
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.4, -0.3, 0.2], F64), k), (128, 4))
        sigma = jnp.asarray([0.9, 0.4, 1.4], F64)
        z, lq = wrapped_normal.sample_and_log_prob(key(3), man, mu, sigma, k)
        lq2 = wrapped_normal.log_prob(man, z, mu, sigma, k)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lq2),
                                   rtol=1e-6, atol=1e-6)

    def test_wrapping_draws_exact_density(self):
        """sigma ~ injectivity radius: most draws wrap at least once; the
        drawn-branch sum must still equal the round-trip density (f64)."""
        man = Manifold("s", 3)
        k = F64(1.0)
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.4, -0.3, 0.2], F64), k), (512, 4))
        sigma = jnp.asarray(3.0, F64)   # ~ pi R: heavy wrapping
        z, lq = wrapped_normal.sample_and_log_prob(key(4), man, mu, sigma, k)
        lq2 = wrapped_normal.log_prob(man, z, mu, sigma, k, wraps=4)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lq2),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_bounded_at_shell(self):
        """A draw within 1e-6 of the injectivity shell: the mollified
        log-det keeps d log q / d v at the ~(n-1) pi/(2 delta) scale
        instead of the unbounded cot."""
        man = Manifold("s", 3)
        k = jnp.asarray(1.0, F32)
        v = jnp.asarray([np.pi * (1.0 - 1e-6), 0.0, 0.0], F32)
        sigma = jnp.asarray(1.0, F32)

        def lq(v):
            return jnp.sum(wrapped_normal._sample_log_prob_drawn(
                man, v[None], sigma, k, wraps=1))

        g = np.asarray(jax.grad(lq)(v))
        assert np.all(np.isfinite(g))
        bound = (man.dim - 1) * np.pi / (2 * stable.SHELL_DELTA) * 5
        assert np.abs(g).max() < bound, g


class TestSigmaCap:
    def test_cap_saturates_at_injectivity_radius(self):
        k = jnp.asarray(1.0, F32)
        cap = float(jnp.pi)
        out = cap_sigma_positive_k(jnp.asarray([50.0, 1e6], F32), k)
        assert np.all(np.asarray(out) <= cap * 1.0001)
        assert float(out[0]) > 0.95 * cap

    def test_identity_in_operating_range(self):
        """sigma <= cap/3 must pass through to <0.1% (parity with the
        uncapped reference family at trained-regime scales)."""
        k = jnp.asarray(1.0, F32)
        s = jnp.asarray([0.05, 0.3, 1.0], F32)
        out = np.asarray(cap_sigma_positive_k(s, k))
        np.testing.assert_allclose(out, np.asarray(s), rtol=1e-3)

    def test_noop_for_negative_k(self):
        k = jnp.asarray(-1.0, F32)
        s = jnp.asarray([0.5, 40.0, 3000.0], F32)
        np.testing.assert_array_equal(
            np.asarray(cap_sigma_positive_k(s, k)), np.asarray(s))

    def test_monotone_and_smooth(self):
        k = jnp.asarray(1.0, F32)
        s = jnp.linspace(0.01, 30.0, 500, dtype=F32)
        out = np.asarray(cap_sigma_positive_k(s, k))
        # non-decreasing to f32 rounding (the saturated plateau is flat
        # at f32 resolution), strictly increasing below the cap knee
        assert np.all(np.diff(out) >= -1e-6)
        knee = np.searchsorted(np.asarray(s), float(jnp.pi) / 2)
        assert np.all(np.diff(out[:knee]) > 0)
        g = np.asarray(jax.vmap(jax.grad(
            lambda x: cap_sigma_positive_k(x, k)))(s))
        assert np.all(np.isfinite(g)) and np.all(g >= 0)

    def test_applied_in_component_head(self):
        comp = parse_components("s4:wrapped")[0]
        params = comp.init_params(key(1), 16, init_k=1.0)
        raw = jnp.concatenate(
            [jnp.zeros((2, 4)), jnp.full((2, 4), 60.0)], axis=-1)
        _, scale, kv = comp.posterior_params_from_raw(params, raw)
        assert np.all(np.asarray(scale) <= float(jnp.pi) * 1.0001)

    def test_sigma_cap_false_leaves_raw_scale(self):
        """Component(sigma_cap=False) — the round-5 basin-study model
        class — leaves the posterior scale at raw softplus even far
        beyond the injectivity radius, and is excluded from the fused
        tail family (the kernel bakes the cap in)."""
        import dataclasses
        from mvae_tpu.kernels import tail_kernels
        comp = parse_components("s4:wrapped")[0]
        un = dataclasses.replace(comp, sigma_cap=False)
        params = comp.init_params(key(1), 16, init_k=1.0)
        raw = jnp.concatenate(
            [jnp.zeros((2, 4)), jnp.full((2, 4), 60.0)], axis=-1)
        _, scale_u, kv = un.posterior_params_from_raw(params, raw)
        np.testing.assert_allclose(
            np.asarray(scale_u),
            np.asarray(jax.nn.softplus(raw[..., 4:])), rtol=1e-6)
        assert np.all(np.asarray(scale_u) > float(jnp.pi))  # beyond cap
        assert tail_kernels.component_supported(comp)
        assert not tail_kernels.component_supported(un)
        # negative-curvature wrapped never caps: the switch is a no-op
        assert tail_kernels.component_supported(dataclasses.replace(
            parse_components("h4")[0], sigma_cap=False))
        # spec-parser pass-through
        assert not parse_components("s2:wrapped",
                                    sigma_cap=False)[0].sigma_cap


class TestNoKLExploit:
    def test_kl_estimator_unbiased_at_cap(self):
        """At the saturation scale (sigma = pi R, the widest reachable
        posterior) the MC KL estimate must be >= 0 in expectation — round
        3's truncated estimator went NEGATIVE here (the sigma-explosion
        farm; epoch-mean test KL -1.5 by epoch 5)."""
        man = Manifold("s", 6)
        k = F64(1.0)
        n = 8192
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.3, -0.2, 0.1, 0.4, -0.1, 0.2], F64), k), (n, 7))
        sigma = jnp.asarray(float(np.pi), F64)
        z, lq = wrapped_normal.sample_and_log_prob(key(7), man, mu, sigma, k)
        lp = wrapped_normal.log_prob_mu0(man, z, jnp.ones((), F64), k,
                                         wraps=4)
        kl = float(jnp.mean(lq - lp))
        assert kl > -0.02, kl


@pytest.mark.skipif(not REPRO.exists(), reason="reproducer artifact absent")
class TestDeathStepReproducer:
    def test_failing_heads_finite_loss_and_grads(self):
        """Replay the EXACT head state of the first non-finite train step
        (s6:wrapped, seed 11, B 256, epoch 28 step 45 — distilled by
        scripts/run_r4_nan_probe.py). Pre-fix: loss -9.6e17, NaN encoder/
        component grads. Post-fix: physically-scaled loss, finite grads."""
        d = np.load(REPRO)
        raw = jnp.asarray(d["raw"])            # (256, 12) head outputs
        kv = jnp.asarray(float(d["k"]), F32)
        comp = parse_components("s6:wrapped")[0]
        man = comp.manifold

        def neg_elbo_tail(raw, kv):
            mu_tan = raw[..., :6]
            sigma = cap_sigma_positive_k(jax.nn.softplus(raw[..., 6:]), kv)
            mu = man.exp_map_mu0(mu_tan, kv)
            z, lq = wrapped_normal.sample_and_log_prob(
                key(99), man, mu, sigma, kv)
            lp = wrapped_normal.log_prob_mu0(man, z, jnp.ones((), F32), kv)
            return jnp.mean(lq - lp)

        kl, grads = jax.value_and_grad(
            neg_elbo_tail, argnums=(0, 1))(raw, kv)
        assert np.isfinite(float(kl))
        assert abs(float(kl)) < 1e3, kl
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))


class TestFullPeriodWrapEdge:
    """A drawn radius within half an ulp of a FULL geodesic period reduces
    to rp == 0 EXACTLY in f32 (r = fl(2 pi / sqrt(K)) itself does); the
    m = 0 log-det must then take the series (removable-zero) form — the
    split log|sin rp| - log(max(rp, tiny)) form is -inf there, which turned
    one IWAE log-weight into +inf - inf = NaN and killed the d2p2e2-learnK
    r4-matrix headline (example 8535, IWAE sample 175 of 5M draws)."""

    K = np.float32(0.59581786)   # the trained p2 curvature that died

    def _edge_draws(self):
        period = np.float32(2.0 * np.pi / np.sqrt(self.K))
        radii = []
        for mult in (1.0, 2.0):   # full-period and double-wrap collisions
            r = np.float32(mult) * period
            for _ in range(3):
                r = np.nextafter(r, np.float32(0.0))
            for _ in range(7):
                radii.append(np.float32(r))
                r = np.nextafter(r, np.float32(np.inf))
        return period, radii

    def test_rp_zero_reachable(self):
        """The exact f32 period value must reduce to rp == 0 under the
        library's wrap arithmetic (else the other tests are vacuous)."""
        period, radii = self._edge_draws()
        tin = np.float32(stable.tiny(F32))
        rps = []
        for r in radii:
            rr = np.float32(np.sqrt(np.float32(r * r) + tin))
            rps.append(np.float32(
                abs(rr - period * np.float32(np.floor(rr / period + 0.5)))))
        assert min(rps) == 0.0, rps

    @pytest.mark.parametrize("kind", ["p", "u", "s"])
    def test_jnp_drawn_density_finite_at_full_period(self, kind):
        man = Manifold(kind, 2)
        _, radii = self._edge_draws()
        sigma = jnp.asarray([4.0687432, 4.0698075], F32)  # the dead head's
        v32 = jnp.asarray([[r, 0.0] for r in radii], F32)
        lq32 = wrapped_normal._sample_log_prob_drawn(
            man, v32, sigma, jnp.asarray(self.K, F32), wraps=1)
        assert np.all(np.isfinite(np.asarray(lq32))), np.asarray(lq32)
        # f64 oracle: its period differs from the f32 one, so no exact
        # rp == 0 collision — a finite independent value to match
        lq64 = wrapped_normal._sample_log_prob_drawn(
            man, v32.astype(F64), sigma.astype(F64),
            jnp.asarray(self.K, F64), wraps=1)
        np.testing.assert_allclose(np.asarray(lq32), np.asarray(lq64),
                                   rtol=1e-4, atol=5e-3)

    def test_kernel_reparam_finite_at_full_period(self, monkeypatch):
        monkeypatch.setenv("MVAE_FUSED_REPARAM", "1")
        from mvae_tpu.kernels.manifold_kernels import (
            _wrapped_reparam_jnp, wrapped_reparam_stereo_t)
        _, radii = self._edge_draws()
        n, S = 2, len(radii)
        b = 4
        kk = jnp.asarray(self.K, F32)
        # one edge draw per sample slot in column 0; benign noise elsewhere
        eps = 0.3 * jax.random.normal(key(3), (n, S, b), F32)
        eps = eps.at[0, :, 0].set(jnp.asarray(radii, F32))
        eps = eps.at[1, :, 0].set(0.0)
        mu_t = 0.2 * jax.random.normal(key(4), (n, b), F32)
        sig_t = jnp.ones((n, b), F32)   # v = eps exactly in column 0
        z1, lq1, lp1 = wrapped_reparam_stereo_t(eps, mu_t, sig_t, kk,
                                                wraps=1, sign=1)
        for a in (z1, lq1, lp1):
            assert np.all(np.isfinite(np.asarray(a))), np.asarray(a)
        _, lq2, lp2 = _wrapped_reparam_jnp(eps, mu_t, sig_t, kk, wraps=1)
        np.testing.assert_allclose(np.asarray(lq1), np.asarray(lq2),
                                   rtol=1e-4, atol=3e-3)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                                   rtol=1e-4, atol=3e-3)
