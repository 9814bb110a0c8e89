"""L2 distribution tests (SURVEY.md §4): on-manifold samples, sample/log_prob
consistency, MC normalization, analytic-vs-MC KL, moment checks against
closed forms, and reparameterization-gradient correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special as sps

from mvae_tpu.distributions import (hyperspherical_uniform, normal,
                                    riemannian_normal, von_mises_fisher,
                                    wrapped_normal)
from mvae_tpu.ops import Manifold, lorentz, sphere

F64 = jnp.float64


def key(i):
    return jax.random.key(i)


class TestNormal:
    def test_log_prob_matches_scipy(self):
        x = jnp.asarray([[0.3, -1.2, 0.7]], F64)
        mu = jnp.asarray([[0.1, 0.0, -0.5]], F64)
        sigma = jnp.asarray([[0.5, 1.5, 2.0]], F64)
        from scipy.stats import norm
        oracle = norm.logpdf(np.asarray(x), np.asarray(mu),
                             np.asarray(sigma)).sum(-1)
        np.testing.assert_allclose(normal.log_prob(x, mu, sigma), oracle,
                                   rtol=1e-12)

    def test_kl_analytic_vs_mc(self):
        mu = jnp.asarray([0.4, -0.3], F64)
        sigma = jnp.asarray([0.7, 1.3], F64)
        x = normal.sample(key(0), jnp.broadcast_to(mu, (200_000, 2)), sigma)
        mc = jnp.mean(normal.log_prob(x, mu, sigma)
                      - normal.log_prob(x, jnp.zeros(2, F64),
                                        jnp.ones(2, F64)))
        np.testing.assert_allclose(normal.kl_std(mu, sigma), mc, rtol=2e-2)


@pytest.mark.parametrize("kind,k0", [("e", 0.0), ("h", -1.0), ("h", -0.4),
                                     ("d", -1.0), ("s", 1.0), ("s", 0.5),
                                     ("p", 1.0), ("u", -0.7), ("u", 0.7)])
class TestWrappedNormal:
    DIM = 3

    def _mu(self, man, k):
        mu_v = jnp.asarray([0.3, -0.2, 0.4], F64)
        return man.exp_map_mu0(mu_v, k)

    def test_sample_logprob_consistency(self, kind, k0):
        man = Manifold(kind, self.DIM)
        k = F64(k0)
        mu = jnp.broadcast_to(self._mu(man, k), (64, man.ambient_dim))
        sigma = jnp.asarray(0.6, F64)
        z, logq = wrapped_normal.sample_and_log_prob(key(1), man, mu, sigma, k)
        logq2 = wrapped_normal.log_prob(man, z, mu, sigma, k)
        np.testing.assert_allclose(logq, logq2, rtol=1e-7, atol=1e-8)

    def test_normalization_by_importance_sampling(self, kind, k0):
        """E_{z~q1}[q2(z)/q1(z)] = 1 for two wrapped normals — catches any
        log-det error that a self-consistency test can't see."""
        man = Manifold(kind, self.DIM)
        k = F64(k0)
        n = 40_000
        mu1 = jnp.broadcast_to(self._mu(man, k), (n, man.ambient_dim))
        mu2 = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([-0.2, 0.1, 0.0], F64), k), (n, man.ambient_dim))
        z, logq1 = wrapped_normal.sample_and_log_prob(key(2), man, mu1,
                                                      jnp.asarray(0.8, F64), k)
        logq2 = wrapped_normal.log_prob(man, z, mu2, jnp.asarray(1.1, F64), k)
        est = jax.scipy.special.logsumexp(logq2 - logq1) - np.log(n)
        np.testing.assert_allclose(np.exp(est), 1.0, rtol=0.08)

    def test_grads_finite_f32(self, kind, k0):
        man = Manifold(kind, self.DIM)

        def loss(mu_v, log_sigma, kk):
            mu = man.exp_map_mu0(mu_v, kk)
            z, logq = wrapped_normal.sample_and_log_prob(
                key(3), man, mu, jnp.exp(log_sigma), kk)
            return jnp.sum(logq) + jnp.sum(z * z)

        g = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray([0.3, -0.2, 0.4], jnp.float32),
            jnp.asarray(-0.5, jnp.float32), jnp.float32(k0))
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi))), (kind, k0)


class TestWrappedNormalNormalizationStrict:
    """One seed-pinned TIGHT normalization check (round-2 ADVICE #5: the
    parameterized sweep was loosened to rtol=0.08 / 40k samples for suite
    time; this single spherical case keeps a high-sensitivity regression
    guard on the log-det at fast-profile cost)."""

    def test_sphere_tight(self):
        man = Manifold("s", 3)
        k = F64(1.0)
        n = 160_000
        mu1 = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.3, -0.2, 0.4], F64), k), (n, man.ambient_dim))
        mu2 = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([-0.2, 0.1, 0.0], F64), k), (n, man.ambient_dim))
        z, logq1 = wrapped_normal.sample_and_log_prob(
            key(42), man, mu1, jnp.asarray(0.8, F64), k)
        logq2 = wrapped_normal.log_prob(man, z, mu2, jnp.asarray(1.1, F64), k)
        est = jax.scipy.special.logsumexp(logq2 - logq1) - np.log(n)
        # seed-pinned: at key(42) the estimate is ~1.000 +/- MC noise; the
        # old pre-loosening bar was rtol=0.05 at 100k draws
        np.testing.assert_allclose(np.exp(est), 1.0, rtol=0.04)


class TestWrappedNormalCrossModel:
    def test_h_equals_d_under_isometry(self):
        """Lorentz and Poincare wrapped normals are the same measure: log_prob
        at corresponding points must agree (the reference paper's H^n ~ D^n
        table-row identity)."""
        k = F64(-0.8)
        man_h = Manifold("h", 3)
        man_d = Manifold("d", 3)
        mu_v = jnp.asarray([0.2, -0.4, 0.1], F64)
        mu_h = man_h.exp_map_mu0(mu_v, k)
        mu_d = man_d.exp_map_mu0(mu_v, k)
        z_h, logq_h = wrapped_normal.sample_and_log_prob(
            key(4), man_h, jnp.broadcast_to(mu_h, (32, 4)),
            jnp.asarray(0.7, F64), k)
        z_d = lorentz.lorentz_to_poincare(z_h, k)
        logq_d = wrapped_normal.log_prob(man_d, z_d, mu_d,
                                         jnp.asarray(0.7, F64), k)
        np.testing.assert_allclose(logq_h, logq_d, rtol=1e-8)

    def test_k0_equals_euclidean(self):
        """Universal wrapped normal at K=0 must equal the Euclidean normal
        in the orthonormal frame."""
        man_u = Manifold("u", 3)
        k = F64(0.0)
        mu_v = jnp.asarray([0.2, -0.1, 0.3], F64)
        mu = man_u.exp_map_mu0(mu_v, k)
        z, logq = wrapped_normal.sample_and_log_prob(
            key(5), man_u, jnp.broadcast_to(mu, (16, 3)),
            jnp.asarray(0.9, F64), k)
        v = man_u.inverse_sample_projection_mu0(z, mu, k)
        oracle = normal.log_prob(v, jnp.zeros(3, F64), jnp.asarray(0.9, F64))
        np.testing.assert_allclose(logq, oracle, rtol=1e-9)


class TestHypersphericalUniform:
    def test_area(self):
        # S^2 (m=3) unit: area 4 pi
        np.testing.assert_allclose(
            np.exp(hyperspherical_uniform.log_surface_area(3, F64(1.0))),
            4 * np.pi, rtol=1e-12)
        # radius scaling: R^2 for m=3
        np.testing.assert_allclose(
            np.exp(hyperspherical_uniform.log_surface_area(3, F64(0.25))),
            4 * np.pi * 4.0, rtol=1e-12)

    def test_sample_on_sphere(self):
        z = hyperspherical_uniform.sample(key(6), (1000,), 4, F64(0.5),
                                          dtype=F64)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                                   np.sqrt(2.0), rtol=1e-9)


class TestVonMisesFisher:
    @pytest.mark.parametrize("m,kappa", [(3, 0.5), (3, 5.0), (3, 80.0),
                                         (4, 3.0), (5, 2.0), (6, 6.0),
                                         (7, 10.0), (2, 4.0)])
    def test_mean_resultant_length(self, m, kappa):
        """Empirical E[<mu_hat, z_hat>] must equal A_m(kappa) — a sharp
        functional test of the Wood sampler."""
        n = 30_000
        mu = jnp.zeros((n, m), F64).at[:, 0].set(1.0)
        kap = jnp.full((n,), kappa, F64)
        z = von_mises_fisher.sample(key(7), mu, kap, F64(1.0))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                                   1.0, rtol=1e-9)
        emp = float(jnp.mean(jnp.sum(z * mu, axis=-1)))
        oracle = sps.ive(m / 2, kappa) / sps.ive(m / 2 - 1, kappa)
        np.testing.assert_allclose(emp, oracle, atol=4.0 / np.sqrt(n))

    def test_mean_direction_offaxis(self):
        n = 20_000
        mu_dir = np.array([0.6, -0.8, 0.0])
        mu = jnp.broadcast_to(jnp.asarray(mu_dir, F64), (n, 3))
        z = von_mises_fisher.sample(key(8), mu, jnp.full((n,), 6.0, F64),
                                    F64(1.0))
        mean = np.asarray(jnp.mean(z, axis=0))
        mean_dir = mean / np.linalg.norm(mean)
        np.testing.assert_allclose(mean_dir, mu_dir, atol=0.02)

    @pytest.mark.parametrize("m,kappa", [(3, 1.0), (5, 8.0)])
    def test_normalization(self, m, kappa):
        """MC integral of the density against the uniform measure."""
        n = 60_000
        k = F64(1.0)
        z = hyperspherical_uniform.sample(key(9), (n,), m, k, dtype=F64)
        mu = jnp.zeros((m,), F64).at[0].set(1.0)
        logq = von_mises_fisher.log_prob(z, mu, jnp.asarray(kappa, F64), k)
        logp = hyperspherical_uniform.log_prob(z, k)
        est = jax.scipy.special.logsumexp(logq - logp) - np.log(n)
        np.testing.assert_allclose(np.exp(est), 1.0, rtol=0.08)

    @pytest.mark.slow
    def test_kl_analytic_vs_mc(self):
        m, kappa = 5, 4.0
        n = 40_000
        mu = jnp.zeros((n, m), F64).at[:, 0].set(1.0)
        kap = jnp.full((n,), kappa, F64)
        k = F64(1.0)
        z = von_mises_fisher.sample(key(10), mu, kap, k)
        mc = float(jnp.mean(von_mises_fisher.log_prob(z, mu, kap, k)
                            - hyperspherical_uniform.log_prob(z, k)))
        analytic = float(von_mises_fisher.kl_to_uniform(m, F64(kappa)))
        np.testing.assert_allclose(analytic, mc, rtol=2e-2)

    def test_radius_scaling_consistency(self):
        """Normalization must hold on a non-unit sphere too (area term)."""
        m, kappa, k = 3, 2.0, F64(4.0)  # R = 1/2
        n = 40_000
        z = hyperspherical_uniform.sample(key(11), (n,), m, k, dtype=F64)
        mu = jnp.zeros((m,), F64).at[0].set(0.5)
        logq = von_mises_fisher.log_prob(z, mu, F64(kappa), k)
        logp = hyperspherical_uniform.log_prob(z, k)
        est = jax.scipy.special.logsumexp(logq - logp) - np.log(n)
        np.testing.assert_allclose(np.exp(est), 1.0, rtol=0.08)

    def test_kappa_gradient(self):
        """d/dkappa E[<mu, z>] via the reparameterized sampler vs the
        analytic derivative of A_m — validates the eps-recompute trick."""
        m, kappa = 3, 3.0
        n = 150_000

        def mean_cos(kap):
            mu = jnp.zeros((n, m), F64).at[:, 0].set(1.0)
            z = von_mises_fisher.sample(key(12), mu,
                                        jnp.full((n,), kap[0], F64), F64(1.0))
            return jnp.mean(jnp.sum(z * mu, axis=-1))

        g = jax.grad(lambda kap: mean_cos(kap))(jnp.asarray([kappa], F64))
        h = 1e-4
        oracle = (sps.ive(m / 2, kappa + h) / sps.ive(m / 2 - 1, kappa + h)
                  - sps.ive(m / 2, kappa - h) / sps.ive(m / 2 - 1, kappa - h)
                  ) / (2 * h)
        np.testing.assert_allclose(float(g[0]), oracle, rtol=0.1)


class TestWrappedNormalWrapTruncation:
    def test_wrap_count_convergence_on_sphere(self):
        """At moderate sigma one extra wrap is already converged; at large
        sigma adding wraps changes log_prob (documents the truncation knob)."""
        man = Manifold("s", 3)
        k = F64(1.0)
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.2, -0.1, 0.3], F64), k), (256, 4))
        z, _ = wrapped_normal.sample_and_log_prob(key(20), man, mu,
                                                  jnp.asarray(0.8, F64), k)
        lp1 = wrapped_normal.log_prob(man, z, mu, jnp.asarray(0.8, F64), k,
                                      wraps=1)
        lp2 = wrapped_normal.log_prob(man, z, mu, jnp.asarray(0.8, F64), k,
                                      wraps=3)
        np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                                   atol=1e-6)
        # at sigma = 3 the extra images carry real mass
        lp1_big = wrapped_normal.log_prob(man, z, mu, jnp.asarray(3.0, F64),
                                          k, wraps=1)
        lp3_big = wrapped_normal.log_prob(man, z, mu, jnp.asarray(3.0, F64),
                                          k, wraps=3)
        assert float(jnp.max(jnp.abs(lp3_big - lp1_big))) > 1e-3


class TestWrappedNormalDeadBranchSafety:
    """Regression (ADVICE r1): on the universal manifold with K <= 0 the
    wrap branches are dead; with a large-but-finite stand-in period their
    (rb/sigma)^2 overflowed f32 once sigma < ~2e-4 and the 0-weight
    logsumexp gradient became 0 * inf = NaN. Branches must be masked, not
    merely far away."""

    @pytest.mark.parametrize("k_val", [-1.0, -1e-8, 0.0, 1e-30, 1e-12])
    def test_grads_finite_at_tiny_sigma_f32(self, k_val):
        man = Manifold("u", 3)
        f32 = jnp.float32

        def loss(sigma, k, v_coord):
            mu = man.exp_map_mu0(jnp.asarray([0.05, -0.02, 0.04], f32), k)
            mu = jnp.broadcast_to(mu, (4, 3))
            z = man.sample_projection_mu0(v_coord, mu, k)
            return jnp.sum(wrapped_normal.log_prob(man, z, mu, sigma, k))

        v = 1e-5 * jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 3)), f32)
        grads = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(1e-5, f32), jnp.asarray(k_val, f32), v)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), (k_val, g)

    def test_positive_k_values_unchanged(self):
        """The masking must not perturb live-branch densities (K=1)."""
        man = Manifold("s", 3)
        k = F64(1.0)
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.2, -0.1, 0.3], F64), k), (64, 4))
        sig = jnp.asarray(0.8, F64)
        z, lq = wrapped_normal.sample_and_log_prob(key(21), man, mu, sig, k)
        # against an independent recomputation through log_prob — a
        # genuinely different formulation since round 4 (drawn-direction
        # branch sum vs inverse round trip), so agreement is limited by
        # the round trip's own f64 noise (~1e-8), not bit-exactness
        np.testing.assert_allclose(np.asarray(lq), np.asarray(
            wrapped_normal.log_prob(man, z, mu, sig, k)),
            rtol=1e-7, atol=1e-7)


class TestSphericalAntipode:
    """Regression (round 2): a posterior sample that lands numerically AT
    the antipode of mu (it happened on TPU at sigma ~ 1.5: z == -mu
    bit-exactly) drove the old log_map ratio form to |v| ~ 1e4 and a
    -1e8-scale garbage log_q, which training then exploited as free ELBO.
    log_map's magnitude is now pinned to the geodesic distance, so every
    wrapped-normal density stays bounded at the singularity."""

    def test_log_map_magnitude_bounded(self):
        F32 = jnp.float32
        k = jnp.asarray(1.0, F32)
        mu = sphere.project(jnp.asarray([[0.72, -0.32, -0.09, -0.25,
                                          0.49, 0.03, -0.26]], F32), k)
        z = -mu  # exact antipode
        v = sphere.log_map(mu, z, k)
        d = sphere.distance(mu, z, k)
        assert float(jnp.linalg.norm(v, axis=-1)[0]) <= float(d[0]) + 1e-5
        # nearly-antipodal: perturb by ~1e-7 (f32 resolution)
        z2 = sphere.project(-mu + 1e-7, k)
        v2 = sphere.log_map(mu, z2, k)
        assert float(jnp.linalg.norm(v2, axis=-1)[0]) <= np.pi + 1e-5

    def test_wrapped_log_prob_bounded_at_antipode(self):
        F32 = jnp.float32
        man = Manifold("s", 6)
        k = jnp.asarray(1.0, F32)
        mu = sphere.project(
            jax.random.normal(key(3), (8, 7), F32), k)
        sigma = jnp.asarray(1.5, F32)
        for z in (-mu, sphere.project(-mu + 1e-7, k)):
            lq = wrapped_normal.log_prob(man, z, mu, sigma, k)
            lq0 = wrapped_normal.log_prob_mu0(man, z, jnp.asarray(1.0, F32),
                                              k)
            assert np.all(np.isfinite(np.asarray(lq)))
            assert np.all(np.abs(np.asarray(lq)) < 500.0), np.asarray(lq)
            assert np.all(np.abs(np.asarray(lq0)) < 500.0)

    def test_parallel_transport_norm_preserved_near_antipode(self):
        F32 = jnp.float32
        k = jnp.asarray(1.0, F32)
        x = sphere.project(jnp.asarray([[1.0, 0.2, -0.4, 0.1]], F32), k)
        y = sphere.project(-x + 5e-7, k)
        u = sphere.project_tangent(x, jnp.asarray([[0.3, -1.0, 0.2, 0.8]],
                                                  F32), k)
        w = sphere.parallel_transport(x, y, u, k)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(w)),
                                   np.linalg.norm(np.asarray(u)), rtol=1e-5)

    def test_large_sigma_training_kls_bounded(self):
        """Many draws at the sigma scale that triggered the blowup: every
        per-lane |KL| must stay physically plausible (no 1e8 outliers)."""
        from mvae_tpu.components import parse_components, reparametrize
        F32 = jnp.float32
        (comp,) = parse_components("s6:wrapped")
        params = comp.init_params(key(4), 16, dtype=F32)
        feats = 2.0 * jax.random.normal(key(5), (4096, 16), F32)
        rep = reparametrize(key(6), comp, params, feats)
        kl = np.asarray(rep.kl)
        assert np.all(np.isfinite(kl))
        assert np.max(np.abs(kl)) < 1e3, np.max(np.abs(kl))


class TestRiemannianNormal:
    @pytest.mark.parametrize("n,sigma,c", [(2, 0.5, 1.0), (3, 1.0, 1.0),
                                           (6, 0.7, 0.5), (2, 2.0, 2.0),
                                           (4, 0.3, 1e-2)])
    def test_log_partition_vs_quadrature(self, n, sigma, c):
        r = np.linspace(1e-6, 60.0 * sigma, 400_000)
        integrand = np.exp(-r ** 2 / (2 * sigma ** 2)) * (
            np.sinh(np.sqrt(c) * r) / np.sqrt(c)) ** (n - 1)
        area = 2 * np.pi ** (n / 2) / sps.gamma(n / 2)
        oracle = np.log(area * np.trapezoid(integrand, r))
        ours = riemannian_normal.log_partition(n, F64(sigma), F64(-c))
        np.testing.assert_allclose(float(ours), oracle, rtol=1e-6)

    @pytest.mark.parametrize("sigma,c", [(0.5, 1.0), (1.5, 1.0), (0.2, 0.01)])
    def test_radial_sampler_matches_cdf(self, sigma, c):
        n_dim = 3
        ns = 40_000
        r = riemannian_normal.sample_radius(
            key(13), n_dim, jnp.full((ns,), sigma, F64), F64(-c))
        r = np.sort(np.asarray(r))
        for q in (0.1, 0.3, 0.5, 0.7, 0.9):
            r_q = r[int(q * ns)]
            cdf = float(riemannian_normal._radial_cdf(
                n_dim, jnp.asarray([r_q], F64), jnp.asarray([sigma], F64),
                F64(-c))[0])
            np.testing.assert_allclose(cdf, q, atol=0.02)

    @pytest.mark.parametrize("n,sigma", [(150, 0.05), (200, 0.7),
                                         (500, 0.7)])
    def test_log_partition_large_dim(self, n, sigma):
        """Regression (round-2 review): the additive mode ESTIMATE for the
        quadrature window overshot the true radial mode by ~sigma*sqrt(n),
        silently dropping the density peak for n >~ 144 (-4 nats at
        n=200). The window now bisects the exact mode."""
        c = 1.0
        r = np.linspace(1e-8, (n - 1) * sigma ** 2
                        + sigma * (np.sqrt(n) + 40), 400_000)
        # log-space oracle (avoids sinh overflow): log sinh x = x +
        # log1p(-exp(-2x)) - log 2
        logsinh = r + np.log1p(-np.exp(-2 * r)) - np.log(2.0)
        logw = -r ** 2 / (2 * sigma ** 2) + (n - 1) * logsinh
        M = logw.max()
        import math as _m
        area = (_m.log(2.0) + (n / 2) * _m.log(_m.pi)
                - _m.lgamma(n / 2))
        oracle = area + M + np.log(np.trapezoid(np.exp(logw - M), r))
        got = float(riemannian_normal.log_partition(
            n, jnp.asarray([sigma], F64), F64(-c))[0])
        np.testing.assert_allclose(got, oracle, rtol=1e-9)

    def test_small_sigma_no_cancellation_f32(self):
        """Regression (round 2): at sigma*sqrt(c) ~ 0.05 the erfcx
        binomial-sum closed form cancelled catastrophically in f32 (CDF
        ~ -9e24, pdf ~ 1e25, NaN implicit grads that killed d6:riemannian
        training on TPU). The quadrature form must stay accurate and
        differentiable there."""
        F32 = jnp.float32
        n = 6
        sig = jnp.asarray(np.linspace(0.02, 0.12, 16), F32)
        k32 = jnp.asarray(-1.0, F32)
        r = riemannian_normal.sample_radius(key(21), n, sig, k32)
        F = riemannian_normal._radial_cdf(n, r, sig, k32)
        assert np.all((np.asarray(F) >= 0) & (np.asarray(F) <= 1))
        pdf = np.exp(np.asarray(
            riemannian_normal._radial_log_pdf(n, r, sig, k32)))
        assert np.all(np.isfinite(pdf)) and np.all(pdf < 1e4)
        # f32 values against the f64 quadrature oracle at the same points
        F_64 = riemannian_normal._radial_cdf(
            n, r.astype(F64), sig.astype(F64), F64(-1.0))
        np.testing.assert_allclose(np.asarray(F), np.asarray(F_64),
                                   atol=2e-5)
        g = jax.grad(lambda s: jnp.sum(riemannian_normal.sample_radius(
            key(21), n, s, k32)))(sig)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_normalization_by_importance_sampling(self):
        man = Manifold("d", 3)
        k = F64(-1.0)
        nsamp = 60_000
        mu = jnp.broadcast_to(man.exp_map_mu0(
            jnp.asarray([0.2, -0.1, 0.3], F64), k), (nsamp, 3))
        z, logq = wrapped_normal.sample_and_log_prob(
            key(14), man, mu, jnp.asarray(1.0, F64), k)
        logrn = riemannian_normal.log_prob(man, z, mu, jnp.asarray(0.8, F64),
                                           k)
        est = jax.scipy.special.logsumexp(logrn - logq) - np.log(nsamp)
        np.testing.assert_allclose(np.exp(est), 1.0, rtol=0.05)

    @pytest.mark.slow
    def test_sigma_gradient_implicit(self):
        """dE[r]/dsigma via implicit reparameterization vs finite-difference
        quadrature of the true mean."""
        n_dim, c = 3, 1.0
        ns = 60_000  # MC noise on the grad estimate ~0.4%/sqrt(ns/60k)

        def mean_r(sig):
            r = riemannian_normal.sample_radius(
                key(15), n_dim, jnp.full((ns,), sig, F64), F64(-c))
            return jnp.mean(r)

        g = float(jax.grad(lambda s: mean_r(s))(F64(0.7)))

        def true_mean(sigma):
            r = np.linspace(1e-6, 40.0, 400_000)
            w = np.exp(-r ** 2 / (2 * sigma ** 2)) * np.sinh(r) ** (n_dim - 1)
            return np.trapezoid(r * w, r) / np.trapezoid(w, r)

        h = 1e-4
        oracle = (true_mean(0.7 + h) - true_mean(0.7 - h)) / (2 * h)
        np.testing.assert_allclose(g, oracle, rtol=0.05)

    def test_lorentz_and_poincare_agree(self):
        k = F64(-0.6)
        man_h, man_d = Manifold("h", 3), Manifold("d", 3)
        mu_v = jnp.asarray([0.1, 0.2, -0.3], F64)
        z_h = riemannian_normal.sample(
            key(16), man_h,
            jnp.broadcast_to(man_h.exp_map_mu0(mu_v, k), (32, 4)),
            jnp.full((32,), 0.9, F64), k)
        lp_h = riemannian_normal.log_prob(
            man_h, z_h, man_h.exp_map_mu0(mu_v, k), jnp.full((32,), 0.9, F64),
            k)
        z_d = lorentz.lorentz_to_poincare(z_h, k)
        lp_d = riemannian_normal.log_prob(
            man_d, z_d, man_d.exp_map_mu0(mu_v, k), jnp.full((32,), 0.9, F64),
            k)
        np.testing.assert_allclose(lp_h, lp_d, rtol=1e-8)
