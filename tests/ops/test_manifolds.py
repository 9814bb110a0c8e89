"""L1 property tests (SURVEY.md §4): log∘exp roundtrips, isometric parallel
transport, on-manifold closure, distance axioms, cross-model equivalence via
isometries, K→0 limits, and f32 gradient finiteness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.ops import (euclidean, lorentz, manifold, poincare, sphere,
                          spherical_projected, stable, stereographic,
                          universal)

DIM = 4
N = 16


def rand(key, shape, scale=1.0):
    return scale * jax.random.normal(key, shape, dtype=jnp.float64)


def make_points(mod, key, k, n=N, dim=DIM, scale=0.5):
    """Random points as exp_mu0 of random orthonormal tangents."""
    v = rand(key, (n, dim), scale)
    return mod.exp_map_mu0(v, k)


def metric_inner(mod, x, u, w, k):
    """Riemannian inner product of tangents u, w at x, per model."""
    if mod is lorentz:
        return lorentz.lorentz_product(u, w)
    if mod in (sphere, euclidean):
        return jnp.sum(u * w, axis=-1)
    # stereographic family: conformal metric lambda_x^2 <u,w>
    lam = stereographic.lambda_x(x, k, keepdims=False)
    return lam * lam * jnp.sum(u * w, axis=-1)


MODS = [
    (euclidean, 0.0), (lorentz, -1.0), (lorentz, -0.37), (sphere, 1.0),
    (sphere, 0.62), (poincare, -1.0), (poincare, -0.37),
    (spherical_projected, 1.0), (spherical_projected, 0.62),
    (universal, -0.8), (universal, 0.8), (universal, 1e-5),
    (universal, -1e-5), (universal, 0.0),
]


def kid(m):
    return f"{m[0].__name__.split('.')[-1]}_k{m[1]}"


@pytest.mark.parametrize("mod,k", MODS, ids=map(kid, MODS))
class TestManifoldProperties:
    def test_mu0_roundtrip(self, mod, k):
        """log_mu0(exp_mu0(v)) = v."""
        k = jnp.float64(k)
        v = rand(jax.random.key(0), (N, DIM), 0.6)
        z = mod.exp_map_mu0(v, k)
        v2 = mod.log_map_mu0(z, k)
        np.testing.assert_allclose(v2, v, rtol=1e-8, atol=1e-9)

    def test_on_manifold(self, mod, k):
        """exp outputs satisfy the model constraint."""
        k = jnp.float64(k)
        z = make_points(mod, jax.random.key(1), k)
        if mod is lorentz:
            q = lorentz.lorentz_product(z, z)
            np.testing.assert_allclose(q, -1.0 / (-float(k)), rtol=1e-10)
        elif mod is sphere:
            np.testing.assert_allclose(jnp.sum(z * z, axis=-1),
                                       1.0 / float(k), rtol=1e-10)
        elif mod is poincare:
            assert np.all(np.sum(np.asarray(z) ** 2, -1) < 1.0 / -float(k))

    def test_sample_projection_roundtrip(self, mod, k):
        """inverse_sample_projection_mu0 ∘ sample_projection_mu0 = id —
        the wrapped-normal sampling path and its log_prob inverse."""
        k = jnp.float64(k)
        kv, km = jax.random.split(jax.random.key(2))
        v = rand(kv, (N, DIM), 0.5)
        mu = make_points(mod, km, k, scale=0.4)
        z = mod.sample_projection_mu0(v, mu, k)
        v2 = mod.inverse_sample_projection_mu0(z, mu, k)
        np.testing.assert_allclose(v2, v, rtol=1e-7, atol=1e-8)

    def test_general_exp_log_roundtrip(self, mod, k):
        k = jnp.float64(k)
        kx, ku = jax.random.split(jax.random.key(3))
        x = make_points(mod, kx, k, scale=0.4)
        if mod is lorentz:
            u = lorentz.project_tangent(x, rand(ku, x.shape, 0.5), k)
        elif mod is sphere:
            u = sphere.project_tangent(x, rand(ku, x.shape, 0.5), k)
        else:
            u = rand(ku, x.shape, 0.3)
        y = mod.exp_map(x, u, k)
        u2 = mod.log_map(x, y, k)
        np.testing.assert_allclose(u2, u, rtol=1e-7, atol=1e-8)

    def test_distance_consistency(self, mod, k):
        """d(x, exp_x(u)) equals the Riemannian norm of u; d is symmetric;
        d(x,x) ~ 0."""
        k = jnp.float64(k)
        kx, ku = jax.random.split(jax.random.key(4))
        x = make_points(mod, kx, k, scale=0.4)
        if mod is lorentz:
            u = lorentz.project_tangent(x, rand(ku, x.shape, 0.4), k)
        elif mod is sphere:
            u = sphere.project_tangent(x, rand(ku, x.shape, 0.4), k)
        else:
            u = rand(ku, x.shape, 0.2)
        unorm = jnp.sqrt(jnp.maximum(metric_inner(mod, x, u, u, k), 0.0))
        y = mod.exp_map(x, u, k)
        d = mod.distance(x, y, k)
        np.testing.assert_allclose(d, unorm, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(mod.distance(y, x, k), d, rtol=1e-9)
        assert np.all(np.asarray(mod.distance(x, x, k)) < 1e-6)

    def test_parallel_transport_isometry(self, mod, k):
        """PT preserves the Riemannian inner product (SURVEY.md §4 row 1)."""
        k = jnp.float64(k)
        kx, ky, ka, kb = jax.random.split(jax.random.key(5), 4)
        x = make_points(mod, kx, k, scale=0.3)
        y = make_points(mod, ky, k, scale=0.3)
        a, b = rand(ka, x.shape, 0.5), rand(kb, x.shape, 0.5)
        if mod is lorentz:
            a = lorentz.project_tangent(x, a, k)
            b = lorentz.project_tangent(x, b, k)
        elif mod is sphere:
            a = sphere.project_tangent(x, a, k)
            b = sphere.project_tangent(x, b, k)
        at = mod.parallel_transport(x, y, a, k)
        bt = mod.parallel_transport(x, y, b, k)
        np.testing.assert_allclose(metric_inner(mod, y, at, bt, k),
                                   metric_inner(mod, x, a, b, k),
                                   rtol=1e-7, atol=1e-9)

    def test_transp_mu0_roundtrip_and_isometry(self, mod, k):
        k = jnp.float64(k)
        kv, km = jax.random.split(jax.random.key(6))
        v = rand(kv, (N, DIM), 0.5)
        mu = make_points(mod, km, k, scale=0.4)
        u = mod.transp_mu0(mu, v, k)
        v2 = mod.inv_transp_mu0(mu, u, k)
        np.testing.assert_allclose(v2, v, rtol=1e-8, atol=1e-10)
        # orthonormal-frame norm must equal the Riemannian norm at mu
        np.testing.assert_allclose(metric_inner(mod, mu, u, u, k),
                                   jnp.sum(v * v, axis=-1),
                                   rtol=1e-8, atol=1e-10)

    def test_f32_grads_finite(self, mod, k):
        """Gradients of the full sample-projection chain stay finite in f32,
        including at v = 0 (SURVEY.md §7 hard part #1)."""
        kf = jnp.float32(k)

        def loss(v, mu_v, kk):
            mu = mod.exp_map_mu0(mu_v, kk)
            z = mod.sample_projection_mu0(v, mu, kk)
            v_back = mod.inverse_sample_projection_mu0(z, mu, kk)
            r = stable.safe_norm(v_back)
            return jnp.sum(r + stable.log_sin_k_div(r, kk))

        v = jnp.concatenate([jnp.zeros((1, DIM), jnp.float32),
                             0.5 * jnp.ones((1, DIM), jnp.float32)])
        mu_v = jnp.concatenate([jnp.zeros((1, DIM), jnp.float32),
                                0.3 * jnp.ones((1, DIM), jnp.float32)])
        grads = jax.grad(loss, argnums=(0, 1, 2))(v, mu_v, kf)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), (mod.KIND, k)


class TestCrossModelEquivalence:
    """Isometries give equal distances across models (SURVEY.md §4)."""

    @pytest.mark.parametrize("k", [-1.0, -0.37])
    def test_lorentz_vs_poincare(self, k):
        k = jnp.float64(k)
        kx, ky = jax.random.split(jax.random.key(7))
        x = make_points(lorentz, kx, k, scale=0.8)
        y = make_points(lorentz, ky, k, scale=0.8)
        dl = lorentz.distance(x, y, k)
        px = lorentz.lorentz_to_poincare(x, k)
        py = lorentz.lorentz_to_poincare(y, k)
        dp = poincare.distance(px, py, k)
        np.testing.assert_allclose(dl, dp, rtol=1e-8)
        # roundtrip of the isometry itself
        np.testing.assert_allclose(lorentz.poincare_to_lorentz(px, k), x,
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("k", [1.0, 0.62])
    def test_sphere_vs_projected(self, k):
        k = jnp.float64(k)
        kx, ky = jax.random.split(jax.random.key(8))
        x = make_points(sphere, kx, k, scale=0.7)
        y = make_points(sphere, ky, k, scale=0.7)
        ds = sphere.distance(x, y, k)
        px = sphere.sphere_to_projected(x, k)
        py = sphere.sphere_to_projected(y, k)
        dp = spherical_projected.distance(px, py, k)
        np.testing.assert_allclose(ds, dp, rtol=1e-8)
        np.testing.assert_allclose(sphere.projected_to_sphere(px, k), x,
                                   rtol=1e-8, atol=1e-10)

    def test_mu0_frames_agree_under_isometry(self):
        """exp_map_mu0 commutes with the Lorentz->Poincare isometry: the
        orthonormal-frame conventions match across models (this is what
        makes H^n and D^n produce identical wrapped normals, as in the
        reference paper's near-identical H/D table rows)."""
        k = jnp.float64(-0.7)
        v = rand(jax.random.key(9), (N, DIM), 0.6)
        z_l = lorentz.exp_map_mu0(v, k)
        z_p = poincare.exp_map_mu0(v, k)
        np.testing.assert_allclose(lorentz.lorentz_to_poincare(z_l, k), z_p,
                                   rtol=1e-8, atol=1e-10)
        # and the sphere/projected pair
        kp = jnp.float64(0.7)
        z_s = sphere.exp_map_mu0(v * 0.4, kp)
        z_q = spherical_projected.exp_map_mu0(v * 0.4, kp)
        np.testing.assert_allclose(sphere.sphere_to_projected(z_s, kp), z_q,
                                   rtol=1e-8, atol=1e-10)


class TestUniversalLimits:
    """K→0 behavior of the universal manifold (SURVEY.md §4: 'K→0 limit of
    universal ops = Euclidean')."""

    def test_distance_continuity_through_zero(self):
        kx, ky = jax.random.split(jax.random.key(10))
        x = rand(kx, (N, DIM), 0.3)
        y = rand(ky, (N, DIM), 0.3)
        d0 = universal.distance(x, y, jnp.float64(0.0))
        # stereographic coords at K=0 carry conformal factor 2
        np.testing.assert_allclose(d0, 2 * np.linalg.norm(
            np.asarray(y - x), axis=-1), rtol=1e-10)
        dm = universal.distance(x, y, jnp.float64(-1e-7))
        dp = universal.distance(x, y, jnp.float64(1e-7))
        np.testing.assert_allclose(dm, d0, rtol=1e-6)
        np.testing.assert_allclose(dp, d0, rtol=1e-6)

    def test_grad_wrt_k_continuous_through_zero(self):
        x = rand(jax.random.key(11), (DIM,), 0.3)
        y = rand(jax.random.key(12), (DIM,), 0.3)

        def d(k):
            return universal.distance(x, y, k)

        g = jax.grad(d)
        g0, gm, gp = g(jnp.float64(0.0)), g(jnp.float64(-1e-6)), g(
            jnp.float64(1e-6))
        assert np.isfinite(g0)
        np.testing.assert_allclose(gm, g0, rtol=1e-4)
        np.testing.assert_allclose(gp, g0, rtol=1e-4)


class TestGyrovectorAlgebra:
    """Mobius/gyro identities on the stereographic core."""

    @pytest.mark.parametrize("k", [-1.0, -0.3, 0.0, 0.3, 1.0])
    def test_left_cancellation(self, k):
        k = jnp.float64(k)
        ka, kb = jax.random.split(jax.random.key(13))
        a = rand(ka, (N, DIM), 0.3)
        b = rand(kb, (N, DIM), 0.3)
        # (-a) + (a + b) = b
        np.testing.assert_allclose(
            stereographic.mobius_add(-a, stereographic.mobius_add(a, b, k), k),
            b, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("k", [-1.0, 0.5])
    def test_scalar_mul(self, k):
        k = jnp.float64(k)
        a = rand(jax.random.key(14), (N, DIM), 0.2)
        two_a = stereographic.mobius_scalar_mul(2.0, a, k)
        np.testing.assert_allclose(two_a, stereographic.mobius_add(a, a, k),
                                   rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("k", [-1.0, 0.5])
    def test_gyration_preserves_norm(self, k):
        k = jnp.float64(k)
        ka, kb, kv = jax.random.split(jax.random.key(15), 3)
        a, b = rand(ka, (N, DIM), 0.3), rand(kb, (N, DIM), 0.3)
        v = rand(kv, (N, DIM), 0.5)
        gv = stereographic.gyration(a, b, v, k)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(gv), axis=-1),
                                   np.linalg.norm(np.asarray(v), axis=-1),
                                   rtol=1e-8)


class TestManifoldDescriptor:
    def test_registry(self):
        for kind in manifold.KINDS:
            m = manifold.Manifold(kind, 3)
            assert m.ambient_dim in (3, 4)
        with pytest.raises(ValueError):
            manifold.Manifold("x", 3)
        with pytest.raises(ValueError):
            manifold.Manifold("e", 0)

    def test_curvature_param_roundtrip(self):
        for kind in "hdspu":
            m = manifold.Manifold(kind, 3)
            for k0 in (0.25, 1.0, 3.0):
                p = m.init_curvature_param(k0, jnp.float64)
                kk = m.curvature(p)
                expected = k0 * (m.curvature_sign or 1.0)
                np.testing.assert_allclose(kk, expected, rtol=1e-12)

    def test_logdet_matches_numerical_jacobian(self):
        """(n-1) log(sin_k(r)/r) equals the true log|det| of v -> z =
        sample_projection_mu0(v, mu), via explicit jacfwd determinant."""
        for kind, k0 in (("h", -1.3), ("s", 0.8), ("d", -0.9), ("p", 1.1),
                         ("u", -0.5), ("u", 0.7), ("e", 0.0)):
            m = manifold.Manifold(kind, 3)
            k = jnp.float64(k0)
            v = 0.4 * jnp.ones((3,), jnp.float64)
            mu_v = jnp.asarray([0.1, -0.2, 0.3], jnp.float64)
            mu = m.exp_map_mu0(mu_v, k)

            f = lambda vv: m.sample_projection_mu0(vv, mu, k)
            J = jax.jacfwd(f)(v)  # (ambient, 3)
            # log sqrt(det(J^T g(z) J)) with the model's metric g at z:
            if kind == "h":
                G = J.T @ J - 2.0 * jnp.outer(J[0], J[0])  # Lorentz signature
                vol = 0.5 * jnp.linalg.slogdet(G)[1]
            elif kind in ("s", "e"):
                vol = 0.5 * jnp.linalg.slogdet(J.T @ J)[1]
            else:  # conformal: g = lambda_z^2 I
                lam = stereographic.lambda_x(f(v), k, keepdims=False)
                vol = 0.5 * jnp.linalg.slogdet(J.T @ J)[1] + 3.0 * jnp.log(lam)
            r = stable.safe_norm(v)
            expected = m.logdet_exp_mu0(r, k)
            np.testing.assert_allclose(vol, expected, rtol=1e-6, atol=1e-8)
