"""f64 central-finite-difference gradient checks of the manifold ops vs AD
(the reference's torch gradcheck analog, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.ops import (euclidean, lorentz, poincare, sphere,
                          spherical_projected, universal)

MODS = [(lorentz, -0.7), (sphere, 0.8), (poincare, -0.7),
        (spherical_projected, 0.8), (universal, -0.5), (universal, 0.5),
        (euclidean, 0.0)]


def fd_grad(f, x, h=1e-6):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[idx] += h
        xm[idx] -= h
        g[idx] = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (
            2 * h)
        it.iternext()
    return g


@pytest.mark.parametrize("mod,k0", MODS,
                         ids=[f"{m.__name__.split('.')[-1]}_k{k}"
                              for m, k in MODS])
class TestGradcheck:
    DIM = 3

    def _setup(self, mod, k0):
        k = jnp.float64(k0)
        v1 = jnp.asarray([0.3, -0.2, 0.4], jnp.float64)
        v2 = jnp.asarray([-0.1, 0.25, 0.15], jnp.float64)
        x = mod.exp_map_mu0(v1, k)
        y = mod.exp_map_mu0(v2, k)
        return k, v1, v2, x, y

    def test_distance_grad_wrt_tangent(self, mod, k0):
        k, v1, v2, _, y = self._setup(mod, k0)

        def f(v):
            return mod.distance(mod.exp_map_mu0(v, k), y, k)

        ad = np.asarray(jax.grad(lambda v: f(v))(v1))
        fd = fd_grad(f, v1)
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-7)

    def test_distance_grad_wrt_curvature(self, mod, k0):
        if mod is euclidean:
            pytest.skip("no curvature")
        k, v1, v2, _, _ = self._setup(mod, k0)

        def f(kk):
            kk = kk.reshape(())
            x = mod.exp_map_mu0(v1, kk)
            y = mod.exp_map_mu0(v2, kk)
            return mod.distance(x, y, kk)

        ad = float(jax.grad(lambda kk: f(kk))(jnp.asarray([k0], jnp.float64)
                                              ).reshape(()))
        fd = float(fd_grad(f, np.asarray([k0]))[0])
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-8)

    def test_sample_projection_grad_wrt_inputs(self, mod, k0):
        k, v1, v2, _, _ = self._setup(mod, k0)

        def f(both):
            v, muv = both[:3], both[3:]
            mu = mod.exp_map_mu0(muv, k)
            z = mod.sample_projection_mu0(v, mu, k)
            return jnp.sum(z * jnp.arange(1.0, z.shape[-1] + 1.0))

        both = jnp.concatenate([v1, v2])
        ad = np.asarray(jax.grad(f)(both))
        fd = fd_grad(f, both)
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-7)

    def test_parallel_transport_grad(self, mod, k0):
        k, v1, v2, x, y = self._setup(mod, k0)

        def f(v):
            u = mod.transp_mu0(x, v, k)
            w = mod.inv_transp_mu0(x, u, k)
            return jnp.sum(u * u) + jnp.sum(w)

        ad = np.asarray(jax.grad(f)(v1))
        fd = fd_grad(f, v1)
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-7)
