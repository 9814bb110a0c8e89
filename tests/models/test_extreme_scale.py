"""Model-level f32 stress net: finite loss AND gradients across posterior
scale extremes for every geometry/posterior family.

Both round-2 production bugs (RESULTS_r2.md) were of one class — an f32
formula leaving its accurate regime at a posterior scale that ordinary
training reaches (sigma ~ 1.5 wrapped samples hitting the spherical
antipode; sigma ~ 0.05 cancelling the Riemannian-normal closed forms).
This net drives the FULL loss (encode -> reparametrize -> decode -> ELBO)
with the scale head pinned to extreme values and asserts every gradient
stays finite. One compile per spec; the scale is a parameter value, so the
sweep reuses the compiled function.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.models import VAEConfig, init_params, loss_fn

F32 = jnp.float32

SPECS = ["e3", "h3", "d3", "s3", "p3", "u3", "s3:wrapped",
         "d3:riemannian", "p3:vmf"]

# softplus(raw) = sigma  =>  raw = log(expm1(sigma)); concentration
# families add +1 inside the head, the same raw still lands in-range
SIGMAS = [1e-3, 5e-2, 1.0, 5.0]


def _pin_scale(params, sigma):
    """Zero the scale head weights and set its bias so scale == sigma."""
    raw = float(np.log(np.expm1(sigma))) if sigma < 30 else sigma
    comps = []
    for cp in params["components"]:
        cp = dict(cp)
        cp["w_sig"] = jnp.zeros_like(cp["w_sig"])
        cp["b_sig"] = jnp.full_like(cp["b_sig"], raw)
        comps.append(cp)
    return {**params, "components": tuple(comps)}


@pytest.mark.parametrize("spec", SPECS)
def test_loss_and_grads_finite_across_scales(spec):
    comps = parse_components(spec, fixed_curvature=False)
    cfg = VAEConfig(components=comps, data_shape=(20,), arch="mlp",
                    h_dim=16)
    params = init_params(jax.random.key(0), cfg, dtype=F32)
    x = (jax.random.uniform(jax.random.key(1), (32, 20)) > 0.5).astype(F32)

    @jax.jit
    def loss_and_grads(p):
        (loss, _), g = jax.value_and_grad(
            lambda pp: loss_fn(jax.random.key(2), cfg, pp, x),
            has_aux=True)(p)
        return loss, g

    for sigma in SIGMAS:
        p = _pin_scale(params, sigma)
        loss, g = loss_and_grads(p)
        assert np.isfinite(float(loss)), (spec, sigma, float(loss))
        # the loss magnitude must stay physically plausible: an extreme
        # but bounded density, not an exploitable 1e8 artifact
        assert abs(float(loss)) < 1e6, (spec, sigma, float(loss))
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            ok = np.all(np.isfinite(np.asarray(leaf)))
            assert ok, (spec, sigma, jax.tree_util.keystr(path))
