"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY.md §4 implication
(b)): sharded-vs-single-device numerical equivalence and the dryrun path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.models import VAEConfig, init_params, loss_fn
from mvae_tpu.parallel import (batch_sharding, make_mesh, param_shardings,
                               shard_batch, shard_params)

F32 = jnp.float32


def make_model(h_dim=32, d=16):
    cfg = VAEConfig(components=parse_components("h2,s2,e2"),
                    data_shape=(d,), arch="mlp", h_dim=h_dim)
    params = init_params(jax.random.key(0), cfg, dtype=F32)
    x = (jax.random.uniform(jax.random.key(1), (32, d)) > 0.5).astype(F32)
    return cfg, params, x


class TestMesh:
    def test_make_mesh_shapes(self):
        assert len(jax.devices()) == 8, "conftest should give 8 cpu devices"
        mesh = make_mesh(4, 2)
        assert mesh.shape == {"data": 4, "model": 2}
        mesh1 = make_mesh()  # all devices on data axis
        assert mesh1.shape["data"] == 8

    def test_param_shardings_cover_tree(self):
        cfg, params, _ = make_model()
        mesh = make_mesh(4, 2)
        sh = param_shardings(mesh, params)
        assert jax.tree.structure(sh) == jax.tree.structure(params)
        # encoder kernel is model-sharded
        enc_w = sh["encoder"]["layers"][0]["w"]
        assert "model" in str(enc_w.spec)

    def test_sharded_loss_matches_single_device(self):
        """DP+TP sharded execution must be numerically equivalent (f32
        tolerance) to single-device execution — the jit-vs-sharded analog of
        the reference's determinism tests."""
        cfg, params, x = make_model()
        key = jax.random.key(7)
        loss_single, _ = jax.jit(
            lambda p, xx: loss_fn(key, cfg, p, xx))(params, x)

        mesh = make_mesh(4, 2)
        params_sh = shard_params(params, mesh)
        x_sh = shard_batch(x, mesh)
        loss_sh, _ = jax.jit(
            lambda p, xx: loss_fn(key, cfg, p, xx))(params_sh, x_sh)
        np.testing.assert_allclose(float(loss_single), float(loss_sh),
                                   rtol=2e-5)

    def test_grads_sharded_equivalence(self):
        cfg, params, x = make_model()
        key = jax.random.key(8)

        def scalar(p, xx):
            l, _ = loss_fn(key, cfg, p, xx)
            return l

        g_single = jax.jit(jax.grad(scalar))(params, x)
        mesh = make_mesh(2, 2)  # also exercise a partial mesh
        g_sh = jax.jit(jax.grad(scalar))(shard_params(params, mesh),
                                         shard_batch(x, mesh))
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    def test_iwae_eval_sharded_matches_single_device(self):
        """TP/DP-sharded IWAE eval (fused kernel off — GSPMD has no
        partitioning rule for pallas_call) must reproduce the single-device
        estimate at f32 tolerance under a (2,2) mesh (round-2 VERDICT weak
        #7: --mesh eval was untested)."""
        from mvae_tpu.models import vae
        cfg, params, x = make_model()
        key = jax.random.key(11)
        ll = jax.jit(lambda p, xx: vae.log_likelihood(
            key, cfg, p, xx, 20, 5, allow_fused=False))(params, x)

        mesh = make_mesh(2, 2)
        ll_sh = jax.jit(lambda p, xx: vae.log_likelihood(
            key, cfg, p, xx, 20, 5, allow_fused=False))(
                shard_params(params, mesh), shard_batch(x, mesh))
        np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_sh),
                                   rtol=2e-5, atol=2e-5)

    def test_batch_sharding_distributes(self):
        mesh = make_mesh(8, 1)
        x = jnp.ones((64, 4))
        x_sh = shard_batch(x, mesh)
        assert x_sh.sharding == batch_sharding(mesh)
        # each device holds 1/8 of the batch
        shard_shapes = {s.data.shape for s in x_sh.addressable_shards}
        assert shard_shapes == {(8, 4)}


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry
        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(float(out))

    @pytest.mark.slow  # the driver runs this directly; the subprocess
    # variant (test_graft_entry.py, also slow) covers the env hardening
    def test_dryrun_8(self):
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)
