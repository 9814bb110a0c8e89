"""Training-dynamics parity: mvae_tpu's Trainer vs the f64 torch replica
(tests/parity/torch_trainer.py — round-3 VERDICT #3).

The fast tests here validate the REPLICA ITSELF on tiny shapes: with the
same initial weights, the same mirrored noise, and the same Adam/burn-in
semantics, one epoch of the two trainers must land on the same weights to
f32-vs-f64 drift (~1e-5 relative over a few steps). The full 15-epoch
IWAE-500 comparison on the parity trio (e6 / h6 / h2,s2,e2) runs in
scripts/run_r3_training_parity.py (results in PARITY.md)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvae_tpu.components import parse_components
from mvae_tpu.data.base import ArrayDataset
from mvae_tpu.models import vae
from mvae_tpu.train.trainer import TrainConfig, Trainer

from .torch_trainer import TorchTrainerReplica, TorchVAEReplica, epoch_noise

D = 24          # tiny "image"
N_TRAIN = 32
BS = 8


def _comp_descr(components):
    return [{"kind": c.manifold.kind, "dim": c.dim,
             "posterior": c.posterior,
             "fixed_curvature": c.fixed_curvature,
             "sigma_cap": c.sigma_cap} for c in components]


def _noise_kinds(components):
    return [(c.manifold.kind, c.dim, c.posterior) for c in components]


def _max_rel_delta(jax_params, torch_params):
    out = 0.0
    for a, b in zip(jax.tree.leaves(jax_params),
                    jax.tree.leaves(torch_params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        out = max(out, float(np.max(np.abs(a - b)
                                    / (np.abs(b) + 1e-3))))
    return out


@pytest.mark.parametrize("spec,fixed", [
    ("e2", True), ("h2", False), ("s2", True), ("h2,s2,e2", True),
    # round-4 families: positive-K wrapped (sphere + stereographic with
    # learnable K), Wood-rejection vMF (m = 5), Riemannian normal
    ("s2:wrapped", True), ("u2", False), ("s4", True),
    ("d2:riemannian", True)])
def test_one_epoch_matches_torch_replica(tmp_path, spec, fixed):
    # wraps=0 pins principal-branch (reference-estimator) semantics on the
    # jax side: the torch replica's wrapped/prior densities are principal-
    # only, and at K ~ 1 the nearest wrap image carries ~1e-2 relative
    # mass — far above this test's 5e-4 one-epoch drift budget
    comps = parse_components(spec, fixed_curvature=fixed, wraps=0)
    cfg = vae.VAEConfig(components=comps, data_shape=(D,), h_dim=16)
    rng = np.random.default_rng(0)
    train = (rng.uniform(size=(N_TRAIN, D)) > 0.5).astype(np.float32) * 0.8
    ds = ArrayDataset(train=train, test=train[:8], data_shape=(D,),
                      binarize=True, name="tiny")
    tc = TrainConfig(epochs=1, batch_size=BS, burnin_epochs=0 if fixed else 1,
                     seed=3, train_rng="threefry", eval_batch_size=8)
    tr = Trainer(cfg, ds, tc, run_dir=str(tmp_path))

    model = TorchVAEReplica(jax.tree.map(np.asarray, tr.params),
                            _comp_descr(comps), beta=tc.beta)
    rep = TorchTrainerReplica(model, lr=tc.lr, curvature_lr=tc.curvature_lr,
                              burnin_epochs=tc.burnin_epochs,
                              steps_per_epoch=tr.steps_per_epoch)

    # mirror the Trainer's post-init key (trainer.py:278-279)
    key, _init = jax.random.split(jax.random.key(tc.seed))
    key, perm, noises = epoch_noise(key, _noise_kinds(comps), 0,
                                    tr.steps_per_epoch, BS, (D,), N_TRAIN)

    tr.train_one_epoch(0)
    rep.train_epoch(train, perm, noises, BS)

    delta = _max_rel_delta(tr.params,
                           model.to_jax_params(jax.tree.map(np.asarray,
                                                            tr.params)))
    assert delta < 5e-4, f"params diverged after one epoch: {delta}"


def test_one_epoch_uncapped_s_wrapped_matches_torch(tmp_path):
    """sigma_cap=False (the round-5 basin-study model class) must stay
    draw-for-draw mirrored between the two frameworks too — the uncapped
    torch twin is only evidence about the reference family if it tracks
    the uncapped jax model exactly."""
    import dataclasses
    comps = tuple(dataclasses.replace(c, sigma_cap=False)
                  for c in parse_components("s2:wrapped", wraps=0))
    assert not comps[0].sigma_cap
    cfg = vae.VAEConfig(components=comps, data_shape=(D,), h_dim=16)
    rng = np.random.default_rng(7)
    train = (rng.uniform(size=(N_TRAIN, D)) > 0.5).astype(np.float32) * 0.8
    ds = ArrayDataset(train=train, test=train[:8], data_shape=(D,),
                      binarize=True, name="tiny")
    tc = TrainConfig(epochs=1, batch_size=BS, burnin_epochs=0, seed=3,
                     train_rng="threefry", eval_batch_size=8)
    tr = Trainer(cfg, ds, tc, run_dir=str(tmp_path))
    # uncapped positive-K wrapped must route to the jnp tail (the fused
    # kernel bakes the cap in)
    from mvae_tpu.kernels import tail_kernels
    assert not tail_kernels.component_supported(comps[0])
    assert not tr.fused_paths["train_tail"]["active"]
    model = TorchVAEReplica(jax.tree.map(np.asarray, tr.params),
                            _comp_descr(comps), beta=tc.beta)
    rep = TorchTrainerReplica(model, lr=tc.lr, curvature_lr=tc.curvature_lr,
                              burnin_epochs=0,
                              steps_per_epoch=tr.steps_per_epoch)
    key, _init = jax.random.split(jax.random.key(tc.seed))
    key, perm, noises = epoch_noise(key, _noise_kinds(comps), 0,
                                    tr.steps_per_epoch, BS, (D,), N_TRAIN)
    tr.train_one_epoch(0)
    rep.train_epoch(train, perm, noises, BS)
    delta = _max_rel_delta(tr.params,
                           model.to_jax_params(jax.tree.map(np.asarray,
                                                            tr.params)))
    assert delta < 5e-4, f"uncapped params diverged after one epoch: {delta}"


def test_curvature_frozen_during_burnin(tmp_path):
    """Burn-in mask parity: with burnin_epochs=1, c_param must be EXACTLY
    unchanged after the first epoch in both frameworks."""
    comps = parse_components("h2", fixed_curvature=False)
    cfg = vae.VAEConfig(components=comps, data_shape=(D,), h_dim=16)
    rng = np.random.default_rng(1)
    train = (rng.uniform(size=(N_TRAIN, D)) > 0.5).astype(np.float32)
    ds = ArrayDataset(train=train, test=train[:8], data_shape=(D,),
                      binarize=True, name="tiny")
    tc = TrainConfig(epochs=1, batch_size=BS, burnin_epochs=1, seed=5,
                     train_rng="threefry", eval_batch_size=8)
    tr = Trainer(cfg, ds, tc, run_dir=str(tmp_path))
    c0 = float(np.asarray(tr.params["components"][0]["c_param"]))

    model = TorchVAEReplica(jax.tree.map(np.asarray, tr.params),
                            _comp_descr(comps))
    rep = TorchTrainerReplica(model, burnin_epochs=1,
                              steps_per_epoch=tr.steps_per_epoch)
    key, _ = jax.random.split(jax.random.key(tc.seed))
    key, perm, noises = epoch_noise(key, _noise_kinds(comps), 0,
                                    tr.steps_per_epoch, BS, (D,), N_TRAIN)
    tr.train_one_epoch(0)
    rep.train_epoch(train, perm, noises, BS)

    assert float(np.asarray(tr.params["components"][0]["c_param"])) == c0
    assert float(model.comps[0]["c_param"].detach()) == c0
