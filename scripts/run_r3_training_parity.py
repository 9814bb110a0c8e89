"""Training-dynamics parity run (round-3 VERDICT #3).

For each config in the parity trio (e6 / h6-learnable / h2,s2,e2), train
BOTH frameworks from the same initial weights on identical synthetic MNIST
with identical data order, binarization draws and reparameterization noise
(tests/parity/torch_trainer.py mirrors the Trainer's threefry chain), then
evaluate BOTH trained weight sets with the SAME instrument — full-split
IWAE-``--iwae_n`` with fixed binarization (0.002-nat noise floor,
PARITY.md) — and report the delta. wraps=0 on every component (the
reference's principal-branch estimator semantics), train_rng='threefry'
(bit-reproducible across backends).

Usage:  python scripts/run_r3_training_parity.py [--epochs 15]
        [--n_train 2048] [--n_test 1024] [--out results/r3_parity.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import os

import jax

if os.environ.get("MVAE_FORCE_CPU"):
    # In-process override, conftest-style. Env-level JAX_PLATFORMS=cpu is
    # NOT equivalent in this container: the axon sitecustomize takes a
    # different register() path under it and retry-loops on the relay
    # socket when the TPU tunnel is down (observed 2026-08-17).
    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jex_backend

    _jex_backend.clear_backends()

import numpy as np

from mvae_tpu.components import parse_components
from mvae_tpu.data import load_dataset
from mvae_tpu.data.base import ArrayDataset
from mvae_tpu.models import vae
from mvae_tpu.train.trainer import TrainConfig, Trainer

from parity.torch_trainer import (TorchTrainerReplica, TorchVAEReplica,
                                  epoch_noise)

CONFIGS = [
    ("e6", True),
    ("h6", False),       # learnable curvature: exercises burn-in + curv-Adam
    ("h2,s2,e2", True),
]


def run_config(spec, fixed, ds, args):
    comps = parse_components(spec, fixed_curvature=fixed, wraps=0)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     burnin_epochs=min(10, args.epochs // 2),
                     seed=args.seed, train_rng="threefry",
                     eval_binarize="fixed", likelihood_n=args.iwae_n,
                     eval_batch_size=512)
    run_dir = f"runs/r3_parity_{spec.replace(',', '-')}"
    tr = Trainer(cfg, ds, tc, run_dir=run_dir)
    jax_params0 = jax.tree.map(np.asarray, tr.params)

    model = TorchVAEReplica(jax_params0,
                            [{"kind": c.manifold.kind, "dim": c.dim,
                              "fixed_curvature": c.fixed_curvature}
                             for c in comps], beta=tc.beta)
    rep = TorchTrainerReplica(model, lr=tc.lr, curvature_lr=tc.curvature_lr,
                              burnin_epochs=tc.burnin_epochs,
                              steps_per_epoch=tr.steps_per_epoch)
    kinds = [(c.manifold.kind, c.dim) for c in comps]

    key, _init = jax.random.split(jax.random.key(tc.seed))
    t0 = time.time()
    last_t = None
    for epoch in range(tc.epochs):
        key, perm, noises = epoch_noise(
            key, kinds, epoch * tr.steps_per_epoch, tr.steps_per_epoch,
            tc.batch_size, ds.data_shape, len(ds.train))
        st_j = tr.train_one_epoch(epoch)
        last_t = rep.train_epoch(ds.train, perm, noises, tc.batch_size)
        print(f"[{spec}] epoch {epoch + 1}/{tc.epochs} "
              f"jax elbo={st_j['elbo']:.3f} torch elbo={last_t['elbo']:.3f}",
              flush=True)
    wall = time.time() - t0

    # SGD-noise sensitivity control: SAME init, SAME data order (the perm
    # keys ride the threefry session chain regardless of train_rng), but a
    # DIFFERENT binarization+reparam noise stream (rbg). The |jax-threefry
    # vs jax-rbg| delta is the pure sampling-noise movement of the optimum
    # — the scale against which the torch delta must be read.
    import dataclasses
    tc_rbg = dataclasses.replace(tc, train_rng="rbg")
    tr_rbg = Trainer(cfg, ds, tc_rbg, run_dir=run_dir + "_rbg")
    for epoch in range(tc.epochs):
        tr_rbg.train_one_epoch(epoch)

    # same instrument for all three weight sets
    ll_jax = tr.evaluate_log_likelihood("test")
    saved = tr.params
    tr.params = model.to_jax_params(saved)
    ll_torch = tr.evaluate_log_likelihood("test")
    tr.params = tr_rbg.params
    ll_rbg = tr.evaluate_log_likelihood("test")
    tr.params = saved

    out = {"spec": spec, "fixed_curvature": fixed, "epochs": tc.epochs,
           "train_elbo_jax": st_j["elbo"], "train_elbo_torch":
           last_t["elbo"], "iwae_jax_trained": ll_jax,
           "iwae_torch_trained": ll_torch,
           "iwae_jax_rbg_noise_control": ll_rbg,
           "delta_nats": abs(ll_jax - ll_torch),
           "noise_control_delta_nats": abs(ll_jax - ll_rbg),
           "wall_s": round(wall, 1)}
    if not fixed:
        out["final_K_jax"] = [float(np.asarray(
            c.manifold.curvature(np.asarray(cp["c_param"]))))
            if "c_param" in cp else 0.0
            for c, cp in zip(comps, jax.tree.map(np.asarray,
                                                 saved)["components"])]
        out["final_K_torch"] = [
            float(model.curvature(c).detach()) if "c_param" in c else 0.0
            for c in model.comps]
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_test", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--iwae_n", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="results/r3_training_parity.json")
    p.add_argument("--specs", default=None,
                   help="comma-separated subset, e.g. 'e6'")
    args = p.parse_args()

    full = load_dataset("mnist")
    ds = ArrayDataset(name=full.name, train=full.train[:args.n_train],
                      test=full.test[:args.n_test],
                      data_shape=full.data_shape, binarize=full.binarize,
                      synthetic=full.synthetic)
    results = []
    for spec, fixed in CONFIGS:
        if args.specs and spec not in args.specs.split(";"):
            continue
        results.append(run_config(spec, fixed, ds, args))
    import os
    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
