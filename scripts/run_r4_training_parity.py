"""Training-dynamics parity for the HARD posterior families (round-4
VERDICT #5): s6:vmf (Wood rejection + implicit kappa-gradients),
d6:riemannian (quadrature-vs-closed-form log-Z, implicit sigma-gradients),
s6:wrapped (positive-K wrapped, post round-4 stability fix), and u6 with
LEARNABLE curvature initialized near zero so K crosses sign during training.

Protocol identical to scripts/run_r3_training_parity.py: train mvae_tpu's
Trainer and the from-scratch f64 torch replica (tests/parity/torch_trainer.py)
from the same initial weights on identical synthetic MNIST with identical
data order, binarization draws and reparameterization noise (the replica
mirrors the trainer's threefry chain, including the raw Wood / radial
rejection proposal streams), then evaluate BOTH trained weight sets with the
SAME instrument — full-split IWAE-500 under fixed binarization — and report
the delta against an SGD-noise control (same init/data, rbg noise stream).

wraps=0 (principal-branch reference estimator semantics) on every component.

Usage:  python scripts/run_r4_training_parity.py [--epochs 15]
        [--specs 's6:vmf;u6'] [--out results/r4_training_parity.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import os

import jax

if os.environ.get("MVAE_FORCE_CPU"):
    # In-process override, conftest-style (see run_r3_training_parity.py
    # for why env-level JAX_PLATFORMS=cpu misbehaves under the axon
    # sitecustomize when the TPU tunnel is down).
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

# (spec, fixed_curvature, TrainConfig overrides). The u6 row starts at
# K = +0.02 with a faster curvature schedule so the sign crossing happens
# within the 15-epoch parity horizon (16 steps/epoch * 5 post-burn-in
# epochs * curvature_lr must exceed init_k; Adam's normalized step ~ lr).
CONFIGS = [
    ("s6:wrapped", True, {}),
    ("s6:vmf", True, {}),
    ("d6:riemannian", True, {}),
    ("u6", False, {"init_k": 0.02, "curvature_lr": 1e-3}),
]


def run_config(spec, fixed, overrides, ds, args):
    comps = parse_components(spec, fixed_curvature=fixed, wraps=0)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     burnin_epochs=min(10, args.epochs // 2),
                     seed=args.seed, train_rng="threefry",
                     eval_binarize="fixed", likelihood_n=args.iwae_n,
                     eval_batch_size=512, **overrides)
    run_dir = f"runs/r4_parity_{spec.replace(',', '-').replace(':', '-')}"
    tr = Trainer(cfg, ds, tc, run_dir=run_dir)
    jax_params0 = jax.tree.map(np.asarray, tr.params)

    model = TorchVAEReplica(jax_params0,
                            [{"kind": c.manifold.kind, "dim": c.dim,
                              "posterior": c.posterior,
                              "fixed_curvature": c.fixed_curvature}
                             for c in comps], beta=tc.beta)
    rep = TorchTrainerReplica(model, lr=tc.lr, curvature_lr=tc.curvature_lr,
                              burnin_epochs=tc.burnin_epochs,
                              steps_per_epoch=tr.steps_per_epoch)
    kinds = [(c.manifold.kind, c.dim, c.posterior) for c in comps]

    key, _init = jax.random.split(jax.random.key(tc.seed))
    t0 = time.time()
    last_t = None
    k_trace_jax, k_trace_torch = [], []
    for epoch in range(tc.epochs):
        key, perm, noises = epoch_noise(
            key, kinds, epoch * tr.steps_per_epoch, tr.steps_per_epoch,
            tc.batch_size, ds.data_shape, len(ds.train))
        st_j = tr.train_one_epoch(epoch)
        last_t = rep.train_epoch(ds.train, perm, noises, tc.batch_size)
        if not fixed:
            cp = jax.tree.map(np.asarray, tr.params)["components"][0]
            k_trace_jax.append(float(np.asarray(
                comps[0].manifold.curvature(cp["c_param"]))))
            k_trace_torch.append(float(model.curvature(
                model.comps[0]).detach()))
        print(f"[{spec}] epoch {epoch + 1}/{tc.epochs} "
              f"jax elbo={st_j['elbo']:.3f} torch elbo={last_t['elbo']:.3f}"
              + (f" K_jax={k_trace_jax[-1]:+.4f}"
                 f" K_torch={k_trace_torch[-1]:+.4f}" if not fixed else ""),
              flush=True)
    wall = time.time() - t0

    # SGD-noise control: same init + data order, different (rbg) noise
    tc_rbg = dataclasses.replace(tc, train_rng="rbg")
    tr_rbg = Trainer(cfg, ds, tc_rbg, run_dir=run_dir + "_rbg")
    for epoch in range(tc.epochs):
        tr_rbg.train_one_epoch(epoch)

    ll_jax = tr.evaluate_log_likelihood("test")
    saved = tr.params
    tr.params = model.to_jax_params(saved)
    ll_torch = tr.evaluate_log_likelihood("test")
    tr.params = tr_rbg.params
    ll_rbg = tr.evaluate_log_likelihood("test")
    tr.params = saved

    out = {"spec": spec, "fixed_curvature": fixed, "epochs": tc.epochs,
           "overrides": {k: float(v) for k, v in overrides.items()},
           "train_elbo_jax": st_j["elbo"], "train_elbo_torch":
           last_t["elbo"], "iwae_jax_trained": ll_jax,
           "iwae_torch_trained": ll_torch,
           "iwae_jax_rbg_noise_control": ll_rbg,
           "delta_nats": abs(ll_jax - ll_torch),
           "noise_control_delta_nats": abs(ll_jax - ll_rbg),
           "wall_s": round(wall, 1)}
    if not fixed:
        out["k_trace_jax"] = [round(v, 5) for v in k_trace_jax]
        out["k_trace_torch"] = [round(v, 5) for v in k_trace_torch]
        out["final_K_jax"] = k_trace_jax[-1]
        out["final_K_torch"] = k_trace_torch[-1]
        out["crossed_zero_jax"] = (min(k_trace_jax) < 0 < max(
            [overrides.get("init_k", 1.0)] + k_trace_jax))
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
    p.add_argument("--out", default="results/r4_training_parity.json")
    p.add_argument("--specs", default=None,
                   help="semicolon-separated subset, e.g. 's6:vmf;u6'")
    args = p.parse_args()

    full = load_dataset("mnist")
    ds = ArrayDataset(name=full.name, train=full.train[:args.n_train],
                      test=full.test[:args.n_test],
                      data_shape=full.data_shape, binarize=full.binarize,
                      synthetic=full.synthetic)
    results = []
    for spec, fixed, overrides in CONFIGS:
        if args.specs and spec not in args.specs.split(";"):
            continue
        results.append(run_config(spec, fixed, overrides, ds, args))
    os.makedirs("results", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
