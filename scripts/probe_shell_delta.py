"""A/B the wrapped-logdet mollifier width on s6:wrapped convergence.

Hypothesis (r4 parity): the f64 torch replica (EXACT log|sin| forms)
converges a few nats faster than the f32 jax trainer at 50 epochs on
s6:wrapped; if the SHELL_DELTA mollifier is the drag, narrowing it should
close the gap. Run me twice:

    MVAE_SHELL_DELTA=1e-3 python scripts/probe_shell_delta.py   # baseline
    MVAE_SHELL_DELTA=1e-5 python scripts/probe_shell_delta.py

Settings mirror scripts/run_r4_training_parity.py (seed 42, wraps=0,
n_train 2048, B 128, 50 epochs) so the 1e-3 run must reproduce the
committed iwae_jax_trained = -301.727.
"""
from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from mvae_tpu.components import parse_components
from mvae_tpu.data import load_dataset
from mvae_tpu.data.base import ArrayDataset
from mvae_tpu.models import vae
from mvae_tpu.ops import stable
from mvae_tpu.train.trainer import TrainConfig, Trainer


def main():
    delta = stable.SHELL_DELTA
    full = load_dataset("mnist")
    ds = ArrayDataset(name=full.name, train=full.train[:2048],
                      test=full.test[:1024], data_shape=full.data_shape,
                      binarize=full.binarize, synthetic=full.synthetic)
    comps = parse_components("s6:wrapped", fixed_curvature=True, wraps=0)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=50, batch_size=128, burnin_epochs=10, seed=42,
                     train_rng="threefry", eval_binarize="fixed",
                     likelihood_n=500, eval_batch_size=512)
    tr = Trainer(cfg, ds, tc, run_dir=f"runs/r4_shell_delta_{delta:g}")
    for epoch in range(tc.epochs):
        st = tr.train_one_epoch(epoch)
        if (epoch + 1) % 10 == 0:
            print(f"delta={delta:g} epoch {epoch + 1}: "
                  f"elbo {st['elbo']:.3f} kl {st['kl']:.3f}", flush=True)
    ll = tr.evaluate_log_likelihood("test")
    out = {"shell_delta": delta, "iwae": ll,
           "train_elbo": float(st["elbo"])}
    print(json.dumps(out))
    path = Path("results/r4_shell_delta_probe.jsonl")
    path.parent.mkdir(exist_ok=True)
    with path.open("a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
