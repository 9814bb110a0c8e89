"""Localize the d2p2e2-learnK IWAE-eval NaN (r4 matrix row 15).

Training converged (100 finite epochs) but the final full-split IWAE-500
eval returned NaN on the TPU fused path. This probe restores the committed
checkpoint and computes per-example LLs over the full test split to find
the offending example(s), then dissects the forward pieces on them.

Usage: python scripts/probe_d2p2e2_eval_nan.py [--max 10000]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RUN = "runs/r4_matrix/d2p2e2-learnK_mnist"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.models import VAEConfig, vae
    from mvae_tpu.train import TrainConfig, Trainer

    components = parse_components("d2,p2,e2", fixed_curvature=False)
    dataset = load_dataset("mnist")
    model_cfg = VAEConfig(components=components,
                          data_shape=dataset.data_shape, arch="mlp",
                          h_dim=400)
    tc = TrainConfig(epochs=100, batch_size=256, seed=11,
                     eval_binarize="fixed")
    trainer = Trainer(model_cfg, dataset, tc, RUN)
    trainer.restore_checkpoint()
    print(f"restored step {int(trainer.step)}", flush=True)

    data = trainer._test_data
    if args.max:
        data = data[:args.max]
    bs = min(tc.eval_batch_size, len(data))
    batches, _, n = trainer._split_batches(data, bs)
    k_bins, k_models = trainer._eval_keys(batches.shape[0], bs)
    lls = np.asarray(trainer._eval_ll(trainer.params, batches, k_bins,
                                      k_models)).reshape(-1)[:n]
    bad = np.flatnonzero(~np.isfinite(lls))
    print(f"{n} examples, {bad.size} non-finite LLs at indices "
          f"{bad[:20].tolist()}", flush=True)
    print(f"mean over finite: {lls[np.isfinite(lls)].mean():.4f}")
    if bad.size == 0:
        print("no NaN reproduced — eval path is key/step dependent?")
        return

    # dissect the first bad example: per-chunk log-weights, both paths
    i = int(bad[0])
    bi, off = divmod(i, bs)
    x = batches[bi]
    from mvae_tpu.train.trainer import binarize_rows
    xb = binarize_rows(k_bins[bi], x, trainer.dataset.binarize)
    km = k_models[bi]
    for allow_fused in (True, False):
        lw = vae._log_weights(km, model_cfg, trainer.params, xb,
                              tc.likelihood_n, tc.likelihood_chunk,
                              allow_fused=allow_fused)
        lw = np.asarray(lw)[:, off]
        nb = np.flatnonzero(~np.isfinite(lw))
        print(f"allow_fused={allow_fused}: {nb.size}/{lw.size} non-finite "
              f"log-weights, first at {nb[:10].tolist()}; "
              f"min finite {lw[np.isfinite(lw)].min() if np.isfinite(lw).any() else 'n/a'}, "
              f"max finite {lw[np.isfinite(lw)].max() if np.isfinite(lw).any() else 'n/a'}",
              flush=True)

    # posterior heads at the bad example
    feats = vae.encode(model_cfg, trainer.params, xb[off:off + 1])
    raws = vae._fused_head_raw(model_cfg, trainer.params, feats)
    out = {}
    for ci, (comp, cp, raw) in enumerate(zip(model_cfg.components,
                                             trainer.params["components"],
                                             raws)):
        mu, scale, k = comp.posterior_params_from_raw(cp, raw)
        out[f"{comp.name}#{ci}"] = {
            "K": float(np.asarray(k)),
            "mu_norm": float(np.linalg.norm(np.asarray(mu))),
            "scale_min": float(np.asarray(scale).min()),
            "scale_max": float(np.asarray(scale).max()),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
