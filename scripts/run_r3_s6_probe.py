"""s6:wrapped outlier investigation (round-3 VERDICT #5).

RESULTS_r2_matrix showed s6:wrapped at -305.53 full-split IWAE-500 vs
-300.6 (s6:vmf) and -301.2 (e6) at 15 epochs — an unexplained 4-5 nat
worst row. This probe separates the candidate causes:

1. UNDERFIT: train both s6 posteriors to --epochs (default 100) and
   record the per-epoch test-ELBO trajectory + final IWAE (with
   --ll_repeats); if the wrapped row converges into family late, it was
   optimization speed, not capability.
2. ESTIMATOR SEMANTICS: evaluate the SAME trained wrapped model with
   wraps=1 (exact density) AND wraps=0 (principal branch) — a material
   gap means the headline number was (partly) wrap-image mass.
3. POSTERIOR GEOMETRY: record the trained sigma statistics — a wrapped
   normal on S^6 with sigma approaching the injectivity radius wastes
   density mass on wrap overlap that the vMF family does not pay.

Writes one JSON with everything the RESULTS_r3.md paragraph needs.

Usage: python scripts/run_r3_s6_probe.py [--epochs 100]
       [--out results/r3_s6_probe.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("MVAE_FORCE_CPU") == "1":
    # env vars alone don't stop a wedged axon tunnel from blocking the
    # first backend init (observed 2026-08-18: init HANGS instead of
    # erroring); the conftest dance — config update + clear_backends
    # before any backend touch — is the reliable CPU pin.
    jax.config.update("jax_platforms", "cpu")
    from jax.extend import backend as _jex_backend
    _jex_backend.clear_backends()

import jax.numpy as jnp
import numpy as np


def train_one(spec, ds, epochs, seed, ll_repeats):
    from mvae_tpu.components import parse_components
    from mvae_tpu.models import vae
    from mvae_tpu.train.trainer import TrainConfig, Trainer

    comps = parse_components(spec)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=epochs, batch_size=256, seed=seed,
                     eval_binarize="fixed", likelihood_n=500,
                     eval_batch_size=2048)
    tr = Trainer(cfg, ds, tc, run_dir=f"runs/r3_s6_probe/{spec.replace(':', '.')}")
    t0 = time.time()
    elbo_traj = []
    for epoch in range(epochs):
        tr.train_one_epoch(epoch)
        if (epoch + 1) % 5 == 0 or epoch < 5 or epoch + 1 == epochs:
            st = tr.evaluate_elbo("test")
            elbo_traj.append({"epoch": epoch + 1,
                              "test_elbo": round(st["elbo"], 3),
                              "test_kl": round(st["kl"], 3)})
            print(f"[{spec}] epoch {epoch+1}: test elbo "
                  f"{st['elbo']:.2f} kl {st['kl']:.2f}", flush=True)
    ll = tr.evaluate_log_likelihood("test", repeats=ll_repeats)
    wall = time.time() - t0
    return tr, cfg, {"spec": spec, "epochs": epochs,
                     "iwae500": round(ll, 3), "traj": elbo_traj,
                     "wall_s": round(wall, 1)}


def sigma_stats(tr, cfg):
    """Trained posterior scale statistics over the test split."""
    from mvae_tpu.models import vae as _vae
    params = tr.params
    x = tr._test_data[:2048]
    feats = _vae.encode(cfg, params, x)
    out = {}
    for comp, cp in zip(cfg.components, params["components"]):
        mu, scale, k = comp.posterior_params(cp, feats)
        s = np.asarray(jnp.broadcast_to(scale, scale.shape))
        out[comp.name + ":" + comp.posterior] = {
            "scale_mean": float(np.mean(s)), "scale_p95":
            float(np.percentile(s, 95)), "scale_max": float(np.max(s)),
            "K": float(np.asarray(comp.curvature(cp))),
        }
    return out


def eval_wraps_mode(tr, cfg, ds, wraps: int, seed: int):
    """Full-split IWAE of tr.params with the wrapped densities evaluated at
    the given wraps mode (fresh Trainer so the jit cache keys differ)."""
    from mvae_tpu.components import parse_components
    from mvae_tpu.models import vae
    from mvae_tpu.train.trainer import TrainConfig, Trainer

    comps = parse_components("s6:wrapped", wraps=wraps)
    cfg_w = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(batch_size=256, seed=seed, eval_binarize="fixed",
                     likelihood_n=500, eval_batch_size=2048)
    tr_w = Trainer(cfg_w, ds, tc,
                   run_dir=f"runs/r3_s6_probe/eval_wraps{wraps}")
    tr_w.params = tr.params
    return tr_w.evaluate_log_likelihood("test")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ll_repeats", type=int, default=2)
    ap.add_argument("--out", default="results/r3_s6_probe.json")
    args = ap.parse_args()

    from mvae_tpu.data import load_dataset
    ds = load_dataset("mnist")

    results = {}
    tr_w, cfg_w, res_w = train_one("s6:wrapped", ds, args.epochs,
                                   args.seed, args.ll_repeats)
    results["s6_wrapped"] = res_w
    results["s6_wrapped"]["sigma"] = sigma_stats(tr_w, cfg_w)
    results["s6_wrapped"]["iwae500_wraps0"] = round(
        eval_wraps_mode(tr_w, cfg_w, ds, 0, args.seed), 3)

    tr_v, cfg_v, res_v = train_one("s6", ds, args.epochs, args.seed,
                                   args.ll_repeats)
    results["s6_vmf"] = res_v
    results["s6_vmf"]["sigma"] = sigma_stats(tr_v, cfg_v)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "traj"}
                      for k, v in results.items()}))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
