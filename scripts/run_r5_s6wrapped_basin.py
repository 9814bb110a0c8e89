"""Which basin is the reference family's s6:wrapped optimum? (VERDICT r4 #2)

The round-4 matrix's s6:wrapped row converged to -301.33 while every
sibling sits at -299.5..-300.6, and the round-4 parity twin mirrors the
sigma cap (tests/parity/torch_trainer.py::cap_sigma_positive_k_t), so the
0.077-nat training-dynamics parity is structurally blind to any
cap-induced optimum shift. This script answers the question directly:

  * train the f64 torch replica UNCAPPED at matrix settings (seed 11,
    B=256, full synthetic MNIST, 100 epochs, burn-in 10) — the reference
    family's regime needs no cap to survive in f64;
  * train the f64 torch replica CAPPED at the same settings — the within-
    f64 A/B that isolates the cap's effect on the optimum;
  * evaluate BOTH trained weight sets on the jax full-split IWAE-500
    instrument (fixed binarization, --ll_repeats passes), each under its
    OWN model class (capped/uncapped q; principal-branch wraps=0 — the
    reference's estimator semantics, which is also what the torch twin
    implements); uncapped weight sets are additionally evaluated with a
    wraps=8 exact-density q, because a truncated wrap sum UNDERestimates
    log q at large sigma and would inflate the IWAE bound — the very
    exploit the cap exists to block (results/r4_nan_probe_s6-wrapped.json);
  * report the trained sigma statistics (max/mean sigma vs the pi/sqrt(K)
    injectivity cap over the test split) so "the posterior lives at the
    cap" is measured, not asserted.

--bias_probe <run_dir> additionally quantifies the cap's ESTIMATOR-side
bias at a trained capped head state (VERDICT r4 weak #4): restore that
checkpoint and evaluate IWAE at the SAME weights with (a) the capped
training q and (b) the uncapped wraps=8 q. Both are valid lower-bound
estimators of the same log p(x) (same generative model, different
variational family member), so the delta bounds what the cap costs at the
state where the posterior actually lives.

Usage:
    python scripts/run_r5_s6wrapped_basin.py [--epochs 100]
        [--variants uncapped,capped] [--bias_probe runs/r5_matrix/...]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import dataclasses

import jax
import numpy as np

from mvae_tpu.components import parse_components
from mvae_tpu.data import load_dataset
from mvae_tpu.models import vae
from mvae_tpu.train.trainer import TrainConfig, Trainer

from parity.torch_trainer import (TorchTrainerReplica, TorchVAEReplica,
                                  epoch_noise)


LIKELIHOOD_N = 500  # --smoke drops this to 50


def build_eval_trainer(ds, args, sigma_cap: bool, wraps: int, run_dir: str):
    """A Trainer used purely as the IWAE eval instrument for a given model
    class (capped/uncapped q, wrap-image count)."""
    comps = parse_components("s6:wrapped", fixed_curvature=True, wraps=wraps)
    comps = tuple(dataclasses.replace(c, sigma_cap=sigma_cap) for c in comps)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     burnin_epochs=args.burnin, seed=args.seed,
                     eval_binarize="fixed", likelihood_n=LIKELIHOOD_N,
                     train_rng="threefry")
    return Trainer(cfg, ds, tc, run_dir=run_dir), cfg, tc


def sigma_stats(cfg, params, ds, batch=2048):
    """Trained posterior-scale statistics vs the injectivity cap over test
    examples (binarized with the same fixed keys the eval uses)."""
    from mvae_tpu.components.component import cap_sigma_positive_k
    import jax.numpy as jnp
    comp = cfg.components[0]
    x = jnp.asarray(ds.test[:batch])
    # fixed per-example binarization (same convention as Trainer._eval_keys)
    base = jax.random.key(0xB1A ^ 11)
    ub = jax.vmap(lambda i: jax.random.uniform(
        jax.random.fold_in(base, i), x.shape[1:]))(
        jnp.arange(len(x), dtype=jnp.uint32))
    xb = (ub < x).astype(jnp.float32)
    feats = vae.encode(cfg, params, xb)
    cp = params["components"][0]
    raw_sig = feats @ cp["w_sig"] + cp["b_sig"]
    sigma_raw = jax.nn.softplus(raw_sig)
    k = comp.curvature(cp)
    cap = float(jnp.pi / jnp.sqrt(jnp.maximum(k, 1e-12)))
    sig_eff = cap_sigma_positive_k(sigma_raw, k)
    return {
        "k": float(k), "cap_pi_over_sqrt_k": cap,
        "sigma_raw_mean": float(jnp.mean(sigma_raw)),
        "sigma_raw_max": float(jnp.max(sigma_raw)),
        "sigma_raw_over_cap_mean": float(jnp.mean(sigma_raw)) / cap,
        "sigma_raw_over_cap_max": float(jnp.max(sigma_raw)) / cap,
        "frac_rows_above_cap_third":
            float(jnp.mean((sigma_raw > cap / 3).any(-1))),
        "sigma_capped_mean": float(jnp.mean(sig_eff)),
    }


def train_torch_variant(ds, args, sigma_cap: bool):
    """Train the f64 torch replica at matrix settings; returns (model,
    per-epoch elbo trace, wall)."""
    comps = parse_components("s6:wrapped", fixed_curvature=True, wraps=0)
    comps = tuple(dataclasses.replace(c, sigma_cap=sigma_cap) for c in comps)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     burnin_epochs=args.burnin, seed=args.seed,
                     train_rng="threefry")
    # init weights from the jax initializer (same family as the matrix run)
    params0 = vae.init_params(
        jax.random.split(jax.random.key(tc.seed))[1], cfg)
    params0 = jax.tree.map(np.asarray, params0)
    steps_per_epoch = len(ds.train) // tc.batch_size

    model = TorchVAEReplica(params0,
                            [{"kind": c.manifold.kind, "dim": c.dim,
                              "posterior": c.posterior,
                              "fixed_curvature": c.fixed_curvature,
                              "sigma_cap": c.sigma_cap}
                             for c in comps], beta=tc.beta)
    rep = TorchTrainerReplica(model, lr=tc.lr, curvature_lr=tc.curvature_lr,
                              burnin_epochs=tc.burnin_epochs,
                              steps_per_epoch=steps_per_epoch)
    kinds = [(c.manifold.kind, c.dim, c.posterior) for c in comps]
    key, _init = jax.random.split(jax.random.key(tc.seed))
    trace, t0 = [], time.time()
    for epoch in range(tc.epochs):
        key, perm, noises = epoch_noise(
            key, kinds, epoch * steps_per_epoch, steps_per_epoch,
            tc.batch_size, ds.data_shape, len(ds.train))
        st = rep.train_epoch(ds.train, perm, noises, tc.batch_size)
        trace.append(round(st["elbo"], 4))
        if not math.isfinite(st["elbo"]):
            print(f"[{'capped' if sigma_cap else 'uncapped'}] NON-FINITE "
                  f"at epoch {epoch + 1}; aborting variant", flush=True)
            break
        print(f"[torch {'capped' if sigma_cap else 'uncapped'}] epoch "
              f"{epoch + 1}/{tc.epochs} elbo={st['elbo']:.3f} "
              f"bce={st['bce']:.3f} kl={st['kl']:.3f}", flush=True)
    return model, cfg, trace, time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--burnin", type=int, default=10)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--ll_repeats", type=int, default=2)
    p.add_argument("--variants", default="uncapped,capped")
    p.add_argument("--bias_probe", default=None,
                   help="run_dir of a trained CAPPED jax matrix run: "
                        "evaluate capped-vs-uncapped q at its checkpoint")
    p.add_argument("--out", default="results/r5_s6wrapped_basin.json")
    p.add_argument("--smoke", action="store_true",
                   help="tiny end-to-end validation of the script itself: "
                        "2048 train / 512 test examples, IWAE-50 — checks "
                        "every code path before the multi-hour real run")
    p.add_argument("--train_only", action="store_true",
                   help="train the torch variants and save their weights "
                        "(runs/r5_basin_weights_<variant>.npz) without the "
                        "jax IWAE evals — for when the TPU relay is down; "
                        "finish later with --eval_saved. Forces the CPU "
                        "backend (epoch_noise is threefry — identical "
                        "draws on any backend).")
    p.add_argument("--eval_saved", action="store_true",
                   help="skip training: load each variant's saved weights "
                        "and run the jax IWAE evals + sigma stats")
    args = p.parse_args()

    if args.train_only or os.environ.get("MVAE_FORCE_CPU") == "1":
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        from jax.extend import backend as _eb
        _eb.clear_backends()

    ds = load_dataset("mnist")
    if args.smoke:
        import dataclasses as _dc
        ds = _dc.replace(ds, train=ds.train[:2048], test=ds.test[:512])
        global LIKELIHOOD_N
        LIKELIHOOD_N = 50
    out = {"settings": {"epochs": args.epochs,
                        "batch_size": args.batch_size,
                        "seed": args.seed, "burnin": args.burnin,
                        "n_train": len(ds.train), "n_test": len(ds.test),
                        "estimator": "wraps=0 principal branch (reference "
                                     "semantics); uncapped also wraps=8"},
           "variants": {}}

    for variant in args.variants.split(","):
        if not variant:
            continue
        sigma_cap = variant == "capped"
        wpath = Path(f"runs/r5_basin_weights_{variant}.npz")
        if args.eval_saved:
            flat = dict(np.load(wpath, allow_pickle=False))
            row = json.loads(flat.pop("__row__").item())
            model, trace = None, None
        else:
            model, cfg_t, trace, wall = train_torch_variant(
                ds, args, sigma_cap)
            row = {"train_elbo_trace_tail": trace[-10:],
                   "train_elbo_final": trace[-1] if trace else None,
                   "finished": len(trace) == args.epochs,
                   "train_wall_s": round(wall, 1)}
        # evaluate under the variant's own model class
        ev, cfg_e, _tc = build_eval_trainer(
            ds, args, sigma_cap=sigma_cap, wraps=0,
            run_dir=f"runs/r5_basin_eval_{variant}")
        if args.eval_saved:
            leaves, treedef = jax.tree_util.tree_flatten(ev.params)
            ev.params = jax.tree_util.tree_unflatten(
                treedef, [jnp_like for jnp_like in
                          (flat[f"leaf_{i}"] for i in range(len(leaves)))])
        else:
            ev.params = model.to_jax_params(
                jax.tree.map(np.asarray, ev.params))
            leaves, _ = jax.tree_util.tree_flatten(
                jax.tree.map(np.asarray, ev.params))
            np.savez(wpath, __row__=json.dumps(row),
                     **{f"leaf_{i}": l for i, l in enumerate(leaves)})
            print(f"saved weights -> {wpath}", flush=True)
        if args.train_only:
            out["variants"][f"torch_f64_{variant}"] = row
            print(json.dumps({variant: row}, default=str), flush=True)
            os.makedirs("results", exist_ok=True)
            Path(args.out).write_text(json.dumps(out, indent=1, default=str))
            continue
        row["iwae500_wraps0"] = ev.evaluate_log_likelihood(
            "test", repeats=args.ll_repeats)
        row["sigma_stats"] = sigma_stats(cfg_e, ev.params, ds)
        # wraps=8 exact-q audit for BOTH variants: a truncated wrap sum
        # underestimates log q at large sigma and so INFLATES the IWAE
        # bound — the first capped-f64 run proved this matters for capped
        # too (it farmed sigma_raw to 6.3x the cap and self-reported a
        # fake -295.5 under wraps=0; same mechanism the cap was meant to
        # block, running stably UNDER the cap's saturation).
        ev8, _cfg8, _ = build_eval_trainer(
            ds, args, sigma_cap=sigma_cap, wraps=8,
            run_dir=f"runs/r5_basin_eval_{variant}_w8")
        ev8.params = ev.params
        row["iwae500_wraps8_exact_q"] = ev8.evaluate_log_likelihood(
            "test", repeats=args.ll_repeats)
        out["variants"][f"torch_f64_{variant}"] = row
        print(json.dumps({variant: row}, default=str), flush=True)
        os.makedirs("results", exist_ok=True)
        Path(args.out).write_text(json.dumps(out, indent=1, default=str))

    if args.bias_probe:
        # VERDICT r4 weak #4: estimator-side cap bias at a trained capped
        # head state — same weights, capped training q vs uncapped exact q.
        probe = {}
        for tag, (cap, wraps) in {"capped_wraps1_training_q": (True, 1),
                                  "uncapped_wraps8_exact_q": (False, 8)}.items():
            ev, cfg_e, _tc = build_eval_trainer(
                ds, args, sigma_cap=cap, wraps=wraps,
                run_dir=args.bias_probe)  # restores ITS checkpoint
            ev.restore_checkpoint()
            probe[tag] = ev.evaluate_log_likelihood(
                "test", repeats=args.ll_repeats)
            if cap:
                probe["sigma_stats"] = sigma_stats(cfg_e, ev.params, ds)
        probe["delta_nats"] = (probe["uncapped_wraps8_exact_q"]
                               - probe["capped_wraps1_training_q"])
        out["bias_probe_at_capped_checkpoint"] = {
            "run_dir": args.bias_probe, **probe}
        Path(args.out).write_text(json.dumps(out, indent=1, default=str))
        print(json.dumps(out["bias_probe_at_capped_checkpoint"]),
              flush=True)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
