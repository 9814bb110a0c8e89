"""Round-4 root-cause probe for the positive-K wrapped NaN (VERDICT r3 #1).

The committed round-3 matrix (seed 11, B=256, burnin 10, rbg train RNG)
kills two judged configs with KL spirals ending in NaN:
  * s6:wrapped / mnist      — NaN at epoch ~27 (jnp tail path: the fused
                              tail kernel does not cover wrapped-on-s)
  * d2,p2,e2 learnK / mnist — NaN at epoch ~44 (fused tail path), the p2
                              positive-K wrapped component spiking first
Both paths dying implicates the SHARED estimator math near the positive-K
injectivity shell r = pi * R, not one kernel.

This probe replays the exact matrix trajectory and, the moment an epoch's
stats go non-finite, REWINDS to the last finite (params, opt_state, key)
snapshot and replays that epoch STEP BY STEP with the trainer's exact key
discipline, finding the first step whose loss/grads/params go non-finite.
At that step it dumps per-component forward intermediates (sigma heads,
principal radii vs pi*R, log q / log p branch terms) and saves an .npz
reproducer (params + batch + keys) for the regression test.

Usage:
    python scripts/run_r4_nan_probe.py --model s6:wrapped [--epochs 40]
    python scripts/run_r4_nan_probe.py --model d2,p2,e2 --learn_k --epochs 60
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def tmap(f, t):
    return jax.tree.map(f, t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="s6:wrapped")
    ap.add_argument("--learn_k", action="store_true")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    tag = args.model.replace(",", "").replace(":", "-")
    out = args.out or f"results/r4_nan_probe_{tag}.json"

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.data.base import binarize_batch
    from mvae_tpu.models import vae
    from mvae_tpu.ops import stable
    from mvae_tpu.train import trainer as trainer_mod
    from mvae_tpu.train.trainer import TrainConfig, Trainer

    ds = load_dataset("mnist")
    comps = parse_components(args.model, fixed_curvature=not args.learn_k)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     seed=args.seed, burnin_epochs=10, eval_binarize="fixed",
                     likelihood_n=500, eval_batch_size=2048)
    tr = Trainer(cfg, ds, tc, run_dir=f"runs/r4_nan_probe_{tag}")

    # --- per-epoch head/geometry diagnostics on a fixed probe batch ----------
    probe_x = binarize_batch(
        jax.random.key(123),
        jnp.asarray(ds.train[:1024], jnp.float32), True)

    @jax.jit
    def diag(params):
        feats = vae.encode(cfg, params, probe_x)
        raws = vae._fused_head_raw(cfg, params, feats)
        outrow = {}
        key = jax.random.key(7)
        for i, (comp, cp, raw) in enumerate(
                zip(cfg.components, params["components"], raws)):
            nm = f"{comp.name}#{i}"
            if comp.posterior != "wrapped":
                continue
            man = comp.manifold
            nd = comp.dim
            mu_tan = raw[..., :nd]
            sig = jax.nn.softplus(raw[..., nd:])
            kv = comp.curvature(cp)
            v = sig * jax.random.normal(jax.random.fold_in(key, i),
                                        mu_tan.shape)
            mu = man.exp_map_mu0(mu_tan, kv)
            z = man.sample_projection_mu0(v, mu, kv)
            vp = man.inverse_sample_projection_mu0(z, mu, kv)
            rp = stable.safe_norm(vp)
            rmax = jnp.pi / jnp.sqrt(jnp.maximum(kv, 1e-20))
            from mvae_tpu.distributions import wrapped_normal
            lq = wrapped_normal._log_prob_from_principal(man, vp, sig, kv,
                                                         comp.wraps)
            lp = wrapped_normal.log_prob_mu0(man, z, jnp.ones((), z.dtype),
                                             kv, comp.wraps)
            outrow.update({
                f"{nm}/k": kv,
                f"{nm}/sig_min": sig.min(), f"{nm}/sig_max": sig.max(),
                f"{nm}/mu_tan_max": stable.safe_norm(mu_tan).max(),
                f"{nm}/rp_frac_max": (rp / rmax).max(),
                f"{nm}/shell_999": (rp > 0.999 * rmax).mean(),
                f"{nm}/lq_max": lq.max(), f"{nm}/lq_min": lq.min(),
                f"{nm}/lp_max": lp.max(), f"{nm}/lp_min": lp.min(),
            })
        return outrow

    # --- exact-replay single step (the trainer's one_step, un-scanned) -------
    def make_step(allow_fused):
        def scalar_loss(p, k_model, x):
            return vae.loss_fn(k_model, cfg, p, x, tc.beta,
                               allow_fused=allow_fused)

        @jax.jit
        def step(params, opt_state, step_no, x, key0):
            key = jax.random.fold_in(key0, step_no)
            k_bin, k_model = jax.random.split(key)
            x = binarize_batch(k_bin, x, ds.binarize)
            (loss, stats), grads = jax.value_and_grad(
                scalar_loss, has_aux=True)(params, k_model, x)
            grads = trainer_mod._mask_curvature_grads(
                grads, cfg.components, step_no,
                tc.burnin_epochs * tr.steps_per_epoch)
            updates, opt_state2 = tr.tx.update(grads, opt_state, params)
            params2 = jax.tree.map(lambda p, u: p + u, params, updates)
            gmax = {k2: jnp.max(jnp.stack([jnp.max(jnp.abs(le)) for le in
                                           jax.tree.leaves(g)]))
                    for k2, g in grads.items()}
            finite = jnp.all(jnp.stack(
                [jnp.all(jnp.isfinite(le)) for le in
                 jax.tree.leaves((loss, grads, params2))]))
            return params2, opt_state2, loss, stats, gmax, finite
        return step

    step_fused = make_step(True)
    step_jnp = make_step(False)

    def epoch_inputs(snap_key):
        """Recompute (perm, k_epoch) exactly as Trainer.train_one_epoch."""
        key = jax.random.wrap_key_data(snap_key)
        _, k_perm, k_epoch = jax.random.split(key, 3)
        k_epoch = tr._train_key(k_epoch)
        n = tr.steps_per_epoch * tc.batch_size
        perm = jax.random.permutation(k_perm, len(tr._train_data))[:n]
        return perm, k_epoch

    def replay_epoch(snap, first_bad_epoch):
        """Step-by-step replay of the first non-finite epoch."""
        params = tmap(jnp.asarray, snap["params"])
        opt_state = tmap(jnp.asarray, snap["opt_state"])
        perm, k_epoch = epoch_inputs(snap["key"])
        data = jnp.take(tr._train_data, perm, axis=0).reshape(
            (tr.steps_per_epoch, tc.batch_size) + tr._train_data.shape[1:])
        step_no = jnp.asarray(snap["step"], jnp.int32)
        for i in range(tr.steps_per_epoch):
            x = data[i]
            p2, o2, loss, stats, gmax, finite = step_fused(
                params, opt_state, step_no, x, k_epoch)
            if not bool(finite):
                print(f"\nFIRST NON-FINITE: epoch {first_bad_epoch} "
                      f"step {i} (global {int(step_no)})", flush=True)
                row = {"epoch": first_bad_epoch, "step_in_epoch": i,
                       "global_step": int(step_no),
                       "loss": float(loss),
                       "gmax": {k2: float(v) for k2, v in gmax.items()}}
                # compare against the jnp tail at the same step
                _, _, loss_j, _, gmax_j, finite_j = step_jnp(
                    params, opt_state, step_no, x, k_epoch)
                row["jnp_loss"] = float(loss_j)
                row["jnp_finite"] = bool(finite_j)
                row["jnp_gmax"] = {k2: float(v) for k2, v in gmax_j.items()}
                # forward intermediates at the failing batch
                key = jax.random.fold_in(k_epoch, step_no)
                k_bin, k_model = jax.random.split(key)
                xb = binarize_batch(k_bin, x, ds.binarize)
                row["fwd"] = fwd_intermediates(params, xb, k_model)
                # reproducer for the regression test
                rp = Path(f"results/r4_nan_repro_{tag}.npz")
                flat, treedef = jax.tree.flatten(
                    tmap(np.asarray, (params, opt_state)))
                np.savez(rp, x=np.asarray(xb),
                         key_epoch=np.asarray(
                             jax.random.key_data(k_epoch)),
                         step=int(step_no),
                         **{f"leaf{j}": a for j, a in enumerate(flat)})
                print("reproducer saved:", rp, flush=True)
                return row
            params, opt_state = p2, o2
            step_no = step_no + 1
        print("replay stayed finite?!", flush=True)
        return {"epoch": first_bad_epoch, "replay_finite": True}

    def fwd_intermediates(params, xb, k_model):
        """Per-component wrapped-chain internals at the failing batch."""
        from mvae_tpu.distributions import wrapped_normal

        @jax.jit
        def run(params):
            feats = vae.encode(cfg, params, xb)
            raws = vae._fused_head_raw(cfg, params, feats)
            keys = jax.random.split(k_model, len(cfg.components))
            outrow = {}
            for i, (comp, cp, raw, ck) in enumerate(
                    zip(cfg.components, params["components"], raws, keys)):
                nm = f"{comp.name}#{i}"
                if comp.posterior != "wrapped":
                    continue
                man = comp.manifold
                nd = comp.dim
                mu_tan = raw[..., :nd]
                sig = jax.nn.softplus(raw[..., nd:])
                kv = comp.curvature(cp)
                shape = mu_tan.shape
                v = sig * jax.random.normal(ck, shape, dtype=mu_tan.dtype)
                mu = man.exp_map_mu0(mu_tan, kv)
                z = man.sample_projection_mu0(v, mu, kv)
                vp = man.inverse_sample_projection_mu0(z, mu, kv)
                rp_ = stable.safe_norm(vp)
                rmax = jnp.pi / jnp.sqrt(jnp.maximum(kv, 1e-20))
                lq = wrapped_normal._log_prob_from_principal(
                    man, vp, sig, kv, comp.wraps)
                lp = wrapped_normal.log_prob_mu0(
                    man, z, jnp.ones((), z.dtype), kv, comp.wraps)
                outrow.update({
                    f"{nm}/k": kv,
                    f"{nm}/sig_min": sig.min(), f"{nm}/sig_max": sig.max(),
                    f"{nm}/mu_tan_max": stable.safe_norm(mu_tan).max(),
                    f"{nm}/draw_r_max": stable.safe_norm(v).max(),
                    f"{nm}/rp_frac_max": (rp_ / rmax).max(),
                    f"{nm}/shell_999": (rp_ > 0.999 * rmax).mean(),
                    f"{nm}/lq_nan": (~jnp.isfinite(lq)).sum(),
                    f"{nm}/lp_nan": (~jnp.isfinite(lp)).sum(),
                    f"{nm}/lq_max": jnp.nanmax(lq),
                    f"{nm}/lp_max": jnp.nanmax(lp),
                    f"{nm}/z_nan": (~jnp.isfinite(z)).sum(),
                    f"{nm}/mu_nan": (~jnp.isfinite(mu)).sum(),
                })
            return outrow
        return {k2: float(v) for k2, v in run(params).items()}

    # --- main trajectory loop ------------------------------------------------
    rows = []
    snap = None
    for epoch in range(args.epochs):
        snap_next = {
            "params": tmap(np.asarray, tr.params),
            "opt_state": tmap(np.asarray, tr.opt_state),
            "key": np.asarray(jax.random.key_data(tr.key)),
            "step": int(tr.step),
        }
        st = tr.train_one_epoch(epoch)
        # mirror Trainer.fit's key chain EXACTLY: fit() runs evaluate_elbo
        # after every train epoch, which advances self.key — without this
        # the probe walks a different SGD-noise trajectory than the matrix
        # run and (observed) misses the seed-dependent NaN
        ev = tr.evaluate_elbo("test")
        row = {"epoch": epoch + 1, "train_elbo": round(float(st["elbo"]), 3),
               "train_kl": round(float(st["kl"]), 3),
               "test_elbo": round(float(ev["elbo"]), 3),
               "test_kl": round(float(ev["kl"]), 3)}
        if np.isfinite(st["elbo"]):
            snap = snap_next
            row.update({k2: round(float(v), 6)
                        for k2, v in diag(tr.params).items()})
            rows.append(row)
            print(json.dumps(row), flush=True)
        else:
            print(f"epoch {epoch + 1} NON-FINITE (elbo={st['elbo']}); "
                  "rewinding to last finite snapshot", flush=True)
            bad = replay_epoch(snap_next, epoch + 1)
            rows.append({**row, "postmortem": bad})
            break
    Path(out).parent.mkdir(exist_ok=True)
    Path(out).write_text(json.dumps(rows, indent=1))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
