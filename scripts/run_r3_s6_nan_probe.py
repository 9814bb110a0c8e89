"""Root-cause probe for the s6:wrapped NaN at matrix settings (round-3).

RESULTS_r3_matrix first run: s6:wrapped @ seed 11, B=256, burnin 10
collapsed (epoch-mean KL negative by epoch 6) and went NaN at epoch ~28,
while the earlier 100-epoch probe (seed 0 defaults) converged to -299.888.

This probe replays the exact matrix settings and, after every epoch,
reports on a fixed probe batch:
  * sigma-head stats (min/mean/max) and mu-head tangent norm max,
  * the principal-preimage radius distribution vs the injectivity
    radius pi*R (fraction of samples within 1% of the singular shell),
  * loss + max-abs gradient leaf under BOTH tail implementations
    (fused Pallas kernel pair vs the jnp library chain) so a
    kernel-vs-library divergence is caught the epoch it appears.

Usage: python scripts/run_r3_s6_nan_probe.py [--epochs 40]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", default="results/r3_s6_nan_probe.json")
    args = ap.parse_args()

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.data.base import binarize_batch
    from mvae_tpu.models import vae
    from mvae_tpu.ops import stable
    from mvae_tpu.train.trainer import TrainConfig, Trainer

    ds = load_dataset("mnist")
    comps = parse_components("s6:wrapped")
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=256, seed=args.seed,
                     burnin_epochs=10, eval_binarize="fixed",
                     likelihood_n=500, eval_batch_size=2048)
    tr = Trainer(cfg, ds, tc, run_dir="runs/r3_s6_nan_probe")

    probe_x = binarize_batch(
        jax.random.key(123),
        jnp.asarray(ds.train[:1024], jnp.float32), True)
    comp = cfg.components[0]
    n = comp.dim

    @jax.jit
    def head_stats(params):
        feats = vae.encode(cfg, params, probe_x)
        raw = vae._fused_head_raw(cfg, params, feats)[0]
        mu_tan, raw_sig = raw[..., :n], raw[..., n:]
        sig = jax.nn.softplus(raw_sig)
        kv = comp.curvature(params["components"][0])
        # principal sample radii for a fresh draw (same math as training)
        v = sig * jax.random.normal(jax.random.key(7), sig.shape)
        man = comp.manifold
        mu = man.exp_map_mu0(mu_tan, kv)
        z = man.sample_projection_mu0(v, mu, kv)
        vp = man.inverse_sample_projection_mu0(z, mu, kv)
        rp = stable.safe_norm(vp)
        rmax = jnp.pi / jnp.sqrt(jnp.maximum(kv, 1e-20))
        return {"sig_min": sig.min(), "sig_mean": sig.mean(),
                "sig_max": sig.max(),
                "mu_tan_max": jnp.linalg.norm(mu_tan, axis=-1).max(),
                "k": kv,
                "rp_max_frac": (rp / rmax).max(),
                "rp_shell_frac": (rp > 0.99 * rmax).mean()}

    def make_grad_stats(allow_fused):
        def scalar_loss(p):
            loss, _ = vae.loss_fn(jax.random.key(99), cfg, p, probe_x,
                                  allow_fused=allow_fused)
            return loss

        @jax.jit
        def stats(params):
            loss, g = jax.value_and_grad(scalar_loss)(params)
            leaves = jax.tree.leaves(g)
            gmax = jnp.max(jnp.stack([jnp.max(jnp.abs(x)) for x in leaves]))
            return loss, gmax
        return stats

    # jitted once each (advisor r3: the un-jitted per-epoch value_and_grad
    # eagerly dispatched the full loss+grad twice per epoch on this 1-core
    # host)
    _gs_fused = make_grad_stats(True)
    _gs_jnp = make_grad_stats(False)

    def grad_stats(params, allow_fused):
        loss, gmax = (_gs_fused if allow_fused else _gs_jnp)(params)
        return float(loss), float(gmax)

    rows = []
    for epoch in range(args.epochs):
        st = tr.train_one_epoch(epoch)
        hs = {k2: float(v) for k2, v in head_stats(tr.params).items()}
        lf, gf = grad_stats(tr.params, True)
        lj, gj = grad_stats(tr.params, False)
        row = dict(epoch=epoch + 1, train_elbo=round(st["elbo"], 3),
                   train_kl=round(st["kl"], 3),
                   loss_fused=round(lf, 3), gmax_fused=gf,
                   loss_jnp=round(lj, 3), gmax_jnp=gj,
                   **{k2: round(v, 6) for k2, v in hs.items()})
        rows.append(row)
        print(json.dumps(row), flush=True)
        if not np.isfinite(st["elbo"]):
            print("NaN reached; stopping", flush=True)
            break
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
