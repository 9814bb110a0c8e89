"""Training-dynamics parity: f64 PyTorch replica trainer vs mvae_tpu.

Closes the last in-env de-risk of the 0.1-nat north star (round-2 VERDICT
missing #1): the estimator oracle (tests/parity/) proved the *evaluator*
matches at fixed weights; this script proves the *optimum* matches — that
Adam(1e-3) + curvature burn-in + single-sample MC-KL ELBO + the same init
drive both frameworks to models whose full-split IWAE-500 agree within the
0.1-nat target.

Protocol (both sides see IDENTICAL data):

* one synthetic MNIST corpus (repo loader, deterministic CRC32 seeds);
* per epoch, numpy generates the shuffle permutation AND the dynamic
  binarization once — both trainers consume the same binarized batches,
  so the only stochastic difference is the reparameterization noise
  (torch vs jax normal streams), i.e. exactly SGD sampling noise;
* identical initial weights (jax init, copied leaf-by-leaf into torch);
* torch trains in float64 (the reference's --doubles regime) with
  torch.optim.Adam; jax trains in f32 with optax.adam (same b1/b2/eps);
* curvature params: lr 1e-4, frozen for `--burnin` epochs (both sides);
* final measurement: BOTH trained models are evaluated by the SAME
  instrument — the repo's full-split IWAE-500 with --eval_binarize fixed
  (0.002-nat repeatability, PARITY.md) — torch weights are loaded into
  the jax evaluator, so estimator differences cancel by construction.

The wrapped-normal log-prob here follows the reference's PRINCIPAL-BRANCH
semantics (torch side structurally; jax side via wraps=0), matching the
estimator-parity suite. Posteriors covered: normal (e), wrapped (h/s).
vMF training is not replicated in torch (the Wood sampler's rejection
gradients are a semantics minefield the estimator oracle already covers
at fixed weights); parity configs use s*:wrapped.

Run:  python scripts/parity_training.py --spec e6 --epochs 15
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax
import jax.numpy as jnp
import optax
import torch

from mvae_tpu.components import parse_components
from mvae_tpu.data.loaders import load_dataset
from mvae_tpu.models import vae
from mvae_tpu.train.trainer import (TrainConfig, Trainer,
                                    _mask_curvature_grads, make_optimizer)
from parity import torch_oracle as to

DT = torch.float64


# --------------------------------------------------------------- torch side
def params_to_torch(params):
    """jax pytree -> mirrored dict of f64 torch leaf Parameters."""
    def conv(a):
        return torch.nn.Parameter(
            torch.as_tensor(np.asarray(a), dtype=DT).clone())

    def walk(x):
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        if isinstance(x, (tuple, list)):
            return [walk(v) for v in x]
        return conv(x)

    return walk(params)


def torch_to_params(tp, like):
    """torch dict -> jax pytree with `like`'s structure/dtypes."""
    def walk(x, l):
        if isinstance(x, dict):
            return {k: walk(x[k], l[k]) for k in x}
        if isinstance(x, list):
            out = [walk(a, b) for a, b in zip(x, l)]
            return tuple(out) if isinstance(l, tuple) else out
        return jnp.asarray(np.asarray(x.detach()), jnp.asarray(l).dtype)

    return walk(tp, like)


def torch_leaves(tp):
    out = []

    def walk(x):
        if isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, list):
            for v in x:
                walk(v)
        else:
            out.append(x)

    walk(tp)
    return out


def torch_forward_elbo(tp, comps, x, gen):
    """Single-sample MC-KL ELBO, reference composition (SURVEY 3.2)."""
    feats = to.mlp_encoder(tp["encoder"], x)
    zs, kls = [], []
    for comp, cp in zip(comps, tp["components"]):
        mu_tan = feats @ cp["w_mu"] + cp["b_mu"]
        sigma = torch.nn.functional.softplus(feats @ cp["w_sig"]
                                             + cp["b_sig"])
        eps = torch.randn(mu_tan.shape, generator=gen, dtype=DT)
        kind = comp.manifold.kind
        n = comp.dim
        if kind == "e":
            z = mu_tan + sigma * eps
            kl = to.normal_kl_std(mu_tan, sigma)
        elif kind in ("h", "s"):
            sign = comp.manifold.curvature_sign
            k = sign * torch.exp(cp["c_param"])
            v = sigma * eps
            if kind == "h":
                mu = _lorentz_exp_mu0_k(mu_tan, k)
                z = _lorentz_sample_projection_k(v, mu, k)
                v_p = _lorentz_inverse_k(z, mu, k)
                r = torch.linalg.vector_norm(v_p, dim=-1)
                logq = to.gaussian_log_prob(v_p, sigma) \
                    - _lorentz_logdet_k(r, n, k)
                mu0 = _lorentz_mu0_k(n, k, mu.shape)
                v0 = _lorentz_inverse_k(z, mu0, k)
                r0 = torch.linalg.vector_norm(v0, dim=-1)
                logp = to.gaussian_log_prob(v0, torch.ones((), dtype=DT)) \
                    - _lorentz_logdet_k(r0, n, k)
            else:
                mu = _sphere_exp_mu0_k(mu_tan, k)
                z = _sphere_sample_projection_k(v, mu, k)
                v_p = _sphere_inverse_k(z, mu, k)
                r = torch.linalg.vector_norm(v_p, dim=-1)
                logq = to.gaussian_log_prob(v_p, sigma) \
                    - _sphere_logdet_k(r, n, k)
                mu0 = _sphere_mu0_k(n, k, mu.shape)
                v0 = _sphere_inverse_k(z, mu0, k)
                r0 = torch.linalg.vector_norm(v0, dim=-1)
                logp = to.gaussian_log_prob(v0, torch.ones((), dtype=DT)) \
                    - _sphere_logdet_k(r0, n, k)
            kl = logq - logp
        else:
            raise ValueError(f"torch replica does not cover kind {kind!r}")
        zs.append(z)
        kls.append(kl)
    z = torch.cat(zs, dim=-1)
    logits = to.mlp_decoder(tp["decoder"], z)
    log_px_z = to.bernoulli_log_prob(logits, x)
    elbo = log_px_z - sum(kls)
    return elbo.mean()


# torch_oracle's lorentz/sphere helpers take python-float k; the trainer
# needs TENSOR curvature (it is learnable). Thin tensor-k ports:
def _lorentz_mu0_k(n, k, shape):
    r = 1.0 / torch.sqrt(-k)
    out = torch.zeros(shape[:-1] + (n + 1,), dtype=DT)
    return torch.cat([r * torch.ones(shape[:-1] + (1,), dtype=DT),
                      out[..., 1:] * 0], dim=-1)


def _lorentz_exp_mu0_k(v, k):
    r_c = 1.0 / torch.sqrt(-k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    th = vn / r_c
    return torch.cat([r_c * torch.cosh(th),
                      r_c * torch.sinh(th) * v / vn], dim=-1)


def _lorentz_sample_projection_k(v, mu, k):
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    rsq = -1.0 / k
    mu0 = _lorentz_mu0_k(v.shape[-1], k, v.shape)
    alpha = -to._lprod(mu0, mu) / rsq
    coef = to._lprod(mu, v_amb) / (rsq * (1.0 + alpha))
    u = v_amb + coef * (mu0 + mu)
    r_c = torch.sqrt(rsq)
    un = torch.sqrt(to._lprod(u, u).clamp_min(1e-300))
    th = un / r_c
    return torch.cosh(th) * mu + torch.sinh(th) * r_c * u / un


def _lorentz_inverse_k(z, mu, k):
    rsq = -1.0 / k
    r_c = torch.sqrt(rsq)
    beta = (-to._lprod(mu, z) / rsq).clamp_min(1.0 + 1e-15)
    d = r_c * torch.acosh(beta)
    u_dir = z - beta * mu
    un = torch.sqrt(to._lprod(u_dir, u_dir).clamp_min(1e-300))
    u = d * u_dir / un
    mu0 = _lorentz_mu0_k(z.shape[-1] - 1, k, z.shape[:-1] + (z.shape[-1],))
    alpha = -to._lprod(mu0, mu) / rsq
    coef = to._lprod(mu0, u) / (rsq * (1.0 + alpha))
    v_amb = u + coef * (mu0 + mu)
    return v_amb[..., 1:]


def _lorentz_logdet_k(r, n, k):
    x = (r * torch.sqrt(-k)).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sinh(x)) - torch.log(x))


def _sphere_mu0_k(n, k, shape):
    r = 1.0 / torch.sqrt(k)
    return torch.cat([r * torch.ones(shape[:-1] + (1,), dtype=DT),
                      torch.zeros(shape[:-1] + (n,), dtype=DT)], dim=-1)


def _sphere_exp_mu0_k(v, k):
    r_c = 1.0 / torch.sqrt(k)
    vn = torch.linalg.vector_norm(v, dim=-1, keepdim=True).clamp_min(1e-300)
    th = vn / r_c
    return torch.cat([r_c * torch.cos(th),
                      r_c * torch.sin(th) * v / vn], dim=-1)


def _sphere_sample_projection_k(v, mu, k):
    rsq = 1.0 / k
    v_amb = torch.cat([torch.zeros_like(v[..., :1]), v], dim=-1)
    mu0 = _sphere_mu0_k(v.shape[-1], k, v.shape)
    alpha = (mu0 * mu).sum(-1, keepdim=True) / rsq
    coef = (mu * v_amb).sum(-1, keepdim=True) / (rsq * (1.0 + alpha))
    u = v_amb - coef * (mu0 + mu)
    r_c = torch.sqrt(rsq)
    un = torch.linalg.vector_norm(u, dim=-1, keepdim=True).clamp_min(1e-300)
    th = un / r_c
    return torch.cos(th) * mu + torch.sin(th) * r_c * u / un


def _sphere_inverse_k(z, mu, k):
    rsq = 1.0 / k
    r_c = torch.sqrt(rsq)
    beta = ((mu * z).sum(-1, keepdim=True) / rsq).clamp(-1.0, 1.0)
    d = r_c * torch.acos(beta)
    u_dir = z - beta * mu
    un = torch.linalg.vector_norm(u_dir, dim=-1,
                                  keepdim=True).clamp_min(1e-300)
    u = d * u_dir / un
    mu0 = _sphere_mu0_k(z.shape[-1] - 1, k, z.shape[:-1] + (z.shape[-1],))
    alpha = (mu0 * mu).sum(-1, keepdim=True) / rsq
    coef = (mu0 * u).sum(-1, keepdim=True) / (rsq * (1.0 + alpha))
    v_amb = u - coef * (mu0 + mu)
    return v_amb[..., 1:]


def _sphere_logdet_k(r, n, k):
    x = (r * torch.sqrt(k)).clamp_min(1e-30)
    return (n - 1) * (torch.log(torch.sin(x).abs().clamp_min(1e-300))
                      - torch.log(x))


# ----------------------------------------------------------------- protocol
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="e6")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--burnin", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--curvature_lr", type=float, default=1e-4)
    ap.add_argument("--fixed_curvature", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ll_repeats", type=int, default=4)
    ap.add_argument("--max_train", type=int, default=0,
                    help="cap the train split (0 = full)")
    ap.add_argument("--max_test", type=int, default=0,
                    help="cap the test split (0 = full)")
    ap.add_argument("--ll_n", type=int, default=500)
    ap.add_argument("--out", default="runs/r3_parity")
    args = ap.parse_args()

    ds = load_dataset("mnist")
    if args.max_train:
        ds.train = ds.train[:args.max_train]
    if args.max_test:
        ds.test = ds.test[:args.max_test]
    comps = parse_components(args.spec,
                             fixed_curvature=args.fixed_curvature,
                             wraps=0)   # reference principal-branch mode
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape,
                        arch="mlp", h_dim=400)
    params0 = vae.init_params(jax.random.key(args.seed), cfg)

    bs = args.batch_size
    n_steps = len(ds.train) // bs

    # --- jax trainer (f32, optax.adam; curvature masked during burn-in)
    tc = TrainConfig(batch_size=bs, lr=args.lr,
                     curvature_lr=args.curvature_lr,
                     burnin_epochs=args.burnin)
    tx = make_optimizer(params0, tc)
    opt_state = tx.init(params0)
    jp = params0
    burnin_steps = args.burnin * n_steps

    @jax.jit
    def jax_epoch(params, opt_state, batches, keys, step0):
        def one(carry, xs):
            params, opt_state, step = carry
            x, key = xs
            (_, _), grads = jax.value_and_grad(
                lambda p: vae.loss_fn(key, cfg, p, x), has_aux=True)(params)
            grads = _mask_curvature_grads(grads, cfg.components, step,
                                          burnin_steps)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, step + 1), None

        (params, opt_state, step), _ = jax.lax.scan(
            one, (params, opt_state, step0), (batches, keys))
        return params, opt_state, step

    # --- torch trainer (f64, torch.optim.Adam)
    tp = params_to_torch(params0)
    curv_leaves = [cp["c_param"] for cp in tp["components"]
                   if "c_param" in cp]
    net_leaves = [l for l in torch_leaves(tp)
                  if all(l is not c for c in curv_leaves)]
    topt = torch.optim.Adam([
        {"params": net_leaves, "lr": args.lr},
        {"params": curv_leaves, "lr": args.curvature_lr},
    ], betas=(0.9, 0.999), eps=1e-8)
    tgen = torch.Generator().manual_seed(args.seed + 1)

    jstep = jnp.zeros((), jnp.int32)
    key = jax.random.key(args.seed + 2)
    t0 = time.time()
    for epoch in range(args.epochs):
        rng = np.random.default_rng(
            (args.seed * 1000003 + epoch) & 0x7FFFFFFF)
        perm = rng.permutation(len(ds.train))[:n_steps * bs]
        intens = ds.train[perm].reshape((n_steps, bs) + ds.data_shape)
        xbin = (rng.random(intens.shape, dtype=np.float32)
                < intens).astype(np.float32)

        # jax epoch (one scan)
        key, k_ep = jax.random.split(key)
        keys = jax.random.split(k_ep, n_steps)
        jp, opt_state, jstep = jax_epoch(jp, opt_state,
                                         jnp.asarray(xbin), keys, jstep)

        # torch epoch
        frozen = epoch < args.burnin and not args.fixed_curvature
        for b in range(n_steps):
            x = torch.as_tensor(xbin[b].reshape(bs, -1), dtype=DT)
            loss = -torch_forward_elbo(tp, comps, x, tgen)
            topt.zero_grad()
            loss.backward()
            if args.fixed_curvature or frozen:
                for c in curv_leaves:
                    if c.grad is not None:
                        c.grad.zero_()
            topt.step()
        print(f"epoch {epoch + 1}/{args.epochs} torch loss "
              f"{float(loss.detach()):.2f} ({time.time() - t0:.0f}s)",
              flush=True)

    # --- shared instrument: full-split IWAE-500, pinned binarization
    tc_eval = TrainConfig(batch_size=bs, eval_binarize="fixed",
                          likelihood_n=args.ll_n, likelihood_chunk=20,
                          eval_batch_size=2048, seed=args.seed)
    tr = Trainer(cfg, ds, tc_eval, run_dir=f"{args.out}/{args.spec}")
    tr.params = jp
    ll_jax = tr.evaluate_log_likelihood(repeats=args.ll_repeats)
    tr.params = torch_to_params(tp, params0)
    ll_torch = tr.evaluate_log_likelihood(repeats=args.ll_repeats)

    curv_j = [float(c.curvature(p)) for c, p in
              zip(comps, jp["components"]) if "c_param" in p]
    curv_t = [float(c.manifold.curvature_sign
                    * math.exp(float(cp["c_param"])))
              for c, cp in zip(comps, tp["components"])
              if "c_param" in cp]
    out = {
        "spec": args.spec, "epochs": args.epochs, "seed": args.seed,
        "wraps": 0, "fixed_curvature": args.fixed_curvature,
        "iwae500_jax_f32": round(ll_jax, 4),
        "iwae500_torch_f64": round(ll_torch, 4),
        "delta_nats": round(ll_jax - ll_torch, 4),
        "curvatures_jax": curv_j, "curvatures_torch": curv_t,
        "wall_seconds": round(time.time() - t0, 1),
    }
    Path(args.out).mkdir(parents=True, exist_ok=True)
    with open(f"{args.out}/{args.spec.replace(',', '_')}.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
