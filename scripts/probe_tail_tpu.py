"""TPU probe: fused-tail train step vs jnp-tail train step — Mosaic
compile check + steady-state steps/s, plus a value check of loss equality
between routings at identical draws.

Run on the real chip:
    python scripts/probe_tail_tpu.py [--spec h2,s2,e2] [--batch 1024]
(for kernel-capable products the auto policy routes to the jnp tail —
e.g. lone e6/h6/d6 — set MVAE_FUSED_TAIL=1 to force the fused side.
The r5 vMF m != 3 A/B that retired the wx channel ran through this
script before the channel was deleted; m != 3 vMF products now fail
the capability assert below by design.)
"""
import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvae_tpu.components import parse_components
from mvae_tpu.data.base import binarize_batch
from mvae_tpu.models import VAEConfig, init_params, loss_fn, vae
from mvae_tpu.train import TrainConfig, make_optimizer
from mvae_tpu.train.trainer import _mask_curvature_grads

DATA_DIM, H_DIM, SCAN = 784, 400, 2000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_chunk(cfg, tc, tx, allow_fused):
    def one_step(carry, step_key):
        params, opt_state, intens = carry
        k_bin, k_model = jax.random.split(step_key)
        x = binarize_batch(k_bin, intens, True)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(k_model, cfg, p, x, allow_fused=allow_fused),
            has_aux=True)(params)
        grads = _mask_curvature_grads(grads, cfg.components,
                                      jnp.ones((), jnp.int32), 0)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, intens), loss

    @jax.jit
    def run_chunk(params, opt_state, intens, key):
        keys = jax.random.split(key, SCAN)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step, (params, opt_state, intens), keys)
        return params, opt_state, losses[-1]

    return run_chunk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="h2,s2,e2")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    BATCH = args.batch
    dev = jax.devices()[0]
    log(f"device: {dev} spec={args.spec} batch={BATCH}")
    cfg = VAEConfig(components=parse_components(args.spec,
                                                fixed_curvature=False),
                    data_shape=(DATA_DIM,), arch="mlp", h_dim=H_DIM)
    tc = TrainConfig(batch_size=BATCH, burnin_epochs=0)
    params0 = init_params(jax.random.key(0), cfg)
    tx = make_optimizer(params0, tc)
    intens = jax.random.uniform(jax.random.key(1), (BATCH, DATA_DIM),
                                dtype=jnp.float32)
    RNG = "rbg"

    # value check first: single loss, fused vs jnp, identical key
    x = binarize_batch(jax.random.key(9), intens, True)
    kk = jax.random.key(7)
    assert vae._fused_tail_eligible(cfg, params0), "gate should be ON here"
    l_f, _ = jax.jit(lambda p: loss_fn(kk, cfg, p, x, allow_fused=True))(
        params0)
    l_j, _ = jax.jit(lambda p: loss_fn(kk, cfg, p, x, allow_fused=False))(
        params0)
    log(f"loss fused={float(l_f):.6f} jnp={float(l_j):.6f} "
        f"delta={abs(float(l_f) - float(l_j)):.2e}")

    out = {"spec": args.spec, "batch": BATCH,
           "loss_fused": float(l_f), "loss_jnp": float(l_j)}
    for label, allow in (("jnp", False), ("fused", True)):
        params = params0
        opt_state = tx.init(params)
        run = build_chunk(cfg, tc, tx, allow)
        t0 = time.time()
        params, opt_state, loss = run(params, opt_state, intens,
                                      jax.random.key(2, impl=RNG))
        loss = float(loss)
        log(f"{label}: compile+first {time.time() - t0:.1f}s loss={loss:.3f}")
        times = []
        for i in range(3):
            t0 = time.time()
            params, opt_state, loss = run(params, opt_state, intens,
                                          jax.random.key(3 + i, impl=RNG))
            loss = float(loss)
            times.append(time.time() - t0)
        sps = SCAN / min(times)
        log(f"{label}: {['%.3f' % t for t in times]} -> {sps:.1f} steps/s "
            f"(final loss {loss:.3f})")
        out[label + "_steps_per_sec"] = round(sps, 1)
        assert jnp.isfinite(loss)
    out["speedup"] = round(out["fused_steps_per_sec"]
                           / out["jnp_steps_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
