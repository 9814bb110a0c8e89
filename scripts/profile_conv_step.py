"""Profile the conv (u6/CIFAR) train step: trace a scan, rank device-op
durations (same method as profile_step.py). The conv step sits at 39% of
its MXU MAC floor (BENCH_r04) — this decomposes where the other 61% goes.
Usage: python scripts/profile_conv_step.py [outdir]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvae_tpu.components import parse_components
from mvae_tpu.data.base import binarize_batch
from mvae_tpu.models import VAEConfig, init_params, loss_fn
from mvae_tpu.train import TrainConfig, make_optimizer
from mvae_tpu.train.trainer import _mask_curvature_grads

CB, HW, CC, H_DIM, SCAN = 128, 32, 3, 400, 400


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_conv"
    cfg = VAEConfig(components=parse_components("u6", fixed_curvature=False),
                    data_shape=(HW, HW, CC), arch="conv", h_dim=H_DIM)
    tc = TrainConfig(batch_size=CB, burnin_epochs=0)
    params = init_params(jax.random.key(0), cfg)
    tx = make_optimizer(params, tc)
    opt_state = tx.init(params)
    intens = jax.random.uniform(jax.random.key(1), (CB, HW, HW, CC),
                                dtype=jnp.float32)

    def one_step(carry, step_key):
        params, opt_state, intens = carry
        k_bin, k_model = jax.random.split(step_key)
        x = binarize_batch(k_bin, intens, True)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(k_model, cfg, p, x), has_aux=True)(params)
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

    k = jax.random.key(2, impl="rbg")
    params, opt_state, loss = run_chunk(params, opt_state, intens, k)
    print(f"warm loss {float(loss):.2f}", file=sys.stderr)
    jax.profiler.start_trace(outdir)
    params, opt_state, loss = run_chunk(params, opt_state, intens, k)
    float(loss)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    pids = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev = {p for p, n in pids.items() if "/device" in n.lower()
           or "tpu" in n.lower() or "xla" in n.lower()}
    durs, counts = defaultdict(float), defaultdict(int)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev:
            durs[ev["name"]] += ev.get("dur", 0)
            counts[ev["name"]] += 1
    enclosing = {n for n in durs if "while" in n or "jit_" in n or n == "0"}
    busy = sum(d for n, d in durs.items() if n not in enclosing)
    outer = max((d for n, d in durs.items() if n in enclosing), default=0.0)
    print(f"# step device time {outer/SCAN:.2f} us; op-busy "
          f"{busy/SCAN:.2f} us; gaps {(outer - busy)/SCAN:.2f} us")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
        if name in enclosing:
            continue
        print(f"{d/SCAN:9.3f} us/step  x{counts[name]//SCAN:<4d} {name[:80]}")


if __name__ == "__main__":
    main()
