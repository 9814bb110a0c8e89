"""Profile the (fused-tail) train step: trace a 400-step scan, then rank
device-op durations from the perfetto trace. Usage:
    python scripts/profile_step.py [fused|jnp] [outdir]
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

BATCH, DATA_DIM, H_DIM, SCAN = 1024, 784, 400, 400


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_{mode}"
    allow = mode == "fused"
    cfg = VAEConfig(components=parse_components("h2,s2,e2",
                                                fixed_curvature=False),
                    data_shape=(DATA_DIM,), arch="mlp", h_dim=H_DIM)
    tc = TrainConfig(batch_size=BATCH, burnin_epochs=0)
    params = init_params(jax.random.key(0), cfg)
    tx = make_optimizer(params, tc)
    opt_state = tx.init(params)
    intens = jax.random.uniform(jax.random.key(1), (BATCH, DATA_DIM),
                                dtype=jnp.float32)

    def one_step(carry, step_key):
        params, opt_state, intens = carry
        k_bin, k_model = jax.random.split(step_key)
        x = binarize_batch(k_bin, intens, True)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(k_model, cfg, p, x, allow_fused=allow),
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

    k = jax.random.key(2, impl="rbg")
    params, opt_state, loss = run_chunk(params, opt_state, intens, k)
    print(f"warm loss {float(loss):.2f}", file=sys.stderr)
    jax.profiler.start_trace(outdir)
    params, opt_state, loss = run_chunk(params, opt_state, intens, k)
    float(loss)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        print("no trace.json.gz found under", outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    # device-side complete events: pid whose name mentions TPU/device
    pids = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "/device" in n.lower() or "tpu" in n.lower()
                or "xla" in n.lower()}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            durs[ev["name"]] += ev.get("dur", 0)
            counts[ev["name"]] += 1
    total = sum(durs.values())
    print(f"# pids: { {p: pids[p] for p in dev_pids} }")
    print(f"# total device-op time: {total/1e3:.2f} ms over {SCAN} steps "
          f"= {total/SCAN:.2f} us/step")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/SCAN:9.3f} us/step  x{counts[name]//SCAN:<4d} {name[:90]}")


if __name__ == "__main__":
    main()
