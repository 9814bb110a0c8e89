"""Benchmark: VAE train steps/sec/chip on the flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state jitted training step (fwd + bwd + Adam + dynamic
binarization, exactly the real training math) of the product-manifold
(H^2)x(S^2)x(E^2) MNIST VAE, batch 1024, f32, on whatever accelerator JAX
exposes (the driver runs this on 1x TPU v5e).

The reference (oskopek/mvae) never published throughput (SURVEY.md §6), so
vs_baseline is tracked against this repo's own recorded first-run number in
BENCH_BASELINE.json (created on first run; later rounds show the speedup
ratio as kernels improve).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

BATCH = 1024
DATA_DIM = 784
H_DIM = 400
SCAN_STEPS = 500
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import optax

    from mvae_tpu.components import parse_components
    from mvae_tpu.data.base import binarize_batch
    from mvae_tpu.models import VAEConfig, init_params, loss_fn
    from mvae_tpu.train import TrainConfig, make_optimizer
    from mvae_tpu.train.trainer import _mask_curvature_grads

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    cfg = VAEConfig(components=parse_components("h2,s2,e2",
                                                fixed_curvature=False),
                    data_shape=(DATA_DIM,), arch="mlp", h_dim=H_DIM)
    tc = TrainConfig(batch_size=BATCH, burnin_epochs=0)
    params = init_params(jax.random.key(0), cfg)
    tx = make_optimizer(params, tc)
    opt_state = tx.init(params)
    intensities = jax.random.uniform(jax.random.key(1), (BATCH, DATA_DIM),
                                     dtype=jnp.float32)

    def one_step(carry, step_key):
        # NOTE: the raw intensities ride in the carry, NOT as a closure
        # capture — the axon PJRT backend re-stages captured device
        # constants on every call (~25 ms/call measured), while arguments
        # are free.
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
        keys = jax.random.split(key, SCAN_STEPS)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step, (params, opt_state, intens), keys)
        return params, opt_state, losses[-1]

    log("compiling...")
    t0 = time.time()
    params, opt_state, loss = run_chunk(params, opt_state, intensities,
                                        jax.random.key(2))
    loss = float(loss)  # host readback: block_until_ready on the axon
    # backend returns before execution completes (measured); a value
    # readback is the only reliable completion barrier
    log(f"compile+first chunk: {time.time() - t0:.1f}s, loss={loss:.2f}")

    times = []
    for i in range(REPEATS):
        t0 = time.time()
        params, opt_state, loss = run_chunk(params, opt_state, intensities,
                                            jax.random.key(3 + i))
        loss = float(loss)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = SCAN_STEPS / best
    log(f"chunk times: {['%.3f' % t for t in times]} -> "
        f"{steps_per_sec:.1f} steps/s ({steps_per_sec * BATCH:.0f} ex/s), "
        f"final loss {loss:.2f}")
    if not jnp.isfinite(loss):
        raise SystemExit("non-finite loss in bench")

    baseline_file = Path(__file__).parent / "BENCH_BASELINE.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["steps_per_sec"]
    else:
        baseline = steps_per_sec
        baseline_file.write_text(json.dumps(
            {"steps_per_sec": steps_per_sec,
             "note": "first recorded run; later rounds report speedup vs this",
             "device": str(dev)}, indent=2))

    print(json.dumps({
        "metric": "vae_train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s (batch=1024, h2s2e2 MNIST VAE, f32)",
        "vs_baseline": round(steps_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
