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
# one measured "chunk" = one jitted scan of this many steps. Training runs
# whole epochs (hundreds to thousands of steps) as ONE scan, so the honest
# steady-state number needs the axon per-call dispatch+readback (~26-33 ms
# measured) amortized the same way: at 500 steps it was still ~30% of the
# measurement; at 2000 it is <10%.
SCAN_STEPS = 2000
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

    # ---- hardware-ceiling accounting (VERDICT r1 #8): what fraction of
    # the chip does this step time represent?
    head_w = sum(c.head_width for c in cfg.components)
    z_dim = cfg.z_dim
    gemm_macs_fwd = BATCH * (DATA_DIM * H_DIM      # encoder
                             + H_DIM * head_w      # fused heads
                             + z_dim * H_DIM       # decoder fc
                             + H_DIM * DATA_DIM)   # decoder out
    # backward: dgrad + wgrad per GEMM ~ 2x forward MACs
    gemm_macs = 3 * gemm_macs_fwd
    t_step = best / SCAN_STEPS
    # XLA's TPU default for f32 dots is a single bf16 MXU pass, so the
    # honest peak for this step is the bf16 MXU: 197 Tflop/s = 98.5 Tmac/s
    mxu_util = gemm_macs / t_step / 98.5e12
    # HBM bytes/step: params+grads+Adam(m,v) read/write (~8 copies of P)
    # + activation round trips (x, h, logits and their grads, ~10 BxD/BxH
    # passes) — a documented estimate, not a profiler readout
    n_params = sum(x.size for x in jax.tree.leaves(params))
    act_bytes = BATCH * (6 * DATA_DIM + 6 * H_DIM) * 4
    hbm_bytes = 8 * n_params * 4 + act_bytes + BATCH * DATA_DIM * 4
    hbm_gbps = hbm_bytes / t_step / 1e9
    log(f"utilization: {gemm_macs/1e6:.0f} MMACs/step -> "
        f"{mxu_util*100:.1f}% of bf16 MXU peak; "
        f"~{hbm_bytes/1e6:.1f} MB/step -> {hbm_gbps:.0f} GB/s "
        f"({hbm_gbps/819*100:.0f}% of HBM)")

    # bf16-operand GEMM path (MVAE_BF16_MATMUL) at h_dim 400 and 1024
    from mvae_tpu.models import nets as _nets
    bf16 = {}
    for hd in (400, 1024):
        cfg_b = VAEConfig(components=parse_components(
            "h2,s2,e2", fixed_curvature=False),
            data_shape=(DATA_DIM,), arch="mlp", h_dim=hd)
        params_b = init_params(jax.random.key(0), cfg_b)
        tx_b = make_optimizer(params_b, tc)
        opt_b = tx_b.init(params_b)

        def one_step_b(carry, step_key, cfg=cfg_b, tx=tx_b):
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
        def run_b(params, opt_state, intens, key):
            keys = jax.random.split(key, SCAN_STEPS)
            (params, opt_state, _), losses = jax.lax.scan(
                one_step_b, (params, opt_state, intens), keys)
            return params, opt_state, losses[-1]

        # try/finally: an exception mid-measurement (e.g. OOM at h_dim
        # 1024) must not leave the process-global bf16 flag flipped on
        _nets.set_bf16_matmul(True)
        try:
            params_b, opt_b, lb = run_b(params_b, opt_b, intensities,
                                        jax.random.key(5))
            float(lb)
            t0 = time.time()
            params_b, opt_b, lb = run_b(params_b, opt_b, intensities,
                                        jax.random.key(6))
            lb = float(lb)
        finally:
            _nets.set_bf16_matmul(False)
        bf16[hd] = SCAN_STEPS / (time.time() - t0)
        log(f"bf16-matmul h_dim={hd}: {bf16[hd]:.1f} steps/s "
            f"(loss {lb:.2f} finite={bool(jnp.isfinite(lb))})")

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
        "mxu_util_pct": round(mxu_util * 100, 1),
        "hbm_gbps_est": round(hbm_gbps, 1),
        "bf16_matmul_steps_per_sec_h400": round(bf16[400], 1),
        "bf16_matmul_steps_per_sec_h1024": round(bf16[1024], 1),
    }))


if __name__ == "__main__":
    main()
