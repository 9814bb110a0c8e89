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
# steady-state number needs the axon per-call dispatch+readback overhead
# amortized the same way. Round-4 measurement: the overhead is ~25-30 ms
# PER EXECUTION (program-dependent, not per-step): 75.5 us/step at a
# 2000-step chunk vs 60.5 us/step at 32000 against a profiler device time
# of 59.9 us/step — at 32000 the wall number is within ~1% of the device
# floor, i.e. it measures the chip, not the relay.
SCAN_STEPS = 32000
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _probe_backend(timeout_s: float = 300.0) -> str | None:
    """Initialize the accelerator backend in a THROWAWAY subprocess first.

    A wedged TPU tunnel can make the first backend touch HANG indefinitely
    (observed 2026-08-18: `jax.devices()` blocked >30 min with the axon
    relay down, where a healthy init errors fast or succeeds in seconds).
    If that happened in-process, the driver's bench capture would record
    nothing at all; probing in a killable subprocess converts the hang
    into a diagnostic JSON line. Returns the platform name, or None if
    the backend is unreachable."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    out = r.stdout.strip().splitlines()
    return out[-1] if out else None


def main():
    import optax

    from mvae_tpu.components import parse_components
    from mvae_tpu.data.base import binarize_batch
    from mvae_tpu.models import VAEConfig, init_params, loss_fn
    from mvae_tpu.train import TrainConfig, make_optimizer
    from mvae_tpu.train.trainer import _mask_curvature_grads

    dev = jax.devices()[0]
    log(f"bench device: {dev}")

    # ---- machine-rate calibration FIRST, in a pristine device/process
    # state: the wall-clock scan differencing in roofline.measure loses its
    # signal after the long bench scans have run in the same process (and
    # whenever anything else holds this box's single host core) — observed
    # "2134 GB/s stream / 1383 Tmac/s MXU". calibrate() raises on such
    # physically impossible rates; nominal spec rates are the fallback.
    log("calibrating machine rates (stream + MXU) for the step ceilings...")
    from mvae_tpu.kernels import roofline as _rl
    try:
        _cal = _rl.calibrate()
        stream_gbps = _cal["stream_gbps"]
        mxu_tmacs = _cal["mxu_tmacs"]
        calibrated = True
    except Exception as e:  # CPU smoke runs / broken measurement
        log(f"calibration unavailable ({type(e).__name__}); using nominal")
        stream_gbps, mxu_tmacs = 819.0, _rl.MXU_TMACS_PEAK
        calibrated = False

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

    # training keys ride the production default PRNG (TrainConfig.train_rng
    # = "rbg", the TPU hardware RNG): the per-pixel binarization bits are
    # the largest VPU cost in the step and threefry generates them ~4x
    # slower (measured: 11.5k vs 8.6k steps/s with everything else equal)
    RNG = "rbg" if jax.default_backend() != "cpu" else None

    log("compiling...")
    t0 = time.time()
    params, opt_state, loss = run_chunk(params, opt_state, intensities,
                                        jax.random.key(2, impl=RNG))
    loss = float(loss)  # host readback: block_until_ready on the axon
    # backend returns before execution completes (measured); a value
    # readback is the only reliable completion barrier
    log(f"compile+first chunk: {time.time() - t0:.1f}s, loss={loss:.2f}")

    times = []
    for i in range(REPEATS):
        t0 = time.time()
        params, opt_state, loss = run_chunk(params, opt_state, intensities,
                                            jax.random.key(3 + i, impl=RNG))
        loss = float(loss)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = SCAN_STEPS / best
    log(f"chunk times: {['%.3f' % t for t in times]} -> "
        f"{steps_per_sec:.1f} steps/s ({steps_per_sec * BATCH:.0f} ex/s), "
        f"final loss {loss:.2f}")
    if not jnp.isfinite(loss):
        raise SystemExit("non-finite loss in bench")

    # ---- computed step ceiling (round-3 VERDICT #2): per-step bytes and
    # MACs priced at LIVE-CALIBRATED machine rates -> a binding roofline
    # for the whole train step, the same methodology kernels/roofline.py
    # applies per kernel.
    head_w = sum(c.head_width for c in cfg.components)
    z_dim = cfg.z_dim
    gemm_macs_fwd = BATCH * (DATA_DIM * H_DIM      # encoder
                             + H_DIM * head_w      # fused heads
                             + z_dim * H_DIM       # decoder fc
                             + H_DIM * DATA_DIM)   # decoder out
    # backward: dgrad + wgrad per GEMM ~ 2x forward MACs
    gemm_macs = 3 * gemm_macs_fwd
    t_step = best / SCAN_STEPS

    # XLA's TPU default for f32 dots is a single bf16 MXU pass, so each
    # MAC counts once against the measured bf16 MXU rate
    t_mxu = gemm_macs / (mxu_tmacs * 1e12)
    # HBM bytes/step (verified against the optimized HLO, see the round-3
    # profile notes in RESULTS_r3.md):
    # * optimizer: Adam reads p, m, v and writes p, m, v; the wgrad GEMM
    #   outputs FUSE directly into the Adam update fusions (the gradient
    #   never round-trips HBM as a whole) -> 7P words, not 8P;
    # * activations: with x pinned by the binarize optimization barrier,
    #   each major (B, D)/(B, H) buffer crosses HBM ~2x (fwd write + bwd
    #   read at the fusion boundary); x, h, logits -> 2 * (2D + H)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    hbm_bytes = (7 * n_params
                 + 2 * BATCH * (2 * DATA_DIM + H_DIM)) * 4
    t_hbm = hbm_bytes / (stream_gbps * 1e9)
    t_ceiling = max(t_mxu, t_hbm)
    binding = "mxu" if t_mxu >= t_hbm else "hbm"
    ceiling_steps = 1.0 / t_ceiling
    pct_ceiling = 100.0 * t_ceiling / t_step
    mxu_util = gemm_macs / t_step / (mxu_tmacs * 1e12)
    hbm_gbps = hbm_bytes / t_step / 1e9
    log(f"step model: {gemm_macs/1e6:.0f} MMACs -> t_mxu {t_mxu*1e6:.1f} us; "
        f"{hbm_bytes/1e6:.1f} MB -> t_hbm {t_hbm*1e6:.1f} us; "
        f"binding={binding}, ceiling {ceiling_steps:.0f} steps/s; "
        f"measured {1/t_step:.0f} = {pct_ceiling:.0f}% of ceiling "
        f"({mxu_util*100:.1f}% MXU, {hbm_gbps:.0f} GB/s)")

    # Cross-check the hand model's MAC count against the COMPILED
    # program's own cost analysis. Only the flops side is trusted: the
    # analysis' "bytes accessed" overcounts fusion-boundary traffic 2-4x
    # on this backend (124 MB/step here where >50 MB/step is physically
    # impossible at the measured rate), so it is recorded for reference
    # but not used as a ceiling.
    mlp_cost = None
    try:
        # analyze ONE step (the scan body as a standalone jit): this
        # backend's cost analysis does not descend into while-loop trip
        # counts, so analyzing the scanned chunk reports ~zero work
        _cost = jax.jit(one_step).lower(
            (params, opt_state, intensities),
            jax.random.key(2, impl=RNG)).compile().cost_analysis()
        if isinstance(_cost, (list, tuple)):
            _cost = _cost[0]
        mlp_cost = {"macs": float(_cost["flops"]) / 2.0,
                    "bytes_accessed_raw": float(_cost["bytes accessed"])}
        log(f"step compiled-HLO cost: {mlp_cost['macs']/1e6:.0f} MMACs "
            f"(hand model {gemm_macs/1e6:.0f}; the delta is the skipped "
            f"first-layer input dgrad), bytes-accessed "
            f"{mlp_cost['bytes_accessed_raw']/1e6:.1f} MB (raw, "
            f"overcounted — reference only)")
    except Exception as e:
        log(f"step cost analysis unavailable ({type(e).__name__}: {e})")

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
                                        jax.random.key(5, impl=RNG))
            float(lb)
            t0 = time.time()
            params_b, opt_b, lb = run_b(params_b, opt_b, intensities,
                                        jax.random.key(6, impl=RNG))
            lb = float(lb)
        finally:
            _nets.set_bf16_matmul(False)
        bf16[hd] = SCAN_STEPS / (time.time() - t0)
        log(f"bf16-matmul h_dim={hd}: {bf16[hd]:.1f} steps/s "
            f"(loss {lb:.2f} finite={bool(jnp.isfinite(lb))})")

    # ---- conv/CIFAR row (round-3 VERDICT #4): judged config (5) `u6` conv.
    # Same ceiling methodology: conv MACs (tap-exact: a stride-2 4x4
    # transpose conv reaches each output pixel from 2x2 taps) + param and
    # activation HBM traffic, priced at the calibrated rates.
    CB, HW, CC = 128, 32, 3
    cfg_c = VAEConfig(components=parse_components("u6",
                                                  fixed_curvature=False),
                      data_shape=(HW, HW, CC), arch="conv", h_dim=H_DIM)
    params_c = init_params(jax.random.key(0), cfg_c)
    tx_c = make_optimizer(params_c, tc)
    opt_c = tx_c.init(params_c)
    intens_c = jax.random.uniform(jax.random.key(1), (CB, HW, HW, CC),
                                  dtype=jnp.float32)
    CONV_STEPS = 4000  # ~1.2 s/chunk: the ~25-30 ms per-execution relay
    # overhead (see SCAN_STEPS note) drops below ~3% of the measurement

    def one_step_c(carry, step_key):
        params, opt_state, intens = carry
        k_bin, k_model = jax.random.split(step_key)
        x = binarize_batch(k_bin, intens, True)
        (loss, _), grads = jax.value_and_grad(
            lambda p: loss_fn(k_model, cfg_c, p, x), has_aux=True)(params)
        grads = _mask_curvature_grads(grads, cfg_c.components,
                                      jnp.ones((), jnp.int32), 0)
        updates, opt_state = tx_c.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, intens), loss

    @jax.jit
    def run_c(params, opt_state, intens, key):
        keys = jax.random.split(key, CONV_STEPS)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step_c, (params, opt_state, intens), keys)
        return params, opt_state, losses[-1]

    log("compiling conv bench...")
    params_c, opt_c, lc = run_c(params_c, opt_c, intens_c,
                                jax.random.key(7, impl=RNG))
    float(lc)
    tc_times = []
    for i in range(2):
        t0 = time.time()
        params_c, opt_c, lc = run_c(params_c, opt_c, intens_c,
                                    jax.random.key(8 + i, impl=RNG))
        lc = float(lc)
        tc_times.append(time.time() - t0)
    conv_sps = CONV_STEPS / min(tc_times)
    t_cstep = 1.0 / conv_sps
    # Leak-proof conv ceiling (round-4 VERDICT #3): the PURE-MXU bound —
    # the MAC count of the OPTIMIZED program itself (compiled
    # cost_analysis flops/2, verified against shape arithmetic: it even
    # accounts for the skipped first-layer input dgrad) priced at the
    # live-measured MXU GEMM rate the convs cannot exceed. This is
    # deliberately the ONLY resource term: two rounds of byte models
    # leaked in succession —
    #   * r3's hand activation model: 131.9% reached (the fused-tail
    #     rewrite changed which buffers round-trip HBM);
    #   * r4's "Adam must move 6P words" model: 104% reached (XLA keeps
    #     a large share of the while-carry optimizer state VMEM-resident
    #     across scan iterations on this chip — 82 MB state vs 128 MB
    #     VMEM);
    #   * the compiled cost analysis' own "bytes accessed": overcounts
    #     fusion-boundary traffic 2-4x (124 MB/step on the MLP where
    #     >50 MB/step is physically impossible at the measured rate).
    # Post-fusion HBM traffic on this backend is simply not statically
    # accountable; the MXU floor is. The ceiling is therefore loose
    # (binding resources include VPU transposed-conv work and real HBM
    # traffic), and %-of-ceiling is a LOWER bound on true efficiency.
    conv_macs = None
    try:
        # single-step analysis: this backend's cost analysis does not
        # descend into while-loop trip counts, so analyze the scan body
        _cost = jax.jit(one_step_c).lower(
            (params_c, opt_c, intens_c),
            jax.random.key(7, impl=RNG)).compile().cost_analysis()
        if isinstance(_cost, (list, tuple)):
            _cost = _cost[0]
        conv_macs = float(_cost["flops"]) / 2.0
    except Exception as e:  # backend without cost analysis
        log(f"conv cost analysis unavailable ({type(e).__name__}: {e}); "
            "no conv ceiling this run")
    if conv_macs:
        t_ceil_c = conv_macs / (mxu_tmacs * 1e12)
        conv_binding = "mxu (loose: HBM/VPU terms not statically provable)"
        log(f"conv u6 B={CB}: {conv_sps:.1f} steps/s; MXU floor: "
            f"{conv_macs/1e6:.0f} MMACs -> {t_ceil_c*1e6:.0f} us, "
            f"ceiling {1/t_ceil_c:.0f} steps/s "
            f"({100*t_ceil_c/t_cstep:.0f}% reached)")
    else:
        t_ceil_c, conv_binding = t_cstep, "unavailable"

    # ---- conv DEVICE-TIME floor (round-4 VERDICT weak #5 / r5 #4): the
    # honest ceiling metric. The MXU floor above is deliberately loose
    # (the step is elementwise-HBM-bound per the RESULTS_r4 §5
    # decomposition: ~130 us/step of relu/binarize/BCE traffic over the
    # 2.1M-element conv1 activations); the tight floor is the program's
    # own PROFILER DEVICE TIME per step — wall/device >= 1 always, and
    # pct_of_device_floor says how much of the measured wall is chip work
    # vs dispatch/relay overhead. Same methodology as the MLP step's
    # 32k-chunk treatment (SCAN_STEPS note), measured instead of argued.
    conv_dev_us = None
    try:
        import shutil
        import tempfile
        tmp = tempfile.mkdtemp(prefix="benchconv_")
        try:
            jax.profiler.start_trace(tmp)
            params_c, opt_c, lc = run_c(params_c, opt_c, intens_c,
                                        jax.random.key(12, impl=RNG))
            float(lc)
            jax.profiler.stop_trace()
            dev_ms = _rl._trace_device_ms(tmp, ["run_c"])
            if dev_ms.get("run_c", 0.0) > 0:
                conv_dev_us = dev_ms["run_c"] * 1e3 / CONV_STEPS
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:
        log(f"conv device-time profile unavailable ({type(e).__name__}: {e})")
    if conv_dev_us:
        conv_floor_sps = 1e6 / conv_dev_us
        conv_pct_dev = 100.0 * conv_sps / conv_floor_sps
        log(f"conv device floor: {conv_dev_us:.1f} us/step -> "
            f"{conv_floor_sps:.0f} steps/s; wall {conv_sps:.0f} = "
            f"{conv_pct_dev:.1f}% of device floor")
    else:
        conv_floor_sps = conv_pct_dev = None

    # ---- MVAE_BF16_CONV_ACT A/B (round-4 VERDICT weak #5 attack): bf16
    # activations between the convs (f32 masters, f32 logits for BCE)
    # halve the elementwise-HBM term's bytes. Trace-time flag -> a fresh
    # jit; measured every round so the routing default stays evidence-
    # backed (keep only if it wins).
    from mvae_tpu.models import nets as _nets

    @jax.jit
    def run_c_bf16(params, opt_state, intens, key):
        keys = jax.random.split(key, CONV_STEPS)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step_c, (params, opt_state, intens), keys)
        return params, opt_state, losses[-1]

    _nets.set_bf16_conv_activations(True)
    try:
        pb, ob, lb16 = run_c_bf16(params_c, opt_c, intens_c,
                                  jax.random.key(13, impl=RNG))
        float(lb16)
        tb_times = []
        for i in range(2):
            t0 = time.time()
            pb, ob, lb16 = run_c_bf16(pb, ob, intens_c,
                                      jax.random.key(14 + i, impl=RNG))
            lb16 = float(lb16)
            tb_times.append(time.time() - t0)
    finally:
        _nets.set_bf16_conv_activations(False)
    conv_bf16_sps = CONV_STEPS / min(tb_times)
    log(f"conv bf16-act A/B: {conv_bf16_sps:.1f} vs {conv_sps:.1f} steps/s "
        f"({conv_bf16_sps / conv_sps:.3f}x, loss {lb16:.2f} "
        f"finite={bool(jnp.isfinite(lb16))})")

    # conv IWAE eval chunk at Precision.HIGH (the production fallback
    # path): S=25 samples x B=512 through decoder+BCE. HIGH is bf16_3x —
    # the same hi*hi+hi*lo+lo*hi contract as the fused MLP kernel;
    # measured 0.006 nats vs the 6-pass HIGHEST oracle and 5.3x faster
    # (8.8 vs 46.8 ms at S=20 B=512 — HIGHEST not re-measured here, it
    # costs a second 60 s compile in every bench run).
    from mvae_tpu.models.nets import conv_decoder_apply
    EB, ES = 512, 25
    zc = 0.5 * jax.random.normal(jax.random.key(10), (ES, EB, cfg_c.z_dim))
    xc = binarize_batch(jax.random.key(11), intens_c[:EB % CB or CB], True)
    xc = jnp.tile(xc, (EB // xc.shape[0] + 1, 1, 1, 1))[:EB]

    @jax.jit
    def conv_chunk_high(z):
        with jax.default_matmul_precision("high"):
            logits = conv_decoder_apply(params_c["decoder"], z)
            t = xc * logits - (jnp.maximum(logits, 0.0)
                               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.sum(t, axis=(-1, -2, -3))

    float(jnp.sum(conv_chunk_high(zc)))
    t0 = time.time()
    for i in range(4):
        float(jnp.sum(conv_chunk_high(zc + i * 1e-6)))
    conv_eval_ms = (time.time() - t0) / 4 * 1e3

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
        "step_ceiling_steps_per_sec": round(ceiling_steps, 1),
        "pct_of_step_ceiling": round(pct_ceiling, 1),
        "step_binding_resource": binding,
        "step_model": {
            "gemm_macs": gemm_macs, "hbm_bytes": hbm_bytes,
            "t_mxu_us": round(t_mxu * 1e6, 2),
            "t_hbm_us": round(t_hbm * 1e6, 2),
            "stream_gbps": round(stream_gbps, 1),
            "mxu_tmacs": round(mxu_tmacs, 1),
            "rates_calibrated": calibrated,
        },
        "train_rng": RNG or "threefry",
        "bf16_matmul_steps_per_sec_h400": round(bf16[400], 1),
        "bf16_matmul_steps_per_sec_h1024": round(bf16[1024], 1),
        "step_model_hlo_cost": mlp_cost,
        "conv_u6_steps_per_sec": round(conv_sps, 1),
        "conv_step_ceiling_steps_per_sec": round(1 / t_ceil_c, 1),
        "conv_pct_of_step_ceiling": round(100 * t_ceil_c / t_cstep, 1),
        "conv_step_binding_resource": conv_binding,
        "conv_step_model": (
            {"macs": conv_macs}
            if conv_macs else None),
        "conv_device_us_per_step": (round(conv_dev_us, 2)
                                    if conv_dev_us else None),
        "conv_device_floor_steps_per_sec": (round(conv_floor_sps, 1)
                                            if conv_dev_us else None),
        "conv_pct_of_device_floor": (round(conv_pct_dev, 1)
                                     if conv_dev_us else None),
        "conv_bf16_act_steps_per_sec": round(conv_bf16_sps, 1),
        "conv_bf16_act_speedup": round(conv_bf16_sps / conv_sps, 3),
        "conv_iwae_high_ms_per_chunk_s25_b512": round(conv_eval_ms, 2),
    }))


if __name__ == "__main__":
    if _probe_backend() is None:
        # still ONE parseable JSON line for the driver, marking the cause
        print(json.dumps({
            "metric": "vae_train_steps_per_sec_per_chip",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "error": "accelerator backend unreachable (init hung or "
                     "errored in probe subprocess; see BENCH notes)",
        }))
        sys.exit(1)
    main()
