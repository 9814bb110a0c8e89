"""End-to-end IWAE-500 eval timing: fused kernels ON (default) vs OFF.

Round-3 VERDICT #1's "Done" clause asks for a measured end-to-end IWAE-500
time drop with the fused kernels ON by default. This harness times the
full-split test IWAE-500 eval (ONE device call per pass,
`Trainer.evaluate_log_likelihood`) for each kernel configuration:

  fused       — production default: fused decoder+BCE kernel AND fused
                stereographic reparam kernel
  no_decoder  — MVAE_FUSED_DECODER=0: jnp HIGH-precision (bf16_3x) decode,
                fused reparam still on where eligible
  jnp         — both kernels off: the pure-jnp HIGH path

Each variant runs in its OWN subprocess (the kernel gates read the
environment at trace time; per-process env is the only toggle that cannot
hit a stale jit cache). Within a variant: train 1 epoch (deterministic —
the train path uses no eval kernel, so all variants produce IDENTICAL
params from the same seed), then time R full-split IWAE-500 passes. The
first pass is discarded as compile; the reported time is the min of the
rest (axon-relay wall jitter is one-sided). Each pass draws fresh IWAE
noise (k_models advances), so the relay cannot serve a cached result; the
returned float forces a full readback. LL values are also recorded — the
fused and jnp paths must agree to kernel-equivalence tolerance, making
this an end-to-end estimator check as well as a timing.

Usage: python scripts/run_r3_e2e_timing.py [--specs p6 h2,s2,e2]
       [--out results/r3_e2e_timing.json]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VARIANTS = {
    "fused": {},
    "no_decoder": {"MVAE_FUSED_DECODER": "0"},
    "jnp": {"MVAE_FUSED_DECODER": "0", "MVAE_FUSED_REPARAM": "0"},
}


def worker(spec: str, passes: int) -> None:
    sys.path.insert(0, str(REPO))
    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.models import vae
    from mvae_tpu.train.trainer import TrainConfig, Trainer

    ds = load_dataset("mnist")
    comps = parse_components(spec)
    cfg = vae.VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=1, batch_size=256, seed=7,
                     eval_binarize="fixed", likelihood_n=500,
                     eval_batch_size=2048)
    variant = ("d" + os.environ.get("MVAE_FUSED_DECODER", "a")
               + "r" + os.environ.get("MVAE_FUSED_REPARAM", "a"))
    tr = Trainer(cfg, ds, tc,
                 run_dir=f"runs/r3_e2e/{spec.replace(',', '-')}_{variant}")
    tr.train_one_epoch(0)

    lls, times = [], []
    for i in range(passes + 1):
        t0 = time.time()
        ll = tr.evaluate_log_likelihood("test")
        dt = time.time() - t0
        if i > 0:           # pass 0 pays the compile
            lls.append(ll)
            times.append(dt)
    print(json.dumps({
        "spec": spec,
        "fused_decoder": os.environ.get("MVAE_FUSED_DECODER", "auto"),
        "fused_reparam": os.environ.get("MVAE_FUSED_REPARAM", "auto"),
        "eval_s_min": round(min(times), 3),
        "eval_s_all": [round(t, 3) for t in times],
        "iwae500": round(sum(lls) / len(lls), 3),
        "iwae500_all": [round(v, 3) for v in lls],
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--specs", nargs="+", default=["p6", "h2,s2,e2"])
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default="results/r3_e2e_timing.json")
    ap.add_argument("--worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.passes)
        return

    results = {}
    for spec in args.specs:
        results[spec] = {}
        for name, env in VARIANTS.items():
            proc = subprocess.run(
                [sys.executable, __file__, "--worker", spec,
                 "--passes", str(args.passes)],
                env={**os.environ, **env}, capture_output=True, text=True,
                cwd=REPO, timeout=1800)
            if proc.returncode != 0:
                print(proc.stdout[-2000:], proc.stderr[-2000:],
                      file=sys.stderr)
                raise SystemExit(f"worker failed: {spec}/{name}")
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            results[spec][name] = rec
            print(f"[{spec}/{name}] {rec['eval_s_min']}s  "
                  f"IWAE {rec['iwae500']}", flush=True)
        f = results[spec]
        f["speedup_vs_jnp"] = round(
            f["jnp"]["eval_s_min"] / f["fused"]["eval_s_min"], 2)
        f["delta_nats_fused_vs_jnp"] = round(
            abs(f["fused"]["iwae500"] - f["jnp"]["iwae500"]), 4)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
