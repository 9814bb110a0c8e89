"""f64-vs-f32 precision isolate for the s6:wrapped basin question.

The CLI deliberately has no float64 switch (f32/bf16 stability is the
rebuild's premise), so this driver builds the TrainConfig directly. Run it
with JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu: same code, same threefry stream,
same capped/wraps=1 semantics as the f32 control
(runs/r5_precision/s6w_float32_s11) — dtype is the only delta. Decides the
last remaining suspect for the -301.5-vs--299.9 basin split (VERDICT r4 #2;
wraps semantics excluded by results/r5_s6wrapped_wraps0_f32.json).

Usage:
    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python scripts/run_r5_precision_f64.py \
        [--seed 11] [--epochs 100] [--ll_max_examples 512]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--burnin", type=int, default=10)
    p.add_argument("--ll_max_examples", type=int, default=512)
    p.add_argument("--ll_repeats", type=int, default=1)
    p.add_argument("--run_dir", default=None)
    args = p.parse_args()

    import jax

    assert jax.config.jax_enable_x64, "run with JAX_ENABLE_X64=1"

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.models import VAEConfig
    from mvae_tpu.train import TrainConfig, Trainer

    comps = parse_components("s6:wrapped", fixed_curvature=True)
    ds = load_dataset("mnist")
    cfg = VAEConfig(components=comps, data_shape=ds.data_shape)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     burnin_epochs=args.burnin, seed=args.seed,
                     likelihood_n=500, dtype="float64",
                     eval_binarize="fixed", train_rng="threefry")
    run_dir = args.run_dir or f"runs/r5_precision/s6w_float64_s{args.seed}"
    trainer = Trainer(cfg, ds, tc, run_dir)
    result = trainer.fit(ll_max_examples=args.ll_max_examples,
                         ll_repeats=args.ll_repeats)
    summary = {k: v for k, v in result.items() if k != "history"}
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    (Path(run_dir) / "result.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
