"""CLI entry point (L7).

Parity with ``mt/examples/run.py`` in oskopek/mvae [UNVERIFIED]:

    python -m mvae_tpu.cli --dataset mnist --model h2,s2,e2 \
        --fixed_curvature false --epochs 100 --likelihood_n 500

Flag-name parity where the reference flags are known (SURVEY.md §2 CLI row):
--dataset, --model (spec string), --fixed_curvature, --epochs, --batch_size,
--likelihood_n, --seed, --burnin (curvature warmup epochs). The reference's
``--doubles`` float64 switch is intentionally ABSENT: the whole point of
this rebuild is f32/bf16 stability (use --dtype bfloat16 to go lower, not
higher). New flags: --resume for true checkpoint resume.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def _str2bool(v: str) -> bool:
    if v.lower() in ("true", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mvae-tpu",
        description="TPU-native mixed-curvature VAE training")
    p.add_argument("--dataset", default="mnist",
                   choices=["mnist", "omniglot", "cifar", "bdp"])
    p.add_argument("--model", default="e6",
                   help="latent spec, e.g. 'h2,s2,e2', '2h2', 'u6', "
                        "'s6:wrapped', 'd6:riemannian'")
    p.add_argument("--fixed_curvature", type=_str2bool, default=True)
    p.add_argument("--scalar_sigma", type=_str2bool, default=False,
                   help="isotropic posterior scale per component (the "
                        "reference's scalar_parametrization)")
    p.add_argument("--wraps", type=int, default=1,
                   help="wrap-image pairs in wrapped-normal densities on "
                        "positive curvature; 0 = the reference's principal-"
                        "branch-only estimator (strict parity mode)")
    p.add_argument("--sigma_cap", type=_str2bool, default=True,
                   help="saturate wrapped posterior scales at the positive-"
                        "K injectivity radius (round-4 stability cap). "
                        "False = the reference family's uncapped head — "
                        "see the round-5 basin study "
                        "(results/r5_s6wrapped_basin.json)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--h_dim", type=int, default=400)
    p.add_argument("--arch", default=None, choices=[None, "mlp", "conv"],
                   help="default: conv for cifar, mlp otherwise")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--curvature_lr", type=float, default=1e-4)
    p.add_argument("--init_k", type=float, default=1.0,
                   help="initial |K| per component (sign comes from the "
                        "manifold kind; 'u' takes the value as-is, so a "
                        "small positive init_k puts it near the K=0 "
                        "crossing)")
    p.add_argument("--burnin", type=int, default=10,
                   help="epochs with curvature frozen")
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--likelihood_n", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--run_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval_only", action="store_true",
                   help="restore the latest checkpoint and only compute the "
                        "IWAE marginal LL (no training)")
    p.add_argument("--generate", type=int, default=0, metavar="N",
                   help="after training (or with --eval_only, from the "
                        "checkpoint) write N prior samples and N test-set "
                        "reconstructions to <run_dir>/samples.npz")
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--ll_max_examples", type=int, default=None,
                   help="cap IWAE eval set size (speed)")
    p.add_argument("--eval_binarize", default="dynamic",
                   choices=["dynamic", "fixed"],
                   help="'fixed' pins one deterministic binarization per "
                        "test example so repeated evals measure pure IWAE "
                        "noise (sub-0.1-nat comparisons)")
    p.add_argument("--ll_repeats", type=int, default=1,
                   help="average the final IWAE LL over N independent eval "
                        "passes (one pass has ~0.1-nat binarization noise; "
                        "use >=4 for sub-0.1-nat comparisons)")
    p.add_argument("--mesh", default=None,
                   help="device mesh 'DATA,MODEL' (e.g. '4,2'); default "
                        "single device")
    p.add_argument("--train_rng", default="rbg",
                   choices=["rbg", "threefry"],
                   help="PRNG for the TRAINING noise streams (binarization "
                        "+ reparam draws): 'rbg' = TPU hardware RNG, 1.3x "
                        "faster steps; 'threefry' = bit-identical across "
                        "backends. Eval instruments always use threefry.")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail fast on NaN/Inf under jit (slow; debugging)")
    p.add_argument("--profile_epochs", type=int, default=0,
                   help="capture a jax.profiler trace for the first N epochs")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from .components import canonical_name, parse_components
    from .data import load_dataset
    from .models import VAEConfig
    from .train import TrainConfig, Trainer

    components = parse_components(args.model,
                                  fixed_curvature=args.fixed_curvature,
                                  scalar_sigma=args.scalar_sigma,
                                  wraps=args.wraps,
                                  sigma_cap=args.sigma_cap)
    dataset = load_dataset(args.dataset)
    arch = args.arch or ("conv" if args.dataset == "cifar" else "mlp")
    model_cfg = VAEConfig(components=components,
                          data_shape=dataset.data_shape, arch=arch,
                          h_dim=args.h_dim)
    mesh_shape = None
    if args.mesh:
        parts = [int(v) for v in args.mesh.split(",")]
        mesh_shape = (parts[0], parts[1] if len(parts) > 1 else 1)
    tc = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                     lr=args.lr, curvature_lr=args.curvature_lr,
                     burnin_epochs=args.burnin, beta=args.beta,
                     seed=args.seed, likelihood_n=args.likelihood_n,
                     checkpoint_every=args.checkpoint_every,
                     dtype=args.dtype, mesh_shape=mesh_shape,
                     init_k=args.init_k, eval_binarize=args.eval_binarize,
                     train_rng=args.train_rng)
    run_dir = args.run_dir or (
        f"runs/{args.dataset}_{args.model.replace(',', '-').replace(':', '.')}"
        f"_{'fixed' if args.fixed_curvature else 'learn'}_s{args.seed}")

    print(f"model {canonical_name(components)} on {dataset.name} "
          f"({'synthetic stand-in' if dataset.synthetic else 'real data'}), "
          f"arch={arch}, dtype={args.dtype}, run_dir={run_dir}")

    if args.debug_nans:
        from .utils.profiling import enable_nan_guard
        enable_nan_guard()

    trainer = Trainer(model_cfg, dataset, tc, run_dir)

    def write_samples(n):
        """N prior samples + N test reconstructions -> run_dir/samples.npz.

        Reconstruction inputs go through the dataset's binarization first —
        the model only ever sees binarized pixels in training/eval, so the
        artifact must reflect that input distribution (and `originals` are
        the actual encoder inputs)."""
        import jax
        import numpy as np
        from .data import binarize_batch
        from .models import vae
        k1, k2, kb = jax.random.split(jax.random.key(tc.seed + 777), 3)
        gen = vae.generate(k1, model_cfg, trainer.params, n)
        x = binarize_batch(kb, trainer._test_data[:n], dataset.binarize)
        rec = vae.reconstruct(k2, model_cfg, trainer.params, x)
        path = Path(run_dir) / "samples.npz"
        np.savez_compressed(path, generated=np.asarray(gen),
                            originals=np.asarray(x),
                            reconstructions=np.asarray(rec))
        print(f"wrote {path} (generated/originals/reconstructions x{n})")

    if args.eval_only:
        trainer.restore_checkpoint()
        ll = trainer.evaluate_log_likelihood(
            max_examples=args.ll_max_examples, repeats=args.ll_repeats)
        if args.generate:
            write_samples(args.generate)
        result = {f"test/log_likelihood_iwae": ll,
                  "step": int(trainer.step), "eval_only": True}
        print(json.dumps(result))
        return result
    if args.resume:
        trainer.restore_checkpoint()
        print(f"resumed at step {int(trainer.step)}")
    result = trainer.fit(ll_max_examples=args.ll_max_examples,
                         profile_epochs=args.profile_epochs,
                         ll_repeats=args.ll_repeats)
    result["fused_paths"] = trainer.fused_paths
    if args.generate:
        write_samples(args.generate)

    summary = {k: v for k, v in result.items() if k != "history"}
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    (Path(run_dir) / "result.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    return result


if __name__ == "__main__":
    main()
