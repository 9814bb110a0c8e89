"""Round-5 headline matrix: the judged configs trained to convergence and
evaluated with FULL-test-split IWAE-500 (fixed eval binarization, averaged
over --ll_repeats passes), on HEAD's SHIPPED kernel routing.

Round-5 deltas vs scripts/run_r4_matrix.py (VERDICT r4 #1/#3/#7):

  * multi-seed: --seeds takes a comma list; one row per (config, seed) is
    appended/patched into --out keyed by (tag, seed), and a "summary"
    sidecar file reports mean +/- std per tag with the seed spread flagged
    when it exceeds 0.3 nats;
  * each row records train-ONLY throughput (`train_steps_per_sec`,
    excluding eval wall) next to the whole-run wall, so cross-round
    throughput comparisons stop being apples-to-oranges;
  * each row records `routing_policy` (the tail-kernel routing table
    version actually traced) in addition to the full `fused_paths` report,
    both produced by the same gate predicate the traced program consumed.

Usage:
    python scripts/run_r5_matrix.py                      # all configs, seed 11
    python scripts/run_r5_matrix.py --seeds 0,7,19,23 \
        --only e6,h6,s6-vmf,s6-wrapped,h2s2e2-learnK/mnist,u6-learnK-conv
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIGS = [
    # (tag, cli args)
    ("e6/mnist", ["--dataset", "mnist", "--model", "e6"]),
    ("h6/mnist", ["--dataset", "mnist", "--model", "h6"]),
    ("d6/mnist", ["--dataset", "mnist", "--model", "d6"]),
    ("s6-vmf/mnist", ["--dataset", "mnist", "--model", "s6"]),
    ("s6-wrapped/mnist", ["--dataset", "mnist", "--model", "s6:wrapped"]),
    ("p6/mnist", ["--dataset", "mnist", "--model", "p6"]),
    ("u6-learnK/mnist", ["--dataset", "mnist", "--model", "u6",
                         "--fixed_curvature", "False"]),
    ("h2s2e2-learnK/mnist", ["--dataset", "mnist", "--model", "h2,s2,e2",
                             "--fixed_curvature", "False"]),
    ("h2s2e2-learnK/omniglot", ["--dataset", "omniglot", "--model",
                                "h2,s2,e2", "--fixed_curvature", "False"]),
    ("d6-riemannian/mnist", ["--dataset", "mnist", "--model",
                             "d6:riemannian"]),
    ("u6-learnK-conv/cifar", ["--dataset", "cifar", "--model", "u6",
                              "--fixed_curvature", "False"]),
    ("h4/bdp", ["--dataset", "bdp", "--model", "h4"]),
    # paper-style product table extensions (multiplier-prefix DSL)
    ("3h2-learnK/mnist", ["--dataset", "mnist", "--model", "3h2",
                          "--fixed_curvature", "False"]),
    ("3s2-learnK/mnist", ["--dataset", "mnist", "--model", "3s2",
                          "--fixed_curvature", "False"]),
    ("d2p2e2-learnK/mnist", ["--dataset", "mnist", "--model", "d2,p2,e2",
                             "--fixed_curvature", "False"]),
]

SEED_SPREAD_FLAG_NATS = 0.3


def finite_or_none(obj):
    """Map non-finite floats to None so the output is valid JSON."""
    if isinstance(obj, dict):
        return {k: finite_or_none(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [finite_or_none(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


def summarize(rows):
    """Per-tag mean +/- std of the headline LL over seeds."""
    by_tag: dict = {}
    for r in rows:
        ll = r.get("test/log_likelihood_iwae")
        if r.get("status") == "OK" and isinstance(ll, float):
            by_tag.setdefault(r["tag"], []).append((r.get("seed"), ll))
    out = {}
    for tag, vals in sorted(by_tag.items()):
        lls = [v for _, v in vals]
        mean = sum(lls) / len(lls)
        std = (sum((v - mean) ** 2 for v in lls) / len(lls)) ** 0.5
        spread = max(lls) - min(lls)
        out[tag] = {
            "n_seeds": len(lls),
            "seeds": [s for s, _ in vals],
            "ll_mean": round(mean, 3),
            "ll_std": round(std, 4),
            "ll_per_seed": [round(v, 3) for v in lls],
            "seed_spread_nats": round(spread, 4),
            "spread_exceeds_0.3": spread > SEED_SPREAD_FLAG_NATS,
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--out", default="RESULTS_r5_matrix.json")
    ap.add_argument("--summary_out", default=None,
                    help="default: <out stem>_summary.json")
    ap.add_argument("--ll_repeats", type=int, default=2)
    ap.add_argument("--eval_binarize", default="fixed")
    ap.add_argument("--seeds", default="11",
                    help="comma-separated seeds; one row per (config, seed)")
    ap.add_argument("--only", default=None,
                    help="comma-separated tag substrings: run just these "
                         "configs (existing non-matching rows in --out are "
                         "kept; matching (tag, seed) rows are replaced)")
    args = ap.parse_args()

    from mvae_tpu.cli import main as cli_main
    from mvae_tpu.train.trainer import NonFiniteError

    seeds = [int(s) for s in args.seeds.split(",")]
    configs = CONFIGS
    if args.only:
        pats = args.only.split(",")
        configs = [(t, a) for t, a in CONFIGS
                   if any(p in t for p in pats)]
    todo = {(t, s) for t, _ in configs for s in seeds}
    rows = []
    out = Path(args.out)
    if out.exists():
        rows = [r for r in json.loads(out.read_text())
                if (r.get("tag"), r.get("seed")) not in todo]
    summary_out = Path(args.summary_out
                       or out.with_name(out.stem + "_summary.json"))

    for seed in seeds:
        for tag, cli_args in configs:
            run_dir = f"runs/r5_matrix/{tag.replace('/', '_')}_s{seed}"
            full = cli_args + [
                "--epochs", str(args.epochs), "--batch_size",
                str(args.batch_size), "--burnin", "10", "--seed",
                str(seed), "--likelihood_n", "500", "--run_dir", run_dir,
                "--ll_repeats", str(args.ll_repeats),
                "--eval_binarize", args.eval_binarize,
            ]
            t0 = time.time()
            try:
                result = {k: v for k, v in cli_main(full).items()
                          if k != "history"}
                ll = result.get("test/log_likelihood_iwae")
                status = "OK" if (isinstance(ll, float)
                                  and math.isfinite(ll)) else "NAN"
                result.update(tag=tag, seed=seed,
                              wall_s=round(time.time() - t0, 1),
                              status=status)
                fp = result.get("fused_paths") or {}
                result["routing_policy"] = fp.get("routing_policy",
                                                  "unknown")
            except NonFiniteError as e:
                result = {"tag": tag, "seed": seed,
                          "status": "FAILED_NONFINITE",
                          "nonfinite_epoch": e.epoch,
                          "last_finite_step": e.last_finite_step,
                          "error": str(e)[:300],
                          "wall_s": round(time.time() - t0, 1)}
            except Exception as e:  # keep the matrix going
                result = {"tag": tag, "seed": seed,
                          "status": f"FAIL {type(e).__name__}",
                          "error": str(e)[:300],
                          "wall_s": round(time.time() - t0, 1)}
            result = finite_or_none(result)
            print(json.dumps(result), flush=True)
            rows.append(result)
            Path(args.out).write_text(
                json.dumps(rows, indent=1, allow_nan=False))
            summary_out.write_text(
                json.dumps(summarize(rows), indent=1, allow_nan=False))

    n_ok = sum(r.get("status") == "OK" for r in rows)
    print(f"wrote {args.out}: {n_ok}/{len(rows)} rows OK; "
          f"summary -> {summary_out}")


if __name__ == "__main__":
    main()
