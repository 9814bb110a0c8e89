"""Round-3 headline matrix: every judged config trained to CONVERGENCE
(default 100 epochs — the round-2 15-epoch table left s6:wrapped underfit,
RESULTS_r3.md §4d) and evaluated with FULL-test-split IWAE-500 under the
pinned (`fixed`) eval binarization, averaged over --ll_repeats passes.

Runs all configs inside one process so jit/Mosaic compilation caches are
shared where shapes coincide. Usage:

    python scripts/run_r2_matrix.py [--epochs 5] [--out RESULTS_r2_matrix.json]
"""
from __future__ import annotations

import argparse
import json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--out", default="RESULTS_r3_matrix.json")
    ap.add_argument("--ll_repeats", type=int, default=2)
    ap.add_argument("--eval_binarize", default="fixed")
    ap.add_argument("--only", default=None,
                    help="comma-separated tag substrings: rerun just these "
                         "configs and patch them into an existing --out file")
    args = ap.parse_args()

    from mvae_tpu.cli import main as cli_main

    configs = CONFIGS
    rows = []
    if args.only:
        pats = args.only.split(",")
        configs = [(t, a) for t, a in CONFIGS
                   if any(p in t for p in pats)]
        out = Path(args.out)
        if out.exists():
            rows = [r for r in json.loads(out.read_text())
                    if not any(p in r.get("tag", "") for p in pats)]
    for tag, cli_args in configs:
        run_dir = f"runs/r3_matrix/{tag.replace('/', '_')}"
        full = cli_args + [
            "--epochs", str(args.epochs), "--batch_size",
            str(args.batch_size), "--burnin", "10", "--seed", "11",
            "--likelihood_n", "500", "--run_dir", run_dir,
            "--ll_repeats", str(args.ll_repeats),
            "--eval_binarize", args.eval_binarize,
        ]
        t0 = time.time()
        try:
            result = {k: v for k, v in cli_main(full).items()
                      if k != "history"}
            result.update(tag=tag, wall_s=round(time.time() - t0, 1),
                          status="OK")
        except Exception as e:  # keep the matrix going
            result = {"tag": tag, "status": f"FAIL {type(e).__name__}",
                      "error": str(e)[:300],
                      "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(result), flush=True)
        rows.append(result)
        Path(args.out).write_text(json.dumps(rows, indent=1))

    print(f"wrote {args.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
