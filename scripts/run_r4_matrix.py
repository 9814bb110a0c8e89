"""Round-4 headline matrix: every judged config trained to convergence
(default 100 epochs) and evaluated with FULL-test-split IWAE-500 under the
pinned (`fixed`) eval binarization, averaged over --ll_repeats passes.

Round-4 deltas vs scripts/run_r3_matrix.py:
  * the trainer's non-finite guard halts diverged runs at the first bad
    epoch; such rows carry status FAILED_NONFINITE (never "OK" with a NaN
    headline — advisor r3);
  * output is RFC 8259-valid JSON: non-finite floats serialize as None
    (advisor r3: bare NaN tokens broke non-Python consumers);
  * each row records the run's fused_paths report (VERDICT r3 #7).

Usage:
    python scripts/run_r4_matrix.py [--epochs 100] [--only s6-wrapped,d2p2e2]
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


def finite_or_none(obj):
    """Map non-finite floats to None so the output is valid JSON."""
    if isinstance(obj, dict):
        return {k: finite_or_none(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [finite_or_none(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--out", default="RESULTS_r4_matrix.json")
    ap.add_argument("--ll_repeats", type=int, default=2)
    ap.add_argument("--eval_binarize", default="fixed")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--only", default=None,
                    help="comma-separated tag substrings: rerun just these "
                         "configs and patch them into an existing --out file")
    args = ap.parse_args()

    from mvae_tpu.cli import main as cli_main
    from mvae_tpu.train.trainer import NonFiniteError

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
        run_dir = f"runs/r4_matrix/{tag.replace('/', '_')}"
        full = cli_args + [
            "--epochs", str(args.epochs), "--batch_size",
            str(args.batch_size), "--burnin", "10", "--seed",
            str(args.seed), "--likelihood_n", "500", "--run_dir", run_dir,
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
            result.update(tag=tag, wall_s=round(time.time() - t0, 1),
                          status=status)
        except NonFiniteError as e:
            result = {"tag": tag, "status": "FAILED_NONFINITE",
                      "nonfinite_epoch": e.epoch,
                      "last_finite_step": e.last_finite_step,
                      "error": str(e)[:300],
                      "wall_s": round(time.time() - t0, 1)}
        except Exception as e:  # keep the matrix going
            result = {"tag": tag, "status": f"FAIL {type(e).__name__}",
                      "error": str(e)[:300],
                      "wall_s": round(time.time() - t0, 1)}
        result = finite_or_none(result)
        print(json.dumps(result), flush=True)
        rows.append(result)
        Path(args.out).write_text(
            json.dumps(rows, indent=1, allow_nan=False))

    n_ok = sum(r.get("status") == "OK" for r in rows)
    print(f"wrote {args.out}: {n_ok}/{len(rows)} rows OK")


if __name__ == "__main__":
    main()
