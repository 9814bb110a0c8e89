"""Refresh RESULTS_r5_matrix.json rows' fused_paths report at HEAD.

Round 5 deleted the vMF m != 3 wx tail channel AFTER the matrix ran
(routing policy v2 -> v3). The deletion changes NO traced program for any
matrix config — products containing vMF m != 3 routed to the jnp tail
under v2 by policy (wx_rows short-circuit) and route there under v3 by
capability — but the report's reason string and policy id move. This
script recomputes `fused_path_report` for every config at HEAD (same
backend the matrix ran on) and patches each row in place, preserving the
as-run report under `fused_paths_at_run` whenever it differed.

HARD SAFETY CHECK: if any row's set of ACTIVE kernels would change, the
traced-program-identity premise is false and the script aborts — that
situation demands a re-run of the affected rows, not a metadata patch.

Usage:
    python scripts/refresh_matrix_metadata.py [--matrix RESULTS_r5_matrix.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from run_r5_matrix import CONFIGS  # noqa: E402  (scripts/ sibling import)


def active_set(report: dict) -> set:
    """The set of fused kernels a report says are traced in — the bits that
    must be invariant for a metadata-only patch to be honest."""
    out = set()
    for k in ("train_tail", "train_decoder", "iwae_decoder"):
        if report.get(k, {}).get("active"):
            out.add(k)
    for i, ent in enumerate(report.get("iwae_reparam", [])):
        if ent.get("active"):
            out.add(f"iwae_reparam[{i}]")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrix", default="RESULTS_r5_matrix.json")
    args = ap.parse_args()

    import jax

    from mvae_tpu.components import parse_components
    from mvae_tpu.data import load_dataset
    from mvae_tpu.models import VAEConfig, init_params
    from mvae_tpu.models.vae import fused_path_report

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    reports = {}
    datasets = {}
    for tag, cli_args in CONFIGS:
        kv = dict(zip(cli_args[::2], cli_args[1::2]))
        dataset = kv["--dataset"]
        if dataset not in datasets:
            datasets[dataset] = load_dataset(dataset)
        ds = datasets[dataset]
        comps = parse_components(
            kv["--model"],
            fixed_curvature=kv.get("--fixed_curvature", "True") == "True")
        arch = "conv" if dataset == "cifar" else "mlp"
        cfg = VAEConfig(components=comps, data_shape=ds.data_shape,
                        arch=arch, h_dim=400)
        params = init_params(jax.random.key(0), cfg)
        reports[tag] = fused_path_report(cfg, params)

    path = Path(args.matrix)
    rows = json.loads(path.read_text())
    patched = unchanged = 0
    for row in rows:
        rep = reports.get(row.get("tag"))
        if rep is None or "fused_paths" not in row:
            continue
        old = row["fused_paths"]
        if old == rep:
            unchanged += 1
            continue
        if active_set(old) != active_set(rep):
            sys.exit(f"ABORT: active kernel set changed for "
                     f"{row['tag']} seed {row.get('seed')}: "
                     f"{active_set(old)} -> {active_set(rep)}; "
                     f"re-run this row instead of patching metadata.")
        row["fused_paths_at_run"] = old
        row["routing_policy_at_run"] = row.get("routing_policy")
        row["fused_paths"] = rep
        row["routing_policy"] = rep.get("routing_policy")
        patched += 1

    path.write_text(json.dumps(rows, indent=1, allow_nan=False))
    print(f"{path}: {patched} rows patched to HEAD report "
          f"(active sets verified identical), {unchanged} already match")


if __name__ == "__main__":
    main()
