"""HBM-bandwidth roofline measurement for the Pallas manifold kernels.

Run on the TPU:  python -m mvae_tpu.kernels.roofline

Methodology (this backend makes naive timing lie — see memory notes /
bench.py comments): `block_until_ready` can return before execution
completes and the relay serves repeated identical calls from a cache, so
each measurement (a) runs K op applications chained inside ONE jitted
lax.scan with an input mutation per iteration (unique work, no hoisting),
(b) forces completion with a scalar host readback, and (c) isolates the
op's marginal cost by differencing two scans that differ ONLY in how many
iterations apply the op (same mutation count), then divides by the
iteration delta.

Roofline: TPU v5e HBM ~819 GB/s. Bytes counted are the op's logical
reads+writes (inputs at n = 128 lanes => no tile padding inflation).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from . import manifold_kernels as mk
from ..ops import lorentz as lorentz_ops
from ..ops import stereographic as stereo_ops

HBM_GBPS = 819.0  # TPU v5e nominal
B, N = 1 << 20, 128
ITERS_LO, ITERS_HI = 4, 20


def _measure(op_fn, n_in_arrays: int, extra_out_bytes: int, name: str,
             results: list):
    """Marginal-cost measurement of op_fn(x, y, k) -> per-row scalar-ish."""
    x0 = jax.random.normal(jax.random.key(0), (B, N)) * 0.05
    y0 = jax.random.normal(jax.random.key(1), (B, N)) * 0.05
    k = jnp.float32(-1.0)

    def make(n_op_iters: int, total_iters: int):
        @jax.jit
        def run(x, y):
            def body(carry, i):
                x, acc = carry
                x = x + 1e-9  # unique work each iteration
                def with_op(x):
                    out = op_fn(x, y, k)
                    return acc + jnp.sum(out[0] if isinstance(out, tuple)
                                         else out)
                def without_op(x):
                    return acc + x[0, 0]
                acc2 = jax.lax.cond(i < n_op_iters, with_op, without_op, x)
                return (x, acc2), None
            (x, acc), _ = jax.lax.scan(
                body, (x, jnp.float32(0)),
                jnp.arange(total_iters, dtype=jnp.int32))
            return acc
        return run

    t = {}
    for n_op in (ITERS_LO, ITERS_HI):
        run = make(n_op, ITERS_HI + 2)
        float(run(x0, y0))  # compile + warm
        best = 1e9
        for r in range(3):
            xr = x0 + (r + 1) * 1e-8
            t0 = time.time()
            float(run(xr, y0))
            best = min(best, time.time() - t0)
        t[n_op] = best
    per_op = (t[ITERS_HI] - t[ITERS_LO]) / (ITERS_HI - ITERS_LO)
    gb = (n_in_arrays * B * N * 4 + B * 4 + extra_out_bytes) / 1e9
    gbps = gb / per_op
    util = 100.0 * gbps / HBM_GBPS
    print(f"{name:26s} {per_op * 1e3:7.3f} ms/op  {gbps:6.0f} GB/s "
          f"({util:.0f}% of v5e roofline)", file=sys.stderr, flush=True)
    results.append({"kernel": name, "ms_per_op": round(per_op * 1e3, 3),
                    "gbps": round(gbps, 1),
                    "roofline_util_pct": round(util, 1)})


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    results = []

    _measure(mk.stereo_distance, 2, 0, "pallas stereo_distance", results)
    _measure(lambda x, y, k: stereo_ops.distance(x, y, k), 2, 0,
             "xla   stereo_distance", results)
    _measure(mk.lorentz_distance, 2, 0, "pallas lorentz_distance", results)
    _measure(lambda x, y, k: lorentz_ops.distance(x, y, k), 2, 0,
             "xla   lorentz_distance", results)

    sigma = 0.8
    _measure(lambda v, mu, k: mk.wrapped_sample_stereo(
        v, mu, jnp.float32(sigma), k), 2, B * N * 4,
        "pallas wrapped_sample", results)
    _measure(lambda v, mu, k: mk._wrapped_sample_jnp(
        v, mu, jnp.float32(sigma), k), 2, B * N * 4,
        "xla   wrapped_sample", results)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
