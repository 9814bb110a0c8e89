"""Regression: the driver's multi-chip dryrun must succeed WITHOUT
JAX_PLATFORMS=cpu in the environment (MULTICHIP_r01.json failed rc=1 when a
TPU-backend probe ran before the CPU switch and hit a transient libtpu
version mismatch). The entry point must force CPU itself, never touching
whatever backend JAX_PLATFORMS points at."""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_subprocess_without_cpu_env():
    env = dict(os.environ)
    # reproduce the driver's invocation: JAX_PLATFORMS is whatever the
    # machine environment has (axon here) — NOT cpu
    if env.get("JAX_PLATFORMS") == "cpu":
        del env["JAX_PLATFORMS"]
    env.pop("_MVAE_DRYRUN_SUBPROCESS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-3000:]}"
    assert "dryrun_multichip OK" in r.stdout, r.stdout[-2000:]
