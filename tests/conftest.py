"""Test configuration: force CPU with 8 virtual devices and enable x64.

Tests run on CPU (the TPU chip is reserved for benchmarks, and first-compile
latency on the axon PJRT plugin is minutes). Multi-device sharding tests use
8 virtual CPU devices, the TPU-era analog of a simulated cluster
(SURVEY.md section 4). float64 is enabled *for oracle computation in tests
only* — library code is always explicit about dtypes and must be correct in
f32/bf16 (SURVEY.md section 5, numerical-precision row).

Note: this environment's sitecustomize initializes the axon TPU backend at
interpreter start, so env vars alone are too late — we reconfigure jax and
clear already-initialized backends instead.
"""
import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from jax.extend import backend as _jex_backend

_jex_backend.clear_backends()
jax.config.update("jax_enable_x64", True)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run @pytest.mark.slow tests (the full profile; the "
             "default fast profile keeps the suite CI-sized)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
