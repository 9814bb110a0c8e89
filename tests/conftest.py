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
import pathlib

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from jax.extend import backend as _jex_backend

_jex_backend.clear_backends()
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is COMPILE-bound on this
# box's single host core (measured: programs >0.5s compile dominate the
# wall time), and the cache is content-addressed so a hit is exactly the
# executable a cold compile would produce. First-ever run pays full
# compiles; subsequent runs load them (measured 2.7x on tests/parallel).
# The dir is repo-local and gitignored — wiped automatically by any jax
# upgrade (the key includes the jax/XLA version).
_CACHE_DIR = pathlib.Path(__file__).resolve().parent.parent / ".jax_test_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


import gc

# The cyclic GC is the other single-core tax: with hundreds of live jitted
# executables the automatic threshold-triggered full collections grew tests
# to ~15-20x their standalone time late in big modules (measured: the same
# test 0.8s standalone, 15s in-suite). Allocation-heavy numerical tests
# create few true cycles; collect explicitly at module boundaries instead.
gc.disable()


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables + tracing caches after each test module.

    The suite is one process on one host core; by its tail, hundreds of
    live jitted executables make every full GC pass (and some jax-internal
    cache scans) measurably slower — tests ran ~2.5x slower late in the
    full run than standalone. With the persistent compilation cache on
    disk (above), a cross-module re-compile is a cheap disk hit, so
    clearing is nearly free."""
    yield
    jax.clear_caches()
    gc.collect()


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
