"""Tracing / profiling helpers (SURVEY.md §5 aux-subsystem row).

The reference has none (tqdm only); TPU-native equivalent: jax.profiler
traces viewable in Perfetto/TensorBoard, plus a NaN/Inf guard mode for
debugging runs (the jit-friendly stand-in for the reference's reliance on
float64 to dodge numerical blowups).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile"):
    """Capture a device trace around a code block:

        with profiling.trace("runs/profile"):
            trainer.train_one_epoch(0)

    Open the resulting trace in Perfetto (ui.perfetto.dev) or TensorBoard's
    profile plugin. Note: the experimental axon PJRT plugin may not support
    device-side tracing; host-side events still appear.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_guard():
    """Fail fast (with a traceback to the offending op) on any NaN/Inf
    produced under jit — slower; debugging only."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


def disable_nan_guard():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
