"""Dataset abstraction (L6).

Capability parity with the reference's ``VaeDataset`` (``mt/data/`` in
oskopek/mvae [UNVERIFIED]): each dataset exposes train/test arrays, the
input shape, a reconstruction-likelihood tag, and (for MNIST/Omniglot) the
DYNAMIC BINARIZATION convention — pixels are resampled as Bernoulli(intensity)
every epoch.

TPU-native difference: binarization happens *inside the jitted train step*
(``binarize_batch`` with an explicit PRNG key) instead of in host dataloader
workers — it fuses with the first encoder matmul and keeps the host pipeline
a pure array feed. Batching is simple shuffled numpy slicing; the whole
corpus fits in HBM for every reference dataset, so the device-resident
fast path (used by bench/training) is just one device_put.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ArrayDataset:
    """In-memory dataset of real-valued intensities in [0, 1]."""

    name: str
    train: np.ndarray           # (N_train, *data_shape) float32 in [0,1]
    test: np.ndarray            # (N_test, *data_shape)
    data_shape: tuple[int, ...]
    binarize: bool              # dynamic binarization on?
    likelihood: str = "bernoulli"
    synthetic: bool = False     # True when a procedural fallback was used

    @property
    def in_dim(self) -> int:
        out = 1
        for s in self.data_shape:
            out *= s
        return out

    def epoch_batches(self, epoch: int, batch_size: int,
                      split: str = "train") -> Iterator[np.ndarray]:
        """Shuffled full batches (remainder dropped, static shapes for jit).

        Uses the native host-data engine (permutation + fused gather) when
        ``native/libmvae_host.so`` is built; numpy otherwise."""
        import zlib

        from . import native
        data = self.train if split == "train" else self.test
        # stable across processes (str hash() is per-process randomized)
        seed = zlib.crc32(f"{self.name}/{split}/{epoch}".encode())
        if native.available():
            idx = native.permutation(seed, len(data))
            n_full = len(data) // batch_size
            for b in range(n_full):
                yield native.gather_rows(
                    data, idx[b * batch_size:(b + 1) * batch_size])
            return
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(data))
        n_full = len(data) // batch_size
        for b in range(n_full):
            yield data[idx[b * batch_size:(b + 1) * batch_size]]

    def eval_batches(self, batch_size: int,
                     split: str = "test") -> Iterator[np.ndarray]:
        """Deterministic order, remainder kept (padded by caller if needed)."""
        data = self.train if split == "train" else self.test
        for b in range(0, len(data), batch_size):
            yield data[b:b + batch_size]


def binarize_batch(key, batch, enabled: bool):
    """Dynamic binarization: x ~ Bernoulli(intensity), fresh every call.

    Runs on device inside the jitted step (enabled is static).

    The result is pinned behind an optimization barrier: in the training
    step x is consumed twice (encoder GEMM input AND the BCE term), and
    without the barrier XLA rematerializes the whole PRNG+compare into the
    BCE reduce fusion — the per-element random-bit generation is the single
    most expensive VPU op in the step, and it ran TWICE (profiled on v5e:
    barrier alone takes the h2,s2,e2 batch-1024 step 135.5 -> 115.6 us)."""
    if not enabled:
        return batch
    u = jax.random.uniform(key, batch.shape, dtype=batch.dtype)
    return jax.lax.optimization_barrier((u < batch).astype(batch.dtype))


def binarize_rows(row_keys, batch, enabled: bool):
    """Per-ROW binarization: row i of ``batch`` uses ``row_keys[i]``.

    The eval paths use this so a pinned ("fixed") binarization is a pure
    function of (seed, global example index) — INDEPENDENT of the eval
    batch size. Keying per batch instead (round-2) silently re-binarized
    the whole test set whenever eval_batch_size changed, which is exactly
    the instrument drift a sub-0.1-nat comparison must exclude."""
    if not enabled:
        return batch
    u = jax.vmap(
        lambda k, row: jax.random.uniform(k, row.shape, dtype=row.dtype))(
            row_keys, batch)
    return (u < batch).astype(batch.dtype)


def to_device_dataset(ds: ArrayDataset, dtype=jnp.float32):
    """Puts both splits in HBM once; returns (train, test) device arrays."""
    return (jnp.asarray(ds.train, dtype), jnp.asarray(ds.test, dtype))
