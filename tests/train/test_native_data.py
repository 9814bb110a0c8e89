"""Native host-data engine vs numpy fallback equivalence.

Builds native/libmvae_host.so on the fly if a compiler is present; skips
(rather than fails) in environments without a toolchain.
"""
import gzip
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from mvae_tpu.data import native

ROOT = Path(__file__).resolve().parents[2]


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not (ROOT / "native" / "libmvae_host.so").exists():
        try:
            subprocess.run(["make", "-C", str(ROOT / "native")], check=True,
                           capture_output=True)
        except Exception:
            pytest.skip("no native toolchain available")
        native._lib.cache_clear()
    if not native.available():
        pytest.skip("native library failed to load")


class TestNativeData:
    def test_idx_roundtrip(self, tmp_path):
        payload = np.arange(24, dtype=np.uint8)
        raw = struct.pack(">BBBB", 0, 0, 8, 3) + struct.pack(
            ">III", 4, 3, 2) + payload.tobytes()
        p = tmp_path / "x.idx"
        p.write_bytes(raw)
        arr = native.read_idx_f32(p)
        assert arr.shape == (4, 3, 2)
        np.testing.assert_allclose(arr.ravel() * 255.0, payload, atol=1e-4)
        pgz = tmp_path / "x.idx.gz"
        with gzip.open(pgz, "wb") as f:
            f.write(raw)
        np.testing.assert_array_equal(native.read_idx_f32(pgz), arr)

    def test_permutation_valid_and_deterministic(self):
        a = native.permutation(123, 1000)
        b = native.permutation(123, 1000)
        c = native.permutation(124, 1000)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        np.testing.assert_array_equal(np.sort(a), np.arange(1000))

    def test_gather_matches_numpy(self):
        src = np.random.default_rng(0).random((100, 7, 3)).astype(np.float32)
        idx = np.array([5, 0, 99, 42, 5], np.int64)
        np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])

    def test_epoch_batches_native_path(self):
        from mvae_tpu.data import ArrayDataset
        data = np.random.default_rng(1).random((64, 5)).astype(np.float32)
        ds = ArrayDataset("t", data, data[:16], (5,), binarize=False)
        batches = list(ds.epoch_batches(0, 16))
        assert len(batches) == 4
        stacked = np.concatenate(batches)
        # a permutation of the corpus
        np.testing.assert_allclose(np.sort(stacked, axis=0),
                                   np.sort(data, axis=0))
