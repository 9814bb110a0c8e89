"""Real-file loader paths: MNIST npz/IDX, Omniglot npz, CIFAR pickles read
from MVAE_DATA_DIR (exercises the non-synthetic branches of data/loaders)."""
import gzip
import pickle
import struct

import numpy as np
import pytest

from mvae_tpu.data import loaders


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("MVAE_DATA_DIR", str(tmp_path))
    return tmp_path


def _write_idx_images(path, n, hw=28, gz=False):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, hw, hw), dtype=np.uint8)
    raw = struct.pack(">BBBB", 0, 0, 8, 3) + struct.pack(
        ">III", n, hw, hw) + imgs.tobytes()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(raw)
    else:
        path.write_bytes(raw)
    return imgs


class TestMnistFiles:
    def test_idx_layout(self, data_dir):
        tr = _write_idx_images(data_dir / "train-images-idx3-ubyte", 50)
        te = _write_idx_images(data_dir / "t10k-images-idx3-ubyte", 20)
        ds = loaders.load_mnist()
        assert not ds.synthetic
        assert ds.train.shape == (50, 28, 28)
        np.testing.assert_allclose(ds.train, tr.astype(np.float32) / 255.0,
                                   atol=1e-4)
        assert ds.test.shape == (20, 28, 28)
        np.testing.assert_allclose(ds.test, te.astype(np.float32) / 255.0,
                                   atol=1e-4)

    def test_idx_gz_layout(self, data_dir):
        _write_idx_images(data_dir / "train-images-idx3-ubyte.gz", 30,
                          gz=True)
        _write_idx_images(data_dir / "t10k-images-idx3-ubyte.gz", 10,
                          gz=True)
        ds = loaders.load_mnist()
        assert not ds.synthetic and ds.train.shape == (30, 28, 28)

    def test_npz_layout(self, data_dir):
        rng = np.random.default_rng(1)
        xtr = rng.integers(0, 256, (40, 28, 28), dtype=np.uint8)
        xte = rng.integers(0, 256, (15, 28, 28), dtype=np.uint8)
        np.savez(data_dir / "mnist.npz", x_train=xtr, x_test=xte,
                 y_train=np.zeros(40), y_test=np.zeros(15))
        ds = loaders.load_mnist()
        assert not ds.synthetic
        np.testing.assert_allclose(ds.train, xtr.astype(np.float32) / 255.0)


class TestOmniglotFiles:
    def test_npz(self, data_dir):
        rng = np.random.default_rng(2)
        tr = (rng.random((25, 784)) < 0.3).astype(np.float32)
        te = (rng.random((10, 784)) < 0.3).astype(np.float32)
        np.savez(data_dir / "omniglot.npz", train=tr, test=te)
        ds = loaders.load_omniglot()
        assert not ds.synthetic
        assert ds.train.shape == (25, 28, 28)
        np.testing.assert_allclose(ds.train.reshape(25, -1), tr)


class TestCifarFiles:
    def test_pickled_batches(self, data_dir):
        bdir = data_dir / "cifar-10-batches-py"
        bdir.mkdir()
        rng = np.random.default_rng(3)
        per = 7
        for i in range(1, 6):
            d = {b"data": rng.integers(0, 256, (per, 3072), dtype=np.uint8),
                 b"labels": [0] * per}
            with open(bdir / f"data_batch_{i}", "wb") as f:
                pickle.dump(d, f)
        with open(bdir / "test_batch", "wb") as f:
            pickle.dump({b"data": rng.integers(0, 256, (4, 3072),
                                               dtype=np.uint8),
                         b"labels": [0] * 4}, f)
        ds = loaders.load_cifar()
        assert not ds.synthetic
        assert ds.train.shape == (35, 32, 32, 3)
        assert ds.test.shape == (4, 32, 32, 3)
        assert 0.0 <= ds.train.min() and ds.train.max() <= 1.0
