"""ctypes bindings for the native host-data engine (native/host_data.cc).

Loads ``native/libmvae_host.so`` if built (``make -C native``); every entry
point has a pure-numpy fallback with identical semantics, tested against
each other. The native path covers the reference's DataLoader-worker role:
IDX(.gz) decode, deterministic epoch permutation, fused gather batch
assembly.
"""
from __future__ import annotations

import ctypes
import functools
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libmvae_host.so"


@functools.cache
def _lib():
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.mvae_idx_read_f32.restype = ctypes.c_int
    lib.mvae_idx_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.mvae_free.argtypes = [ctypes.c_void_p]
    lib.mvae_permutation.argtypes = [ctypes.c_uint64, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int64)]
    lib.mvae_gather_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    return lib


def available() -> bool:
    return _lib() is not None


def read_idx_f32(path) -> np.ndarray:
    """IDX(.gz) file -> float32 array in [0,1]; native decode when built."""
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    data_p = ctypes.POINTER(ctypes.c_float)()
    dims = (ctypes.c_int64 * 4)()
    ndim = ctypes.c_int()
    rc = lib.mvae_idx_read_f32(str(path).encode(), ctypes.byref(data_p),
                               dims, ctypes.byref(ndim))
    if rc != 0:
        raise IOError(f"native IDX decode failed (rc={rc}) for {path}")
    shape = tuple(dims[i] for i in range(ndim.value))
    n = int(np.prod(shape))
    out = np.ctypeslib.as_array(data_p, shape=(n,)).reshape(shape).copy()
    lib.mvae_free(data_p)
    return out


def permutation(seed: int, n: int) -> np.ndarray:
    lib = _lib()
    if lib is None:
        return np.random.default_rng(seed).permutation(n)
    out = np.empty(n, np.int64)
    lib.mvae_permutation(ctypes.c_uint64(seed & (2**64 - 1)), n,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """src (n, ...) float32 -> src[indices] via the native fused gather."""
    lib = _lib()
    src = np.ascontiguousarray(src, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    if lib is None:
        return src[indices]
    row_elems = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    dst = np.empty((len(indices),) + src.shape[1:], np.float32)
    lib.mvae_gather_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), row_elems,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst
