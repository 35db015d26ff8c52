"""Host data loader backed by the native C++ reshuffle engine.

For datasets larger than HBM, the device-side schedule (subsampling.py) can't
hold the data; this loader keeps the dataset in host RAM (or mmap), draws the
epoch permutation and gathers minibatch rows in native threads off the GIL
(ops/cpp/reshuffle.cc), and hands contiguous float32 staging arrays to the
caller to `jax.device_put` (optionally double-buffered by the training loop).

The library is compiled on first use (g++ is baked into the image); if
compilation is impossible the loader falls back to a numpy implementation
with identical semantics — same permutations are NOT guaranteed between the
two backends (splitmix64 vs numpy), but both are deterministic per seed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _src_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "ops", "cpp")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_src_dir(), "reshuffle.cc")
    out = os.path.join(_src_dir(), "libreshuffle.so")
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", out, src, "-lpthread",
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(out)
        lib.avt_fill_permutation.argtypes = [
            ctypes.c_uint64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.avt_gather_rows_f32.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.avt_epoch_batches.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


def fill_permutation(seed: int, n: int) -> np.ndarray:
    lib = _load_lib()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.avt_fill_permutation(seed, n, out)
        return out
    rng = np.random.default_rng(seed)
    return rng.permutation(n).astype(np.int32)


def gather_rows(
    src: np.ndarray, idx: np.ndarray, n_threads: int = 0
) -> np.ndarray:
    """dst[k, :] = src[idx[k], :] with native threaded memcpy."""
    lib = _load_lib()
    src = np.ascontiguousarray(src, np.float32)
    idx = np.ascontiguousarray(idx, np.int32)
    dst = np.empty((idx.shape[0], src.shape[1]), np.float32)
    if lib is not None:
        if n_threads <= 0:
            n_threads = min(8, os.cpu_count() or 1)
        lib.avt_gather_rows_f32(
            src, idx, dst, idx.shape[0], src.shape[1], n_threads
        )
        return dst
    return src[idx]


class HostDataLoader:
    """Epoch-reshuffled minibatch iterator over host-resident arrays.

    Same schedule contract as the device-side ReshufflingBatchSubsampling
    (full batches only, reshuffle per epoch), for datasets beyond HBM.
    """

    def __init__(self, X: np.ndarray, y: Optional[np.ndarray], batchsize: int,
                 seed: int = 0):
        self.X = np.ascontiguousarray(X, np.float32)
        self.y = (
            np.ascontiguousarray(y.reshape(len(y), -1), np.float32)
            if y is not None
            else None
        )
        self.batchsize = batchsize
        self.n_data = X.shape[0]
        self.n_batches = self.n_data // batchsize
        if self.n_batches == 0:
            raise ValueError("batchsize exceeds dataset size")
        self.seed = seed
        self.epoch = 0
        self._step = 0
        self._perm = fill_permutation(seed, self.n_data)

    def __len__(self) -> int:
        return self.n_batches

    def next_batch(self) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        """(X_batch, y_batch, indices); advances the schedule."""
        lo = self._step * self.batchsize
        idx = self._perm[lo : lo + self.batchsize]
        Xb = gather_rows(self.X, idx)
        yb = gather_rows(self.y, idx) if self.y is not None else None
        self._step += 1
        if self._step >= self.n_batches:
            self.epoch += 1
            self._step = 0
            self._perm = fill_permutation(
                self.seed + 0x9E3779B9 * self.epoch, self.n_data
            )
        return Xb, yb, idx
