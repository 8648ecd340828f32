"""ctypes bindings for the native C++ idx loader (csrc/idx_loader.cpp).

Build with ``make -C csrc`` (produces qgemm_tpu/data/libqgemm_data.so).
mmap + multithreaded /255 normalization; bit-identical to the numpy parser
in qgemm_tpu.data.mnist (the C++ side uses a true-division LUT).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libqgemm_data.so")
_lib = None

_ERRORS = {1: "open failed", 2: "bad idx magic", 3: "truncated file"}


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.qg_idx_images_info.argtypes = [ctypes.c_char_p, i64p, i64p, i64p]
    lib.qg_idx_images_info.restype = ctypes.c_int
    lib.qg_idx_load_images.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
    lib.qg_idx_load_images.restype = ctypes.c_int
    lib.qg_idx_labels_info.argtypes = [ctypes.c_char_p, i64p]
    lib.qg_idx_labels_info.restype = ctypes.c_int
    lib.qg_idx_load_labels.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
    lib.qg_idx_load_labels.restype = ctypes.c_int
    lib.qg_shuffle_indices.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64]
    lib.qg_shuffle_indices.restype = None
    _lib = lib
    return lib


def available() -> bool:
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        _load()
        return True
    except OSError:
        return False


def _check(rc: int, path: str) -> None:
    if rc != 0:
        raise ValueError(f"{path}: {_ERRORS.get(rc, f'error {rc}')}")


def load_idx_images(path: str) -> np.ndarray:
    lib = _load()
    n = ctypes.c_int64()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    p = path.encode()
    _check(lib.qg_idx_images_info(p, n, rows, cols), path)
    out = np.empty((n.value, rows.value * cols.value), dtype=np.float32)
    _check(lib.qg_idx_load_images(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))), path)
    return out


def load_idx_labels(path: str) -> np.ndarray:
    lib = _load()
    n = ctypes.c_int64()
    p = path.encode()
    _check(lib.qg_idx_labels_info(p, n), path)
    out = np.empty((n.value,), dtype=np.int32)
    _check(lib.qg_idx_load_labels(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))), path)
    return out


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic Fisher-Yates permutation of range(n) (splitmix64 PRNG)."""
    lib = _load()
    out = np.empty((n,), dtype=np.int64)
    lib.qg_shuffle_indices(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, seed)
    return out
