"""Numeric comparison harness.

TPU-native analogue of the reference's ``op_allclose``
(src/ops/op_elemwise.cuh:750-784; tolerances src/utils/tensor.cuh:10-11:
rtol = atol = 1e-6). We keep the same elementwise criterion
``|a - b| <= atol + rtol * |b|`` and default tolerances, exposed for tests.
"""

from __future__ import annotations

import numpy as np

DEFAULT_RTOL = 1e-6
DEFAULT_ATOL = 1e-6


def allclose(a, b, rtol: float = DEFAULT_RTOL, atol: float = DEFAULT_ATOL) -> bool:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        return False
    return bool(np.all(np.abs(a - b) <= atol + rtol * np.abs(b)))


def assert_allclose(a, b, rtol: float = DEFAULT_RTOL, atol: float = DEFAULT_ATOL, msg: str = ""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape} {msg}"
    err = np.abs(a - b) - (atol + rtol * np.abs(b))
    if np.any(err > 0):
        worst = np.unravel_index(np.argmax(err), err.shape)
        raise AssertionError(
            f"allclose failed {msg}: worst at {worst}: a={a[worst]!r} b={b[worst]!r} "
            f"(max |a-b|={np.max(np.abs(a - b)):.3e}, rtol={rtol}, atol={atol})"
        )


def mean_abs_error(a, b) -> float:
    """Mean |a-b| — the reference's quantization-error metric
    (src/test_quantize.cu:82-86, src/timing_quantize.cu:67-71)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean(np.abs(a - b)))


def rel_fro_error(a, b) -> float:
    """Relative Frobenius error ||a-b||_F / ||b||_F (scale-free quant metric)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))
