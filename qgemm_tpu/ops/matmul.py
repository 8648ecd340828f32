"""Matmul wrappers.

Parity with src/ops/op_mm.cuh::op_mm (:50, tiled shared-memory kernel
:10-46). On TPU a matmul is one ``lax.dot_general`` lowered onto the MXU;
tiling / shared memory staging is XLA's job. We always pass
``preferred_element_type`` so accumulation precision is explicit (the
reference accumulates fp32, op_mm.cuh:21).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul(a, b, out_dtype=jnp.float32):
    """a @ b with explicit accumulation dtype."""
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
    )


def matmul_flops(m: int, n: int, k: int) -> int:
    return 2 * m * n * k
