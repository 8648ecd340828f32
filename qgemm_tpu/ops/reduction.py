"""Reduction op family — parity with src/ops/op_reduction.cuh (204 LoC).

The reference chooses reduction direction from the output shape
(op_reduction.cuh:143-156); here the axis is explicit. One-thread-per-output
serial loops become XLA reductions that vectorize over lanes.

Covered: op_sum :163, op_argmax :174, op_max :185, op_absmax :196.
"""

from __future__ import annotations

import jax.numpy as jnp


def reduce_sum(x, axis: int, keepdims: bool = True):
    return jnp.sum(x, axis=axis, keepdims=keepdims)


def reduce_max(x, axis: int, keepdims: bool = True):
    return jnp.max(x, axis=axis, keepdims=keepdims)


def argmax(x, axis: int, keepdims: bool = True):
    return jnp.argmax(x, axis=axis, keepdims=keepdims)


def absmax(x, axis: int, keepdims: bool = True):
    """Quantization statistic: max |x| along axis (op_absmax,
    op_reduction.cuh:196) — row-wise for activations, col-wise for weights."""
    return jnp.max(jnp.abs(x), axis=axis, keepdims=keepdims)
