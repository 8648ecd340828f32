"""Elementwise op family — functional parity with the reference's
src/ops/op_elemwise.cuh (784 LoC of hand-rolled CUDA broadcast kernels).

On TPU these are VPU ops that XLA fuses into neighbouring matmuls; the value
of this module is the *API inventory* (one name per reference op so the
capability surface is checkable) and the couple of semantically non-obvious
ops (truncating int8 cast, outlier extraction). Broadcast follows the
reference rule (in2 broadcast along its size-1 dim, op_elemwise.cuh:404-424),
which is a subset of numpy broadcasting — jnp handles it natively.

Reference symbols covered: op_relu :455, op_relu_back :470, op_sgd :486,
op_add/op_subtract (tensor & const) :502-556, op_exp/op_log :560-595,
op_multiply (tensor/const/typecast) :629-640, op_dequantize :615,
op_inv_divide :658, op_equal :673, op_round_int8 :686,
op_outlier_extractor :699, op_const_init/op_uniform_init :712-744,
op_allclose :750 (see qgemm_tpu.utils.testing).
"""

from __future__ import annotations

import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


def relu_back(x, dy):
    """dx = dy * (x > 0) — op_relu_back (op_elemwise.cuh:470-480)."""
    return jnp.where(x > 0, dy, jnp.zeros_like(dy))


def sgd_update(w, dw, lr):
    """w - lr*dw — op_sgd (op_elemwise.cuh:486)."""
    return w - lr * dw


def add(a, b):
    return a + b


def subtract(a, b):
    return a - b


def multiply(a, b):
    return a * b


def exp(x):
    return jnp.exp(x)


def log(x):
    return jnp.log(x)


def inv_divide(x, c):
    """c / x — op_inv_divide (op_elemwise.cuh:658), used for scale = 127/absmax."""
    return c / x


def equal(a, b):
    """elementwise 0/1 equality — op_equal (op_elemwise.cuh:673)."""
    return (a == b).astype(jnp.float32)


def cast_int8_truncate(x):
    """Truncating float->int8 cast, the reference's quantization rounding
    (MultiplyWithTypecastFunc, op_elemwise.cuh:106-114: static_cast<int8_t>).
    Kept for bit-parity experiments; the production path uses round-to-nearest
    (a documented deviation — see ops/quantize.py)."""
    return jnp.trunc(x).astype(jnp.int8)


def round_int8(x):
    """Round-to-nearest float->int8 — RoundInt8Func (op_elemwise.cuh:167-176,
    unused in the reference's own pipeline)."""
    return jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)


def dequantize(acc_i32, scale):
    """acc * scale — op_dequantize (op_elemwise.cuh:615-625) generalized to a
    broadcastable scale."""
    return acc_i32.astype(jnp.float32) * scale


def outlier_mask(x, threshold: float):
    """|x| > threshold elementwise mask — op_outlier_extractor
    (op_elemwise.cuh:699-708), which the reference scaffolded but never wired
    in. The LLM.int8() decomposition built on top of it lives in
    ops/quantize.py::quantized_matmul_outlier."""
    return jnp.abs(x) > threshold


def const_init(shape, value, dtype=jnp.float32):
    return jnp.full(shape, value, dtype=dtype)
