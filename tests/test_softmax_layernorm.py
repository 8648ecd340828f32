"""Softmax + LayerNorm vs analytic oracles.

Reference pattern: src/test_softmax.cu computes the 1x3 softmax by hand on
the host (:42-44) and compares with eps=1e-5; we keep the identical case and
add random-shape checks.
"""

import math

import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops.layernorm import (
    layernorm,
    layernorm_reference_semantics,
    layernorm_residual,
)
from qgemm_tpu.ops.softmax import softmax
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(42)


def test_softmax_analytic_1x3():
    # the reference's hand-computed case (src/test_softmax.cu:42-44)
    x = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
    denom = math.exp(1) + math.exp(2) + math.exp(3)
    expected = np.array([[math.exp(1), math.exp(2), math.exp(3)]]) / denom
    assert_allclose(softmax(x), expected, rtol=1e-5, atol=1e-5)


def test_softmax_rows_sum_to_one_and_stability():
    x = RNG.normal(size=(33, 65)).astype(np.float32) * 100  # large magnitudes
    out = np.asarray(softmax(jnp.asarray(x)))
    assert np.all(np.isfinite(out))
    assert_allclose(out.sum(-1), np.ones(33), rtol=1e-5, atol=1e-5)
    # matches numpy oracle
    e = np.exp(x - x.max(-1, keepdims=True))
    assert_allclose(out, e / e.sum(-1, keepdims=True), rtol=1e-5, atol=1e-5)


def test_layernorm_standard():
    x = RNG.normal(size=(17, 64)).astype(np.float32)
    out = np.asarray(layernorm(jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    assert_allclose(out, (x - mean) / np.sqrt(var + 1e-5), rtol=1e-4, atol=1e-5)
    # normalized rows: mean ~0, var ~1
    assert np.abs(out.mean(-1)).max() < 1e-5
    assert np.abs(out.var(-1) - 1).max() < 1e-3


def test_layernorm_affine_and_residual():
    x = RNG.normal(size=(5, 32)).astype(np.float32)
    r = RNG.normal(size=(5, 32)).astype(np.float32)
    g = RNG.normal(size=(32,)).astype(np.float32)
    b = RNG.normal(size=(32,)).astype(np.float32)
    base = np.asarray(layernorm(jnp.asarray(x + r)))
    out = np.asarray(layernorm_residual(jnp.asarray(x), jnp.asarray(r),
                                        gamma=jnp.asarray(g), beta=jnp.asarray(b)))
    assert_allclose(out, base * g + b, rtol=1e-5, atol=1e-5)


def test_layernorm_reference_semantics():
    # bit-parity with the CUDA kernel's (x-mean)/var (op_layernorm.cuh:28)
    x = RNG.normal(size=(3, 8)).astype(np.float32)
    out = np.asarray(layernorm_reference_semantics(jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    assert_allclose(out, (x - mean) / var, rtol=1e-4, atol=1e-5)
