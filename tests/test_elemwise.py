"""Elementwise op family vs numpy oracles (reference: src/test_quantize.cu
style analytic checks + op_elemwise.cuh semantics)."""

import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops import elemwise as E
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(123)


def test_relu_and_back():
    x = RNG.normal(size=(16, 32)).astype(np.float32)
    dy = RNG.normal(size=(16, 32)).astype(np.float32)
    assert_allclose(E.relu(jnp.asarray(x)), np.maximum(x, 0))
    assert_allclose(E.relu_back(jnp.asarray(x), jnp.asarray(dy)), np.where(x > 0, dy, 0))


def test_broadcast_add_reference_rule():
    # reference broadcast: in2 broadcast along its size-1 dim (op_elemwise.cuh:404-424)
    a = RNG.normal(size=(8, 5)).astype(np.float32)
    row = RNG.normal(size=(1, 5)).astype(np.float32)
    col = RNG.normal(size=(8, 1)).astype(np.float32)
    assert_allclose(E.add(jnp.asarray(a), jnp.asarray(row)), a + row)
    assert_allclose(E.add(jnp.asarray(a), jnp.asarray(col)), a + col)
    assert_allclose(E.subtract(jnp.asarray(a), 2.0), a - 2.0)


def test_sgd_update():
    w = RNG.normal(size=(4, 4)).astype(np.float32)
    g = RNG.normal(size=(4, 4)).astype(np.float32)
    assert_allclose(E.sgd_update(jnp.asarray(w), jnp.asarray(g), 0.01), w - 0.01 * g)


def test_rounding_modes():
    x = jnp.asarray([1.7, -1.7, 0.4, -0.4, 126.9, -126.9, 200.0], jnp.float32)
    assert np.array_equal(np.asarray(E.cast_int8_truncate(x[:6])),
                          np.asarray([1, -1, 0, 0, 126, -126], np.int8))
    assert np.array_equal(np.asarray(E.round_int8(x)),
                          np.asarray([2, -2, 0, -0, 127, -127, 127], np.int8))


def test_inv_divide_equal_exp_log():
    x = np.abs(RNG.normal(size=(4, 4))).astype(np.float32) + 0.5
    assert_allclose(E.inv_divide(jnp.asarray(x), 127.0), 127.0 / x, rtol=1e-5, atol=1e-5)
    # XLA's exp/log are polynomial approximations; allow a few ulp more
    assert_allclose(E.exp(jnp.asarray(x)), np.exp(x), rtol=5e-4, atol=1e-5)
    assert_allclose(E.log(jnp.asarray(x)), np.log(x), rtol=5e-4, atol=1e-4)
    a = np.array([[1, 2], [3, 4]], np.float32)
    b = np.array([[1, 0], [3, 5]], np.float32)
    assert_allclose(E.equal(jnp.asarray(a), jnp.asarray(b)), np.array([[1, 0], [1, 0]], np.float32))


def test_outlier_mask():
    x = np.array([[0.5, 7.0], [-8.0, 1.0]], np.float32)
    m = np.asarray(E.outlier_mask(jnp.asarray(x), 6.0))
    assert m.tolist() == [[False, True], [True, False]]
