"""Reduction ops vs numpy (reference: src/ops/op_reduction.cuh)."""

import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops import reduction as R
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(7)


def test_reductions_both_axes():
    x = RNG.normal(size=(9, 13)).astype(np.float32)
    j = jnp.asarray(x)
    for axis in (0, 1):
        assert_allclose(R.reduce_sum(j, axis), x.sum(axis, keepdims=True), rtol=1e-5, atol=1e-5)
        assert_allclose(R.reduce_max(j, axis), x.max(axis, keepdims=True))
        assert_allclose(R.absmax(j, axis), np.abs(x).max(axis, keepdims=True))
        assert np.array_equal(np.asarray(R.argmax(j, axis)),
                              x.argmax(axis, keepdims=True))
