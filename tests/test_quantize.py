"""Quantized GEMM correctness — the core capability.

Mirrors the reference's three verification modes (SURVEY.md §4):
  * hand-written tiny matrices (src/test_quantize.cu:38-69: the 3x3 X and
    3x2 W below are the same values);
  * quantized-vs-unquantized self-consistency with error bounds
    (test_quantize.cu:82-86);
  * cross-implementation oracle: the Pallas kernels must match the jnp
    composition exactly (same scales, same rounding, same int8 dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.ops.pallas.quantized_matmul import (
    col_quantize_pallas,
    quantized_matmul_pallas,
    quantized_matmul_prequant_pallas,
)
from qgemm_tpu.ops.quantize import (
    absmax_quantize,
    dequantize,
    int8_matmul,
    quantize_weights,
    quantized_matmul,
    quantized_matmul_outlier,
    quantized_matmul_xla,
)
from qgemm_tpu.utils.testing import assert_allclose, mean_abs_error, rel_fro_error

RNG = np.random.default_rng(0)

# the reference's hand-written case (src/test_quantize.cu:38-69)
X3 = jnp.asarray([[2.0, -1.0, -1.0], [0.0, 3.0, 2.0], [-1.0, -1.0, 0.0]], jnp.float32)
W3 = jnp.asarray([[-1.0, 0.0], [0.0, -2.0], [-1.0, 2.0]], jnp.float32)


def test_handwritten_3x3_case():
    exact = np.asarray(X3 @ W3)
    q = np.asarray(quantized_matmul_xla(X3, W3))
    # integer-valued inputs whose scaled values land on exact int8 grid points
    # reconstruct nearly exactly
    assert mean_abs_error(q, exact) < 0.02
    qp = np.asarray(quantized_matmul(X3, W3, backend="pallas"))
    assert_allclose(qp, q, rtol=1e-6, atol=1e-6)


def test_absmax_quantize_roundtrip():
    x = RNG.normal(size=(64, 96)).astype(np.float32)
    q, c = absmax_quantize(jnp.asarray(x), axis=-1)
    assert q.dtype == jnp.int8
    assert np.asarray(jnp.max(jnp.abs(q), axis=-1)).max() <= 127
    # dequantized values within half a quantization step
    deq = np.asarray(q).astype(np.float32) * np.asarray(c) / 127.0
    step = np.asarray(c) / 127.0
    assert np.all(np.abs(deq - x) <= 0.5 * step + 1e-7)


def test_quantized_mm_error_bound_random():
    """Self-consistency: int8 absmax vector-wise GEMM vs fp32, gaussian data.
    Relative Frobenius error for RTN int8 on N(0,1) data is ~1.1%."""
    x = RNG.normal(size=(128, 256)).astype(np.float32)
    w = RNG.normal(size=(256, 64)).astype(np.float32)
    exact = x @ w
    q = np.asarray(quantized_matmul_xla(jnp.asarray(x), jnp.asarray(w)))
    assert rel_fro_error(q, exact) < 0.03


def test_rounding_truncate_matches_reference_math():
    """Bit-parity mode: truncating cast (MultiplyWithTypecastFunc,
    op_elemwise.cuh:106-114) reproduced in numpy.

    Inputs are constructed so every scaled value sits ~0.3 away from an
    integer: truncation is a step function, so parity on arbitrary random
    data is ulp-unstable by construction — any fp reassociation flips a
    whole quantization step."""
    def grid(shape, axis):
        steps = RNG.integers(-126, 127, size=shape).astype(np.float32)
        vals = (steps + np.sign(steps + 0.5) * 0.3) / 127.0
        # plant an exact absmax of 1.0 so the scale is exactly 127
        idx = [slice(None)] * 2
        idx[axis] = 0
        vals[tuple(idx)] = 1.0
        return vals

    x = grid((16, 32), 1)
    w = grid((32, 8), 0)
    cx = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-12)
    cw = np.maximum(np.abs(w).max(0, keepdims=True), 1e-12)
    xq = np.trunc(x * (127.0 / cx)).astype(np.int8)
    wq = np.trunc(w * (127.0 / cw)).astype(np.int8)
    expected = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(np.float32) \
        * cx * cw / (127.0 ** 2)
    got = np.asarray(quantized_matmul_xla(jnp.asarray(x), jnp.asarray(w),
                                          rounding="truncate"))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_pallas_matches_xla_exactly():
    """Cross-implementation oracle: fused kernels == jnp composition."""
    for (m, k, n) in [(32, 128, 128), (100, 300, 200), (256, 512, 384)]:
        x = jnp.asarray(RNG.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(RNG.normal(size=(k, n)).astype(np.float32))
        ref = quantized_matmul_xla(x, w)
        got = quantized_matmul_pallas(x, w)
        assert_allclose(got, ref, rtol=1e-5, atol=1e-4, msg=f"{(m, k, n)}")


def test_col_quantize_pallas_matches_xla():
    w = jnp.asarray(RNG.normal(size=(96, 200)).astype(np.float32))
    wq_ref, cw_ref = absmax_quantize(w, axis=0)
    wq, cw = col_quantize_pallas(w)
    assert np.array_equal(np.asarray(wq), np.asarray(wq_ref))
    assert_allclose(cw, cw_ref, rtol=1e-6, atol=1e-7)


def test_prequant_path():
    x = jnp.asarray(RNG.normal(size=(64, 256)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(256, 128)).astype(np.float32))
    wq = quantize_weights(w)
    xq, cx = absmax_quantize(x, axis=-1)
    ref = dequantize(int8_matmul(xq, wq.q), cx, wq.c)
    got = quantized_matmul_prequant_pallas(x, wq.q, wq.c)
    assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_bf16_activations_and_output():
    x = jnp.asarray(RNG.normal(size=(64, 256)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(256, 128)).astype(np.float32))
    wq = quantize_weights(w)
    out = quantized_matmul_prequant_pallas(x.astype(jnp.bfloat16), wq.q, wq.c,
                                           out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(x @ w)
    assert rel_fro_error(np.asarray(out.astype(jnp.float32)), ref) < 0.05


def test_outlier_decomposition_improves_error():
    """LLM.int8() mixed-precision decomposition: with heavy outlier feature
    dims, plain int8 error blows up; the decomposed path recovers accuracy
    (the capability the reference scaffolded at op_elemwise.cuh:699 but never
    wired in)."""
    x = RNG.normal(size=(64, 128)).astype(np.float32)
    outlier_dims = [3, 50, 77]
    x[:, outlier_dims] *= 60.0  # emulate LLM.int8() systematic outliers
    w = RNG.normal(size=(128, 96)).astype(np.float32)
    exact = x @ w
    plain = np.asarray(quantized_matmul_xla(jnp.asarray(x), jnp.asarray(w)))
    decomp = np.asarray(quantized_matmul_outlier(jnp.asarray(x), jnp.asarray(w),
                                                 threshold=6.0, capacity=8))
    err_plain = rel_fro_error(plain, exact)
    err_decomp = rel_fro_error(decomp, exact)
    assert err_decomp < err_plain / 3
    assert err_decomp < 0.05


def test_outlier_decomposition_no_outliers_is_noop_quality():
    x = RNG.normal(size=(32, 64)).astype(np.float32)
    w = RNG.normal(size=(64, 32)).astype(np.float32)
    plain = np.asarray(quantized_matmul_xla(jnp.asarray(x), jnp.asarray(w)))
    decomp = np.asarray(quantized_matmul_outlier(jnp.asarray(x), jnp.asarray(w),
                                                 threshold=1e9, capacity=8))
    assert_allclose(decomp, plain, rtol=1e-5, atol=1e-5)


def test_all_zero_rows_do_not_nan():
    x = np.zeros((8, 32), np.float32)
    w = RNG.normal(size=(32, 16)).astype(np.float32)
    out = np.asarray(quantized_matmul_xla(jnp.asarray(x), jnp.asarray(w)))
    assert np.all(out == 0)
    out_p = np.asarray(quantized_matmul(jnp.asarray(x), jnp.asarray(w), backend="pallas"))
    assert np.all(np.isfinite(out_p))


def test_reference_scale_error_parity():
    """Match-the-baseline gate (BASELINE.md): mean |q - fp32| per output
    element at the reference's correctness config, uniform(-1,1) inputs like
    op_uniform_init. The reference reports 4.58e-5 mean error on its README
    benchmark; RTN must do at least as well at the same scale of inputs."""
    m = n = k = 256  # small enough for CPU CI; error is scale-invariant per-k
    x = jnp.asarray(RNG.uniform(-1, 1, size=(m, k)).astype(np.float32))
    w = jnp.asarray(RNG.uniform(-1, 1, size=(k, n)).astype(np.float32))
    exact = np.asarray(x @ w)
    q = np.asarray(quantized_matmul_xla(x, w))
    # normalized per-element error relative to |output| scale
    rel = mean_abs_error(q, exact) / (np.abs(exact).mean() + 1e-12)
    assert rel < 0.02


def test_kernel_wrappers_validate_inputs():
    """C2 parity the TPU way: bad shapes/dtypes raise named ValueErrors at
    trace time instead of opaque Mosaic lowering errors."""
    import pytest
    from qgemm_tpu.ops.quantize import (quantize_weights, quantized_matmul,
                                        quantized_matmul_prequant)

    x = jnp.zeros((4, 8))
    with pytest.raises(ValueError, match="inner dims differ"):
        quantized_matmul(x, jnp.zeros((9, 3)))
    with pytest.raises(ValueError, match="rank-2"):
        quantized_matmul(jnp.zeros((4,)), jnp.zeros((4, 3)))
    with pytest.raises(ValueError, match="float dtype"):
        quantized_matmul(x.astype(jnp.int8), jnp.zeros((8, 3)))
    wq = quantize_weights(jnp.ones((8, 3)))
    with pytest.raises(ValueError, match="int8"):
        quantized_matmul_prequant(x, wq._replace(q=wq.q.astype(jnp.int32)))

    from qgemm_tpu.ops.pallas.flash_attention import flash_attention
    with pytest.raises(ValueError, match="head_dim"):
        flash_attention(jnp.zeros((1, 2, 8, 16)), jnp.zeros((1, 2, 8, 32)),
                        jnp.zeros((1, 2, 8, 32)))

    from qgemm_tpu.ops.pallas.decode_attention import decode_attention
    with pytest.raises(ValueError, match="Sq == 1"):
        decode_attention(jnp.zeros((2, 2, 3, 128)),
                         jnp.zeros((2, 2, 64, 128), jnp.int8),
                         jnp.zeros((2, 2, 64, 128), jnp.int8),
                         jnp.zeros((2,), jnp.int32))
