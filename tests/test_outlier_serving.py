"""Serving-path outlier decomposition (int8 weights only, bf16 dequantized
rows for outlier activation dims) — BASELINE config 5 capability."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.models.linear import Linear
from qgemm_tpu.ops.quantize import (
    quantize_weights,
    quantized_matmul_prequant,
    quantized_matmul_prequant_outlier,
)
from qgemm_tpu.utils.testing import rel_fro_error

RNG = np.random.default_rng(33)


def _outlier_data(m=32, k=128, n=64, mag=60.0):
    x = RNG.normal(size=(m, k)).astype(np.float32)
    x[:, [5, 40, 100]] *= mag
    w = RNG.normal(size=(k, n)).astype(np.float32)
    return x, w


def test_prequant_outlier_beats_plain():
    x, w = _outlier_data()
    wq = quantize_weights(jnp.asarray(w))
    exact = x @ w
    plain = np.asarray(quantized_matmul_prequant(jnp.asarray(x), wq, backend="xla"))
    decomp = np.asarray(quantized_matmul_prequant_outlier(
        jnp.asarray(x), wq, threshold=6.0, capacity=8, backend="xla"))
    assert rel_fro_error(decomp, exact) < rel_fro_error(plain, exact) / 2


def test_quantized_linear_outlier_mode():
    lin = Linear.init(jax.random.PRNGKey(0), 128, 64)
    x, _ = _outlier_data()
    x = jnp.asarray(x)
    exact = np.asarray(lin(x))
    plain = np.asarray(lin.quantize()(x))
    outl = np.asarray(lin.quantize(outlier_threshold=6.0, outlier_capacity=8)(x))
    assert rel_fro_error(outl, exact) < rel_fro_error(plain, exact)


def test_gpt_quantize_with_outliers_runs():
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=1, max_seq_len=32)
    model = GPT.init(cfg, key=jax.random.PRNGKey(1))
    q = model.quantize(outlier_threshold=6.0, outlier_capacity=4)
    out = jax.jit(lambda m, p: m.generate(p, 3))(q, jnp.asarray([[1, 2, 3]]))
    assert out.shape == (1, 3)
