"""W4A8: int4 group-quantized weights x int8 activations (beyond-reference,
LiquidGEMM/AWQ direction — PAPERS.md; decode is weight-HBM-bound, int4
halves the int8 path's dominant traffic again)."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops.pallas.w4a8_matmul import (GROUP, W4RANGE, pack_int4,
                                              unpack_int4)
from qgemm_tpu.ops.quantize import (dequantize_weights_int4,
                                    quantize_weights_int4,
                                    quantized_matmul_prequant_w4)
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(31)


def test_pack_unpack_roundtrip():
    q = RNG.integers(-7, 8, size=(2 * GROUP, 384)).astype(np.int32)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (GROUP, 384) and packed.dtype == jnp.int8
    out = unpack_int4(packed)
    np.testing.assert_array_equal(np.asarray(out), q)


def test_quantize_dequantize_error():
    """Group-128 int4 with the MSE-optimal clip: reconstruction error
    beats the plain-absmax scale and stays in the known int4 regime."""
    w = jnp.asarray(RNG.normal(size=(512, 256)).astype(np.float32))
    wq4 = quantize_weights_int4(w)
    wd = dequantize_weights_int4(wq4, k=512)
    rel = float(jnp.linalg.norm(wd - w) / jnp.linalg.norm(w))

    # plain absmax reference scheme
    wg = np.asarray(w).reshape(4, GROUP, 256)
    c = np.abs(wg).max(axis=1)
    q = np.clip(np.round(wg * (W4RANGE / c[:, None])), -W4RANGE, W4RANGE)
    wd_absmax = q * (c[:, None] / W4RANGE)
    rel_absmax = float(np.linalg.norm(wd_absmax.reshape(512, 256) - np.asarray(w))
                       / np.linalg.norm(np.asarray(w)))
    assert rel < rel_absmax, (rel, rel_absmax)
    assert rel < 0.12, rel


def test_w4a8_matmul_matches_dequant_oracle():
    """Kernel (interpret on CPU) == x_int8-quantized @ dequantized weights
    within the activation-quantization tolerance."""
    for m, k, n in ((64, 256, 128), (33, 300, 130), (8, 2048 + 256, 384)):
        x = jnp.asarray(RNG.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(RNG.normal(size=(k, n)).astype(np.float32)
                        / (k ** 0.5))
        wq4 = quantize_weights_int4(w)
        got = quantized_matmul_prequant_w4(x, wq4)
        ref = x @ dequantize_weights_int4(wq4, k=k)
        # remaining delta is the int8 activation grid (~1/127 relative)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, (m, k, n, rel)


def test_w4_vs_f32_model_error():
    """End-to-end relative error of W4A8 vs float: the int4 weight grid
    dominates (the known ~9-12% regime for Gaussian weights at group 128;
    int8's is ~1%) — the memory/bandwidth-for-accuracy trade the W4 paper
    line makes explicit."""
    x = jnp.asarray(RNG.normal(size=(32, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 512)).astype(np.float32) / 23)
    ref = x @ w
    got = quantized_matmul_prequant_w4(x, quantize_weights_int4(w))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.12, rel


def test_linear_bits4_and_gpt_generate():
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.models.linear import Linear

    lin = Linear.init(jax.random.PRNGKey(0), 256, 128)
    q4 = lin.quantize(bits=4)
    x = jnp.asarray(RNG.normal(size=(4, 256)).astype(np.float32))
    rel = float(jnp.linalg.norm(q4(x) - lin(x)) / jnp.linalg.norm(lin(x)))
    assert rel < 0.12, rel

    cfg = GPTConfig(vocab_size=64, d_model=128, n_heads=4, d_ff=256,
                    n_layers=2, max_seq_len=32)
    m = GPT.init(cfg, key=jax.random.PRNGKey(1))
    m4 = m.quantize(bits=4)
    out = jax.jit(lambda mm, p: mm.generate(p, 4))(m4, jnp.asarray([[1, 2, 3]]))
    assert out.shape == (1, 4)
    # engine serves the w4 model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    eng = ContinuousBatchingEngine(m4, max_slots=2)
    eng.submit(Request(prompt=[5, 6], max_new_tokens=4))
    fin = eng.run_to_completion(max_steps=30)
    assert len(fin[0].generated) == 4


def test_w4_outlier_decomposition():
    """W4A8 composes with the LLM.int8() outlier path: outlier weight rows
    dequantize on the fly from the packed nibbles, recovering the
    activation-quantization error that outlier dims inflate."""
    from qgemm_tpu.ops.quantize import (_take_rows_w4,
                                        quantized_matmul_prequant_outlier)

    k, n = 512, 256
    w = jnp.asarray(RNG.normal(size=(k, n)).astype(np.float32) / 20)
    wq4 = quantize_weights_int4(w)
    # row extraction == dequantized-weight rows, exactly
    idx = jnp.asarray([0, 63, 64, 127, 128, 300, 511], jnp.int32)
    rows = _take_rows_w4(wq4, idx)
    full = dequantize_weights_int4(wq4, k=k)
    np.testing.assert_allclose(np.asarray(rows),
                               np.asarray(full[idx]), rtol=0, atol=1e-6)

    # outlier-heavy activations: decomposition beats the plain w4 path
    x = jnp.asarray(RNG.normal(size=(64, k)).astype(np.float32))
    dims = RNG.choice(k, 5, replace=False)
    x = x.at[:, dims].multiply(30.0)
    ref = x @ full
    plain = quantized_matmul_prequant_w4(x, wq4)
    dec = quantized_matmul_prequant_outlier(x, wq4, threshold=6.0,
                                            capacity=16)
    e_plain = float(jnp.linalg.norm(plain - ref) / jnp.linalg.norm(ref))
    e_dec = float(jnp.linalg.norm(dec - ref) / jnp.linalg.norm(ref))
    assert e_dec < e_plain / 2, (e_plain, e_dec)

    # model-level: quantize(bits=4, outlier_threshold=...) runs
    from qgemm_tpu.models.linear import Linear
    lin4o = Linear.init(jax.random.PRNGKey(3), k, n).quantize(
        bits=4, outlier_threshold=6.0, outlier_capacity=16)
    y = lin4o(x)
    assert y.shape == (64, n) and bool(jnp.all(jnp.isfinite(y)))


def test_w4a8_row_tp_padded_k_falls_back():
    """A W4A8 layer whose true K is padded to the group size must NOT be
    marked row-parallel (the shard_map body asserts true K == packed
    extent at trace time); ``with_tp`` returns it unchanged — the same
    graceful single-kernel fallback the int8 path provides (r3 advisor)."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.models.linear import Linear
    from qgemm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((2,), ("model",))
    key = jax.random.PRNGKey(7)
    # K=200 pads to 256: kg=2 divides p=2, but true K != packed extent
    padded = Linear.init(key, 200, 64, bias=False).quantize(bits=4)
    assert padded.with_tp("row", mesh).tp_mode == "none"
    # clean K=256: row TP engages and matches the single-kernel result
    clean_f = Linear.init(key, 256, 64, bias=False)
    clean = clean_f.quantize(bits=4)
    row = clean.with_tp("row", mesh)
    assert row.tp_mode == "row"
    x = jnp.asarray(RNG.normal(size=(8, 256)).astype(np.float32))
    # row TP quantizes each K slab on its own activation grid — matches
    # within grid noise, not bit-exactly (same tolerance as test_parallel)
    assert_allclose(row(x), clean(x), rtol=5e-2, atol=5e-2)
