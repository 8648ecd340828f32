"""int8 KV cache (ops/kv_cache.py) — beyond-reference serving capability.

The reference has no KV cache at all (SURVEY.md §2 C12 "no KV-cache"); these
tests verify the quantized cache's numerics against the float cache and the
serving-engine integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.ops.kv_cache import (QuantizedKVCache, dequantize_kv,
                                    init_quantized_kv_cache, quantize_kv)

CFG = GPTConfig(vocab_size=67, d_model=32, n_heads=4, d_ff=64,
                n_layers=2, max_seq_len=48)


def test_quantize_roundtrip_error():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 8))
    q, c = quantize_kv(x)
    assert q.dtype == jnp.int8 and c.shape == (2, 4, 16, 1)
    back = dequantize_kv(q, c, jnp.float32)
    # absmax int8 over an 8-dim row: worst-case step is c/127
    assert float(jnp.max(jnp.abs(back - x) / c)) <= 0.5 / 127 + 1e-6


def test_untouched_rows_decode_to_zero():
    cache = init_quantized_kv_cache(1, 2, 8, 4)
    assert float(jnp.max(jnp.abs(
        dequantize_kv(cache.kq, cache.kc, jnp.float32)))) == 0.0


def test_decode_matches_float_cache():
    """Greedy decode logits with the int8 cache track the float-cache logits
    closely enough to pick the same tokens on a random tiny model."""
    m = GPT.init(CFG, key=jax.random.PRNGKey(3))
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 7), 0, CFG.vocab_size)

    fc = m.init_cache(2, 16)
    qc = m.init_cache(2, 16, quantized=True)
    assert all(isinstance(c, QuantizedKVCache) for c in qc)

    lf, fc = m.prefill(prompt, fc)
    lq, qc = m.prefill(prompt, qc)
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                               rtol=0, atol=0.05)

    tok = jnp.argmax(lf[:, -1, :], axis=-1)[:, None]
    for t in range(3):
        lf2, fc = m.decode_step(tok, 7 + t, fc)
        lq2, qc = m.decode_step(tok, 7 + t, qc)
        np.testing.assert_allclose(np.asarray(lq2), np.asarray(lf2),
                                   rtol=0, atol=0.05)
        tok = jnp.argmax(lf2, axis=-1)[:, None]


def test_generate_with_quantized_cache():
    m = GPT.init(CFG, key=jax.random.PRNGKey(5))
    prompt = jax.random.randint(jax.random.PRNGKey(6), (1, 5), 0, CFG.vocab_size)
    out_f = m.generate(prompt, 8)
    out_q = m.generate(prompt, 8, quantized_cache=True)
    assert out_q.shape == (1, 8)
    # greedy decode on a random model: int8 cache should agree on the
    # argmax for at least the first few steps
    assert np.array_equal(np.asarray(out_f[:, :4]), np.asarray(out_q[:, :4]))


def test_engine_quantized_cache():
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    m = GPT.init(CFG, key=jax.random.PRNGKey(7))
    eng = ContinuousBatchingEngine(m, max_slots=2, max_seq_len=32,
                                   scheduler="python", quantized_cache=True)
    eng.submit(Request(id=0, prompt=[1, 2, 3], max_new_tokens=5))
    eng.submit(Request(id=1, prompt=[4, 5], max_new_tokens=4))
    done = eng.run_to_completion()
    assert sorted(r.id for r in done) == [0, 1]
    assert all(len(r.generated) == r.max_new_tokens for r in done)

    # the int8 engine's tokens match the float engine's on a tiny model
    eng_f = ContinuousBatchingEngine(m, max_slots=2, max_seq_len=32,
                                     scheduler="python")
    eng_f.submit(Request(id=0, prompt=[1, 2, 3], max_new_tokens=5))
    eng_f.submit(Request(id=1, prompt=[4, 5], max_new_tokens=4))
    done_f = {r.id: r.generated for r in eng_f.run_to_completion()}
    for r in done:
        assert r.generated == done_f[r.id]
