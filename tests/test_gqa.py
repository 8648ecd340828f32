"""Grouped-query attention: K/V project to n_kv_heads < n_heads; the KV
cache and its decode read traffic shrink by the group factor (the
dominant serving HBM cost). Query heads i*g..(i+1)*g-1 share KV head i."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.attention import MultiHeadAttention
from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.utils.testing import assert_allclose

CFG = GPTConfig(vocab_size=97, d_model=64, n_heads=8, n_kv_heads=2,
                d_ff=128, n_layers=2, max_seq_len=64)
RNG = np.random.default_rng(41)


def test_gqa_matches_repeated_kv_reference():
    """Full-sequence GQA == standard MHA computed on explicitly repeated
    K/V (the defining identity)."""
    from qgemm_tpu.models.attention import scaled_dot_product_attention
    mha = MultiHeadAttention.init(jax.random.PRNGKey(0), 64, 8,
                                  n_kv_heads=2)
    x = jnp.asarray(RNG.normal(size=(2, 10, 64)), jnp.float32)
    out = mha(x, causal=True)

    q = mha._split(mha.wqkv_q(x))
    k = mha._repeat_kv(mha._split_kv(mha.wqkv_k(x)))
    v = mha._repeat_kv(mha._split_kv(mha.wqkv_v(x)))
    ref = mha.w_o(mha._merge(
        scaled_dot_product_attention(q, k, v, causal=True)))
    assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_gqa_cache_shapes_shrink():
    model = GPT.init(CFG, key=jax.random.PRNGKey(1))
    caches = model.init_cache(2, 32)
    k, v = caches[0]
    assert k.shape[1] == 2, k.shape          # n_kv_heads, not n_heads
    qc = model.init_cache(2, 32, quantized=True)
    assert qc[0].kq.shape[1] == 2


def test_gqa_generate_matches_naive():
    """Cached grouped decode == teacher-forcing forward, token by token —
    the full GQA path coherence check (prefill, per-position decode,
    grouped fold, cache masking)."""
    model = GPT.init(CFG, key=jax.random.PRNGKey(2))
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    n_new = 6
    fast = np.asarray(jax.jit(
        lambda m, p: m.generate(p, n_new))(model, prompt))
    toks = np.asarray(prompt)
    naive = []
    for _ in range(n_new):
        logits = model.forward(jnp.asarray(toks))
        nxt = int(jnp.argmax(logits[0, -1]))
        naive.append(nxt)
        toks = np.concatenate([toks, [[nxt]]], axis=1)
    assert fast[0].tolist() == naive, (fast[0].tolist(), naive)


def test_gqa_quantized_cache_close_to_float():
    model = GPT.init(CFG, key=jax.random.PRNGKey(3))
    prompt = jnp.asarray([[11, 22, 33, 44]])
    a = np.asarray(model.generate(prompt, 6))
    b = np.asarray(model.generate(prompt, 6, quantized_cache=True))
    assert (a[0, :3] == b[0, :3]).all(), (a, b)


def test_gqa_engine_serving():
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = GPT.init(CFG, key=jax.random.PRNGKey(4)).quantize()
    ref = np.asarray(model.generate(jnp.asarray([[5, 6, 7]]), 5))[0]
    eng = ContinuousBatchingEngine(model, max_slots=2, quantized_cache=True)
    req = Request(prompt=[5, 6, 7], max_new_tokens=5)
    eng.submit(req)
    fin = eng.run_to_completion(max_steps=30)
    assert len(fin[0].generated) == 5
    # transcripts track generate's quantized-cache path on the leading
    # tokens (int8 near-ties can flip later ones between the engine's
    # 64-extent cache and generate's tight extent — reduction-order only)
    refq = np.asarray(model.generate(jnp.asarray([[5, 6, 7]]), 5,
                                     quantized_cache=True))[0]
    assert fin[0].generated[:3] == refq[:3].tolist()


def test_gqa_paged_engine_matches_dense():
    """Paged GQA serving: pools hold n_kv_heads (1/g the page bytes);
    transcripts match the dense-cache GQA engine."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    # paged mode needs max_seq_len >= one 128-position page
    pcfg = GPTConfig(vocab_size=97, d_model=64, n_heads=8, n_kv_heads=2,
                     d_ff=128, n_layers=2, max_seq_len=128)
    model = GPT.init(pcfg, key=jax.random.PRNGKey(5)).quantize()

    def run(**kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, **kw)
        reqs = [Request(prompt=[2, 3, 4], max_new_tokens=4),
                Request(prompt=[9, 8], max_new_tokens=4)]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r.generated for r in eng.run_to_completion(max_steps=40)}
        return [fin[r.id] for r in reqs]

    dense = run(quantized_cache=True)
    paged = run(paged=True)
    assert paged[0][:3] == dense[0][:3] and paged[1][:3] == dense[1][:3], \
        (dense, paged)
    # pool head count really is n_kv_heads
    eng = ContinuousBatchingEngine(model, paged=True)
    assert eng.caches[0].kq.shape[1] == 2


def test_gqa_ragged_paged_kernel_matches_reference():
    """The ragged paged kernel's group support (interpret mode) == the
    grouped gather oracle."""
    import numpy as np
    from dataclasses import replace
    from qgemm_tpu.ops.pallas.paged_attention import \
        paged_decode_attention_ragged
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                               build_step_tables,
                                               init_paged_cache,
                                               paged_attention_reference,
                                               paged_write_prompt)

    rng = np.random.default_rng(51)
    b, hkv, g, d, pps = 2, 2, 3, 64, 3
    cache = init_paged_cache(hkv, d, n_pages=8, batch=b, pages_per_slot=pps)
    alloc = PageAllocator(8, b, pps)
    lens = [200, 40]
    pt = np.zeros((b, pps), np.int32)
    for slot, ln in enumerate(lens):
        for j, p in alloc.grow(slot, ln):
            pt[slot, j] = p
    cache = replace(cache, page_table=jnp.asarray(pt))
    for slot, ln in enumerate(lens):
        bucket = -(-ln // PAGE_SIZE) * PAGE_SIZE
        kp = jnp.asarray(rng.normal(size=(hkv, bucket, d)), jnp.float32)
        vp = jnp.asarray(rng.normal(size=(hkv, bucket, d)), jnp.float32)
        cache = paged_write_prompt(cache, slot, kp, vp)
    ss, sp = build_step_tables([len(p) for p in alloc.slot_pages], pps,
                               bucket=8)
    cache = replace(cache, step_slot=jnp.asarray(ss),
                    step_page=jnp.asarray(sp))
    q = jnp.asarray(rng.normal(size=(b, hkv * g, 1, d)), jnp.float32)
    jl = jnp.asarray(lens, jnp.int32)
    got = paged_decode_attention_ragged(q, cache, jl)
    ref = paged_attention_reference(q, cache, jl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_gqa_paged_tp_engine():
    """The last composition: paged + GQA + tensor parallelism — pools
    head-sharded on n_kv_heads, q on n_heads, ragged kernel (oracle on
    CPU) inside shard_map; transcripts match the unsharded paged engine."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    pcfg = GPTConfig(vocab_size=97, d_model=64, n_heads=8, n_kv_heads=2,
                     d_ff=128, n_layers=2, max_seq_len=128)
    qm = GPT.init(pcfg, key=jax.random.PRNGKey(6)).quantize()
    mesh = make_mesh((1, 2), ("data", "model"))   # 2-way: Hkv=2 divides
    qms = shard_quantized_model(qm, mesh)

    def transcripts(model, **kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, **kw)
        for p in ([2, 3, 4], [9, 8]):
            eng.submit(Request(prompt=p, max_new_tokens=4))
        return [tuple(r.generated)
                for r in sorted(eng.run_to_completion(max_steps=40),
                                key=lambda r: r.id)]

    ref = transcripts(qm)
    out = transcripts(qms, mesh=mesh)
    assert ref == out, (ref, out)


def test_gqa_chunked_prefill():
    """Chunked admission works for GQA models (prefill_chunk carries the
    grouped cached path)."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = GPT.init(CFG, key=jax.random.PRNGKey(7)).quantize()
    long_prompt = list(range(1, 40))
    ref_eng = ContinuousBatchingEngine(model, max_slots=1)
    ref_eng.submit(Request(prompt=long_prompt, max_new_tokens=4))
    ref = ref_eng.run_to_completion(max_steps=30)[0].generated

    eng = ContinuousBatchingEngine(model, max_slots=1, chunked_prefill=16)
    eng.submit(Request(prompt=long_prompt, max_new_tokens=4))
    got = eng.run_to_completion(max_steps=30)[0].generated
    assert got == ref, (got, ref)
