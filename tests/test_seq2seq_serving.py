"""Encoder-decoder serving: int8 decoder cache + continuous batching
(BASELINE config 4 at GPT-family parity; the reference demo is a fixed-
shape, cache-less, batch-less loop — src/transformer.cu:170-185)."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.transformer import Transformer, TransformerConfig
from qgemm_tpu.serving.engine import Request
from qgemm_tpu.serving.seq2seq import Seq2SeqEngine
from qgemm_tpu.utils.testing import assert_allclose

CFG = TransformerConfig(vocab_size=89, d_model=32, n_heads=4, d_ff=64,
                        n_layers=2, max_seq_len=64)
RNG = np.random.default_rng(21)


def _model(seed=0):
    return Transformer.init(CFG, key=jax.random.PRNGKey(seed))


def test_quantized_cache_decode_matches_float():
    """int8 decoder self-cache: decode logits track the float-cache path
    within KV-quantization noise, step by step."""
    model = _model(seed=1)
    src = jnp.asarray([[5, 6, 7, 8, 9]])
    enc = model.encode(src)
    kvs = [b.cross_attn.precompute_kv(enc) for b in model.dec_blocks]
    cf = model.init_cache(1, 16)
    cq = model.init_cache(1, 16, quantized=True)
    tok = jnp.asarray([[1]])
    for t in range(4):
        lf, cf = model.decode_logits(tok, t, kvs, cf)
        lq, cq = model.decode_logits(tok, t, kvs, cq)
        assert_allclose(lq, lf, rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(lf, axis=-1)[:, None]


def test_generate_quantized_cache_matches_float_transcript():
    model = _model(seed=2)
    src = jnp.asarray([[3, 1, 4, 1, 5, 9]])
    a = np.asarray(model.generate(src, 8))
    b = np.asarray(model.generate(src, 8, quantized_cache=True))
    # greedy transcripts over a random-weight model: int8 KV noise may
    # eventually flip a token; the leading tokens must agree
    assert (a[0, :4] == b[0, :4]).all(), (a, b)


def test_engine_matches_generate():
    """Engine greedy transcript == model.generate on the same source."""
    model = _model(seed=3)
    src = [7, 8, 9, 10]
    n = 6
    ref = np.asarray(model.generate(jnp.asarray([src]), n))[0]
    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16)
    req = Request(prompt=src, max_new_tokens=n)
    eng.submit(req)
    fin = eng.run_to_completion(max_steps=50)
    assert len(fin) == 1 and fin[0].id == req.id
    assert fin[0].generated == ref[:n].tolist(), \
        (fin[0].generated, ref.tolist())


def test_engine_ragged_sources_isolated():
    """Two concurrent requests with different source lengths produce the
    same transcripts as each alone (encoder padding + cross-attention
    masking really isolates slots)."""
    model = _model(seed=4)
    reqs = [[11, 12, 13], [21, 22, 23, 24, 25, 26, 27]]
    solo = []
    for src in reqs:
        eng = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16)
        eng.submit(Request(prompt=src, max_new_tokens=5))
        solo.append(eng.run_to_completion(max_steps=50)[0].generated)

    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16)
    rs = [Request(prompt=src, max_new_tokens=5) for src in reqs]
    for r in rs:
        eng.submit(r)
    fin = {r.id: r.generated for r in eng.run_to_completion(max_steps=50)}
    assert fin[rs[0].id] == solo[0]
    assert fin[rs[1].id] == solo[1]


def test_engine_slot_reuse_and_eos():
    """More requests than slots: slots recycle; EOS frees early."""
    model = _model(seed=5)
    eng = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16,
                        quantized_cache=True)
    reqs = [Request(prompt=[2, 3], max_new_tokens=4),
            Request(prompt=[4, 5, 6], max_new_tokens=4)]
    for r in reqs:
        eng.submit(r)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=60)}
    assert len(fin) == 2
    for r in reqs:
        assert len(fin[r.id].generated) == 4 and fin[r.id].error is None


def test_engine_error_isolation(monkeypatch):
    model = _model(seed=6)
    eng = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16)
    good = Request(prompt=[1, 2], max_new_tokens=3)
    bad = Request(prompt=[3, 4], max_new_tokens=3)
    real = eng._prefill

    def flaky(model, src, src_len, caches, enc_kvs, slot, key, temp, topp,
              topk, plen):
        if int(np.asarray(src)[0, 0]) == 3:
            raise RuntimeError("injected encode fault")
        return real(model, src, src_len, caches, enc_kvs, slot, key, temp,
                    topp, topk, plen=plen)

    eng._prefill = flaky
    for r in (bad, good):
        eng.submit(r)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=40)}
    assert "injected encode fault" in fin[bad.id].error
    assert len(fin[good.id].generated) == 3 and fin[good.id].error is None


def test_quantized_cross_attention_matches_float():
    """int8 cross-attention K/V (factored dequant) tracks the float path
    within KV-quantization noise, including source masking."""
    from qgemm_tpu.models.attention import (_quantized_cross_attention,
                                            scaled_dot_product_attention)
    from qgemm_tpu.ops.kv_cache import quantize_kv

    q = jnp.asarray(RNG.normal(size=(2, 4, 1, 32)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(2, 4, 16, 32)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(2, 4, 16, 32)), jnp.float32)
    mask = jnp.asarray(np.arange(16)[None, :] < np.asarray([[9], [16]]))
    kq, kc = quantize_kv(k)
    vq, vc = quantize_kv(v)
    got = _quantized_cross_attention(q, kq, kc, vq, vc, mask=mask)
    ref = scaled_dot_product_attention(q, k, v, mask=mask[:, None, None, :])
    assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_engine_quantized_enc_kv_transcripts():
    """quantized_cache=True quantizes the cross-attention K/V too; the
    engine still produces float-engine transcripts on the leading tokens
    (divergence beyond that is int8 noise on a random-weight model)."""
    model = _model(seed=8)
    src = [7, 8, 9, 10, 11]

    def run(quantized):
        eng = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16,
                            quantized_cache=quantized)
        eng.submit(Request(prompt=src, max_new_tokens=6))
        return eng.run_to_completion(max_steps=40)[0].generated

    f, qz = run(False), run(True)
    assert f[:3] == qz[:3], (f, qz)


def test_gqa_seq2seq_engine():
    """GQA enc-dec: n_kv_heads shrinks both the decoder self-cache and the
    cross-attention K/V; engine transcripts track generate."""
    cfg = TransformerConfig(vocab_size=89, d_model=32, n_heads=4,
                            n_kv_heads=2, d_ff=64, n_layers=2, max_seq_len=64)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(9))
    assert model.init_cache(1, 16)[0][0].shape[1] == 2
    src = [5, 6, 7, 8]
    ref = np.asarray(model.generate(jnp.asarray([src]), 5))[0]
    for quantized in (False, True):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16,
                            quantized_cache=quantized)
        if quantized:
            assert eng.enc_kvs[0][0].shape[1] == 2     # int8 kq, Hkv heads
        eng.submit(Request(prompt=src, max_new_tokens=5))
        got = eng.run_to_completion(max_steps=40)[0].generated
        assert got[:3] == ref[:3].tolist(), (quantized, got, ref)


def test_seq2seq_engine_under_mesh_matches_single_device():
    """TP enc-dec serving: the engine drives a tensor-sharded int8
    Transformer (shard_map qmm kernels) with single-device transcripts."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    cfg = TransformerConfig(vocab_size=89, d_model=32, n_heads=8,
                            d_ff=64, n_layers=2, max_seq_len=64)
    qm = Transformer.init(cfg, key=jax.random.PRNGKey(12)).quantize()
    mesh = make_mesh((2, 4), ("data", "model"))
    qms = shard_quantized_model(qm, mesh)

    def transcripts(model, **kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16, **kw)
        for src in ([3, 4, 5], [6, 7, 8, 9]):
            eng.submit(Request(prompt=src, max_new_tokens=5))
        return [tuple(r.generated)
                for r in sorted(eng.run_to_completion(max_steps=40),
                                key=lambda r: r.id)]

    ref = transcripts(qm)
    out = transcripts(qms, mesh=mesh)
    assert ref == out
    outq = transcripts(qms, mesh=mesh, quantized_cache=True)
    assert len(outq) == 2 and all(len(t) == 5 for t in outq)


def test_seq2seq_logprobs():
    model = _model(seed=10)
    eng = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16)
    req = Request(prompt=[3, 4, 5], max_new_tokens=4, logprobs=True)
    eng.submit(req)
    fin = eng.run_to_completion(max_steps=30)[0]
    assert len(fin.token_logprobs) == len(fin.generated) == 4
    assert all(lp <= 0.0 for lp in fin.token_logprobs)


def test_seq2seq_decode_fault_recovery():
    """Donated-cache decode fault: in-flight requests fail with .error,
    the engine rebuilds its state and keeps serving (GPT-engine parity)."""
    model = _model(seed=13)
    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16,
                        quantized_cache=True)
    doomed = Request(prompt=[1, 2, 3], max_new_tokens=8)
    eng.submit(doomed)
    real = eng._decode
    state = {"boom": True}

    def flaky(*args):
        if state["boom"]:
            state["boom"] = False
            for leaf in jax.tree_util.tree_leaves(args[3]):
                leaf.delete()
            raise RuntimeError("injected decode fault")
        return real(*args)

    eng._decode = flaky
    fin = {r.id: r for r in eng.run_to_completion(max_steps=40)}
    assert "injected decode fault" in fin[doomed.id].error

    after = Request(prompt=[4, 5], max_new_tokens=4)
    eng.submit(after)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=40)}
    assert len(fin[after.id].generated) == 4 and fin[after.id].error is None


# ---------------------------------------------------------------------------
# paged decoder self-cache (r3 verdict #5: GPT-engine paged tier parity)
# ---------------------------------------------------------------------------

def test_paged_seq2seq_matches_dense_engine():
    """Paged decoder self-cache: same sources, same transcripts as the
    dense engine, pages released at the end."""
    model = _model(seed=31)

    def run(**kw):
        eng = Seq2SeqEngine(model, max_slots=3, max_new_tokens=140, **kw)
        reqs = [Request(prompt=[3 + i, 4, 5], max_new_tokens=n)
                for i, n in enumerate((6, 130, 20, 9))]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=400)}
        return eng, [(tuple(fin[r.id].generated), fin[r.id].error)
                     for r in reqs]

    eng_p, paged = run(paged=True)
    _, dense = run()
    assert all(e is None for _, e in paged), paged
    assert paged == dense
    st = eng_p.stats
    assert st["pages_in_use"] == 0
    assert st["pages_total"] >= 3


def test_paged_seq2seq_oversubscribed_backpressure():
    """A pool smaller than slots x max_dec_len still serves everything:
    admissions wait for pages instead of failing (max_new 130 needs 2
    pages; 3 slots want 6, pool has 4)."""
    model = _model(seed=32)
    eng = Seq2SeqEngine(model, max_slots=3, max_new_tokens=140, paged=True,
                        n_pages=5)
    for i in range(5):
        eng.submit(Request(prompt=[2 + i, 3], max_new_tokens=130))
    fin = eng.run_to_completion(max_steps=1000)
    assert len(fin) == 5
    assert all(len(r.generated) == 130 and r.error is None for r in fin)


def test_paged_seq2seq_cancel_releases_pages():
    model = _model(seed=33)
    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=140, paged=True)
    reqs = [Request(prompt=[5 + i] * 3, max_new_tokens=130)
            for i in range(2)]
    for r in reqs:
        eng.submit(r)
    eng.step()
    used = eng.stats["pages_in_use"]
    assert used >= 4                       # 2 slots x 2 reserved pages
    assert eng.cancel(reqs[0].id)
    assert eng.stats["pages_in_use"] < used
    fin = {r.id: r for r in eng.run_to_completion(max_steps=300)}
    assert fin[reqs[0].id].cancelled
    assert len(fin[reqs[1].id].generated) == 130


def test_paged_seq2seq_under_mesh_matches_single_device():
    """Paged seq2seq + TP: head-sharded pools, the paged decode runs
    inside shard_map, transcripts match the single-device paged engine."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    cfg = TransformerConfig(vocab_size=89, d_model=32, n_heads=8,
                            d_ff=64, n_layers=2, max_seq_len=64)
    qm = Transformer.init(cfg, key=jax.random.PRNGKey(34)).quantize()
    mesh = make_mesh((2, 4), ("data", "model"))
    qms = shard_quantized_model(qm, mesh)

    def transcripts(model, **kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16,
                            paged=True, **kw)
        for src in ([3, 4, 5], [6, 7, 8, 9]):
            eng.submit(Request(prompt=src, max_new_tokens=5))
        return [tuple(r.generated)
                for r in sorted(eng.run_to_completion(max_steps=60),
                                key=lambda r: r.id)]

    assert transcripts(qm) == transcripts(qms, mesh=mesh)


def test_paged_seq2seq_decode_fault_recovery():
    """A poisoned paged decode step fails in-flight requests, rebuilds the
    pools, and the engine keeps serving new submissions."""
    model = _model(seed=35)
    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=140, paged=True)
    r1 = Request(prompt=[4, 5, 6], max_new_tokens=8)
    eng.submit(r1)
    eng.step()

    real_decode = eng._decode

    def boom(*a, **k):
        raise RuntimeError("injected decode fault")

    eng._decode = boom
    eng.step()                              # fails + recovers
    eng._decode = real_decode
    assert r1.error and "injected" in r1.error
    assert eng.stats["pages_in_use"] == 0
    r2 = Request(prompt=[7, 8], max_new_tokens=5)
    eng.submit(r2)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=60)}
    assert fin[r2.id].error is None and len(fin[r2.id].generated) == 5


def test_paged_seq2seq_keeps_decoder_budget_validation():
    """Review r4: page-capacity rounding must not widen the bookkeeper's
    request validation — a max_new_tokens past the configured decoder
    budget is rejected exactly as in dense mode (positions beyond the
    model's positional table would otherwise decode garbage)."""
    import pytest
    model = _model(seed=36)
    eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=40, paged=True)
    with pytest.raises(ValueError, match="exceeds decoder budget"):
        eng.submit(Request(prompt=[3, 4], max_new_tokens=120))
    eng.submit(Request(prompt=[3, 4], max_new_tokens=40))   # at the limit
    fin = eng.run_to_completion(max_steps=80)
    assert len(fin) == 1 and fin[0].error is None
    assert len(fin[0].generated) == 40


def test_paged_seq2seq_composes_with_int8_cross_cache_and_gqa():
    """paged self-cache x int8 cross-attention K/V x GQA: transcripts
    match the same engine with a dense self-cache."""
    cfg = TransformerConfig(vocab_size=89, d_model=32, n_heads=4,
                            n_kv_heads=2, d_ff=64, n_layers=2,
                            max_seq_len=64)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(41))

    def run(**kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=20,
                            quantized_cache=True, **kw)
        for src in ([3, 4, 5], [6, 7, 8, 9], [10, 11]):
            eng.submit(Request(prompt=src, max_new_tokens=6))
        fin = sorted(eng.run_to_completion(max_steps=60),
                     key=lambda r: r.id)
        return [(tuple(r.generated), r.error) for r in fin]

    paged = run(paged=True)
    dense = run()
    assert all(e is None for _, e in paged), paged
    assert paged == dense


def test_seq2seq_multi_step_matches_single_step():
    """multi_step blocks produce the single-step engine's transcripts
    (EOS mid-block, mixed lengths, dense and paged)."""
    model = _model(seed=51)
    probe = Seq2SeqEngine(model, max_slots=1, max_new_tokens=16)
    pr = Request(prompt=[4, 5, 6], max_new_tokens=8)
    probe.submit(pr)
    probe.run_to_completion(max_steps=40)
    eos = pr.generated[4]

    spec = [([4, 5, 6], 8, eos), ([7, 8], 13, None), ([9] * 4, 5, eos),
            ([2, 3], 10, None)]

    def run(**kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=140, **kw)
        reqs = [Request(prompt=p, max_new_tokens=m, eos_token=e)
                for p, m, e in spec]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=400)}
        return [(tuple(fin[r.id].generated), fin[r.id].error)
                for r in reqs]

    ref = run()
    for kw in ({"multi_step": 4}, {"multi_step": 5, "paged": True}):
        got = run(**kw)
        assert all(e is None for _, e in got), (kw, got)
        assert got == ref, (kw, got, ref)


def test_seq2seq_speculative_matches_plain():
    """Enc-dec speculative decoding (draft_model=...): greedy transcripts
    EXACTLY equal the plain engine's for a self-draft and an unrelated
    draft, across EOS mid-block, ragged sources and slot churn; logprobs
    align; composes with multi_step (rounds per dispatch) and the paged
    decoder self-cache."""
    model = _model(seed=61)
    probe = Seq2SeqEngine(model, max_slots=1, max_new_tokens=20)
    pr = Request(prompt=[5, 6, 7], max_new_tokens=6)
    probe.submit(pr)
    probe.run_to_completion(max_steps=30)
    eos = pr.generated[3]

    spec = [([5, 6, 7], 6, eos), ([8, 9], 11, None), ([1] * 7, 9, None),
            ([2, 3, 4, 5], 8, eos), ([4] * 5, 7, None)]

    def run(**kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=20, **kw)
        reqs = [Request(prompt=p, max_new_tokens=m, eos_token=e,
                        logprobs=True)
                for p, m, e in spec]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=300)}
        return eng, [fin[r.id] for r in reqs]

    _, ref = run()
    ref_out = [(tuple(r.generated), r.error) for r in ref]
    for kw in (dict(draft_model=model, spec_gamma=3),
               dict(draft_model=_model(seed=62), spec_gamma=3),
               dict(draft_model=model, spec_gamma=3, multi_step=3),
               dict(draft_model=model, spec_gamma=3, paged=True),
               dict(draft_model=model, spec_gamma=3, paged=True,
                    multi_step=3)):
        eng, got = run(**kw)
        out = [(tuple(r.generated), r.error) for r in got]
        assert all(e is None for _, e in out), (kw, out)
        assert out == ref_out, (kw, out, ref_out)
        for r in got:
            assert len(r.token_logprobs) == len(r.generated), r
    # self-draft: fewer scheduler steps than tokens (blocks accepted)
    assert eng.steps < sum(len(r.generated) for r in got)


def test_seq2seq_speculative_mixed_sampling():
    """Stochastic verification serves mixed batches in the enc-dec
    engine too: the greedy slot's transcript equals the plain engine's
    exactly while temperature>0 slots complete in-round."""
    model = _model(seed=63)
    eng = Seq2SeqEngine(model, max_slots=3, max_new_tokens=20,
                        draft_model=model, spec_gamma=3, seed=9)
    g = Request(prompt=[5, 6], max_new_tokens=12)
    h1 = Request(prompt=[7, 8, 9], max_new_tokens=10, temperature=0.9)
    h2 = Request(prompt=[9], max_new_tokens=8, temperature=1.2, top_p=0.9)
    for r in (g, h1, h2):
        eng.submit(r)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=100)}
    assert all(fin[r.id].error is None for r in (g, h1, h2))
    assert len(fin[h1.id].generated) == 10
    assert len(fin[h2.id].generated) == 8

    ref = Seq2SeqEngine(model, max_slots=1, max_new_tokens=20)
    r2 = Request(prompt=[5, 6], max_new_tokens=12)
    ref.submit(r2)
    ref.run_to_completion(max_steps=50)
    assert fin[g.id].generated == r2.generated


def test_seq2seq_speculative_under_mesh_matches_single_device():
    """spec x TP (and x paged): target and draft both tensor-sharded —
    the verify decode_chunk runs the sharded model, the draft scans its
    own sharded decode; transcripts equal single-device."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    cfg = TransformerConfig(vocab_size=89, d_model=64, n_heads=8, d_ff=128,
                            n_layers=2, max_seq_len=64)
    m = Transformer.init(cfg, key=jax.random.PRNGKey(70)).quantize()
    d = Transformer.init(cfg, key=jax.random.PRNGKey(71)).quantize()
    mesh = make_mesh((2, 4), ("data", "model"))
    ms, ds = shard_quantized_model(m, mesh), shard_quantized_model(d, mesh)

    def run(model, draft, **kw):
        eng = Seq2SeqEngine(model, max_slots=2, max_new_tokens=16,
                            draft_model=draft, spec_gamma=3, **kw)
        reqs = [Request(prompt=[3 + i, 4, 5], max_new_tokens=6)
                for i in range(3)]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=60)}
        return [(tuple(fin[r.id].generated), fin[r.id].error) for r in reqs]

    for kw in ({}, {"paged": True}):
        tp = run(ms, ds, mesh=mesh, **kw)
        sd = run(m, d, **kw)
        assert all(e is None for _, e in tp), (kw, tp)
        assert tp == sd, (kw, tp, sd)
