"""Multi-chip dryrun: compile + execute the FULL sharded training step and
the tensor-parallel int8 serving matmul on an n-device mesh (virtual CPU
devices in CI; real chips on a pod).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qgemm_tpu.models.optim import sgd_step
from qgemm_tpu.models.transformer import Transformer, TransformerConfig
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss
from qgemm_tpu.ops.quantize import quantize_weights
from qgemm_tpu.parallel.mesh import make_mesh
from qgemm_tpu.parallel.sharding import shard_batch, shard_model
from qgemm_tpu.parallel.tp_ops import (
    tp_quantized_matmul_column,
    tp_quantized_matmul_row,
)


def run_dryrun(n_devices: int) -> None:
    data = max(1, n_devices // 4)
    model_par = n_devices // data
    mesh = make_mesh((data, model_par), ("data", "model"))

    # --- sharded training step (dp x tp via GSPMD) -------------------------
    cfg = TransformerConfig(vocab_size=128, d_model=8 * model_par,
                            n_heads=model_par, d_ff=16 * model_par,
                            n_layers=2, max_seq_len=32)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(0))
    model = shard_model(model, mesh)

    batch = {
        "src": jnp.zeros((2 * data, 6), jnp.int32),
        "tgt_in": jnp.ones((2 * data, 5), jnp.int32),
        "tgt_out": jnp.ones((2 * data, 5), jnp.int32),
    }
    batch = shard_batch(batch, mesh)

    @jax.jit
    def train_step(model, batch):
        def loss_fn(m):
            logits = m.forward(batch["src"], batch["tgt_in"])
            return cross_entropy_loss(logits.reshape(-1, cfg.vocab_size),
                                      batch["tgt_out"].reshape(-1))
        loss, grads = jax.value_and_grad(loss_fn)(model)
        return sgd_step(model, grads, 0.01), loss

    model, loss = train_step(model, batch)
    jax.block_until_ready(loss)
    assert bool(jnp.isfinite(loss)), f"non-finite loss {loss}"

    # --- tensor-parallel int8 serving matmuls (shard_map + collectives) ----
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (16, 32 * model_par), jnp.float32)
    w = jax.random.normal(k2, (32 * model_par, 16 * model_par), jnp.float32)
    wq = quantize_weights(w)

    col = tp_quantized_matmul_column(x, wq.q, wq.c, mesh)
    jax.block_until_ready(col)

    x2 = jax.random.normal(k1, (16, 16 * model_par), jnp.float32)
    w2 = jax.random.normal(k2, (16 * model_par, 32), jnp.float32)
    wq2 = quantize_weights(w2)
    row = tp_quantized_matmul_row(x2, wq2.q, wq2.c, mesh)
    jax.block_until_ready(row)

    # decode path under sharding: greedy generation one step
    gen = jax.jit(lambda m, s: m.generate(s, 2))
    toks = gen(model, batch["src"])
    jax.block_until_ready(toks)

    # --- integrated int8 TP serving path (BASELINE config 5) ---------------
    # quantized GPT with every GEMM routed through the shard_map int8
    # kernels (mesh-aware QuantizedLinear), driven by the continuous
    # batching engine with a head-sharded KV cache
    from qgemm_tpu.models.gpt import GPT as _GPT, GPTConfig as _GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    qcfg = _GPTConfig(vocab_size=64, d_model=8 * model_par,
                      n_heads=model_par, d_ff=16 * model_par, n_layers=2,
                      max_seq_len=64)
    qgpt = _GPT.init(qcfg, key=jax.random.PRNGKey(7)).quantize()
    qgpt_sharded = shard_quantized_model(qgpt, mesh)
    assert qgpt_sharded.blocks[0].attn.wqkv_q.tp_mode == "column"
    assert qgpt_sharded.blocks[0].ffn.down.tp_mode == "row"

    qtoks = jnp.ones((2, 6), jnp.int32)
    qgen_ref = jax.jit(lambda m, p: m.generate(p, 3))(qgpt, qtoks)
    qgen = jax.jit(lambda m, p: m.generate(p, 3))(qgpt_sharded, qtoks)
    jax.block_until_ready(qgen)
    assert bool(jnp.all(qgen == qgen_ref)), "TP int8 generate != single-device"

    eng = ContinuousBatchingEngine(qgpt_sharded, max_slots=2, mesh=mesh,
                                   quantized_cache=True)
    eng.submit(Request(prompt=[1, 2, 3], max_new_tokens=3))
    eng.submit(Request(prompt=[4, 5], max_new_tokens=3))
    fin = eng.run_to_completion()
    assert len(fin) == 2 and all(len(r.generated) == 3 for r in fin)

    # --- paged + prefix-cache + chunked + TP serving admission (r4) --------
    # >=128-token REPEATED prompts so the prefix map actually fires: the
    # suffix prefill runs the paged chunk program inside shard_map (the
    # seam the r3 dryrun skipped — a failed matched-prefix admission here
    # turns into req.error, which this asserts against)
    pcfg = _GPTConfig(vocab_size=64, d_model=8 * model_par,
                      n_heads=model_par, d_ff=16 * model_par, n_layers=2,
                      max_seq_len=384)
    pgpt = _GPT.init(pcfg, key=jax.random.PRNGKey(21)).quantize()
    pgpt_sharded = shard_quantized_model(pgpt, mesh)
    peng = ContinuousBatchingEngine(pgpt_sharded, max_slots=2, mesh=mesh,
                                    paged=True, chunked_prefill=128,
                                    multi_step=3)
    assert peng.prefix_cache, "prefix cache should stay enabled under TP"
    system = [1 + (i % 60) for i in range(160)]
    for t in (7, 9):
        peng.submit(Request(prompt=system + [t], max_new_tokens=3))
    pfin = peng.run_to_completion(max_steps=60)
    assert len(pfin) == 2 and all(r.error is None for r in pfin), \
        [r.error for r in pfin]
    assert all(len(r.generated) == 3 for r in pfin)
    assert peng.alloc.prefix_hits >= 1, "prefix map never fired under TP"

    # --- speculative x paged x TP engine (r4): the batched verify chunk
    # runs inside shard_map on head-sharded pools -----------------------
    pdraft_sharded = shard_quantized_model(
        _GPT.init(pcfg, key=jax.random.PRNGKey(22)).quantize(), mesh)
    speng = ContinuousBatchingEngine(pgpt_sharded, max_slots=2, mesh=mesh,
                                     paged=True, draft_model=pdraft_sharded,
                                     spec_gamma=3)
    for t in (11, 13):
        speng.submit(Request(prompt=[t, t + 1], max_new_tokens=4))
    sfin = speng.run_to_completion(max_steps=60)
    assert len(sfin) == 2 and all(r.error is None for r in sfin), \
        [r.error for r in sfin]
    assert all(len(r.generated) == 4 for r in sfin)

    # --- paged seq2seq engine under TP (r4) --------------------------------
    from qgemm_tpu.serving.seq2seq import Seq2SeqEngine
    s2s_cfg = TransformerConfig(vocab_size=64, d_model=8 * model_par,
                                n_heads=model_par, d_ff=16 * model_par,
                                n_layers=2, max_seq_len=160)
    s2s = Transformer.init(s2s_cfg, key=jax.random.PRNGKey(23)).quantize()
    from qgemm_tpu.parallel.sharding import shard_quantized_model as _sqm
    s2s_sharded = _sqm(s2s, mesh)
    seng = Seq2SeqEngine(s2s_sharded, max_slots=2, max_new_tokens=140,
                         mesh=mesh, paged=True)
    seng.submit(Request(prompt=[3, 4, 5], max_new_tokens=130))  # 2 pages
    sfin = seng.run_to_completion(max_steps=200)
    assert len(sfin) == 1 and sfin[0].error is None, sfin[0].error
    assert len(sfin[0].generated) == 130
    assert seng.stats["pages_in_use"] == 0

    # --- seq2seq speculative x paged x TP (r4): the verify decode_chunk
    # runs the sharded target, the (self-)draft its own sharded scan ----
    sspec = Seq2SeqEngine(s2s_sharded, max_slots=2, max_new_tokens=24,
                          mesh=mesh, paged=True, draft_model=s2s_sharded,
                          spec_gamma=3)
    for t in (7, 9):
        sspec.submit(Request(prompt=[t, t + 1], max_new_tokens=5))
    spfin = sspec.run_to_completion(max_steps=60)
    assert len(spfin) == 2 and all(r.error is None for r in spfin), \
        [r.error for r in spfin]
    assert all(len(r.generated) == 5 for r in spfin)

    # --- over-commit + preemption x paged x TP (r5): admission on
    # pages-needed-now, pool pressure preempts the youngest slot, its
    # continuation re-admits through the sharded prefill ---------------
    oeng = ContinuousBatchingEngine(pgpt_sharded, max_slots=2, mesh=mesh,
                                    paged=True, overcommit=True,
                                    n_pages=9, page_size=8)
    for t in (15, 17):
        oeng.submit(Request(prompt=[t, t + 1, t + 2], max_new_tokens=40))
    ofin = oeng.run_to_completion(max_steps=400)
    assert len(ofin) == 2 and all(r.error is None for r in ofin), \
        [r.error for r in ofin]
    assert all(len(r.generated) == 40 for r in ofin)

    # --- MoE GPT in the engine under the mesh (r5): expert-sharded
    # w_up/w_down (GSPMD) + shard_map attention, dense and paged -------
    mcfg = _GPTConfig(vocab_size=64, d_model=8 * model_par,
                      n_heads=model_par, d_ff=16 * model_par, n_layers=2,
                      max_seq_len=128, n_experts=n_devices, moe_top_k=2)
    mgpt = _GPT.init(mcfg, key=jax.random.PRNGKey(31)).quantize()
    mgpt_sharded = shard_quantized_model(mgpt, mesh)
    for kw in ({}, {"paged": True}):
        meng = ContinuousBatchingEngine(mgpt_sharded, max_slots=2,
                                        mesh=mesh, **kw)
        for t in (19, 21):
            meng.submit(Request(prompt=[t, t + 1], max_new_tokens=3))
        mfin = meng.run_to_completion(max_steps=60)
        assert len(mfin) == 2 and all(r.error is None for r in mfin), \
            [r.error for r in mfin]
        assert all(len(r.generated) == 3 for r in mfin)

    # --- all-to-all expert parallelism (r3) --------------------------------
    from qgemm_tpu.models.moe import MoEFeedForward
    from qgemm_tpu.parallel.expert import ep_moe_forward_a2a, shard_moe
    ep_mesh = make_mesh((n_devices,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(13), 16, 32,
                              n_experts=n_devices, top_k=2,
                              capacity_factor=8.0)
    xm = jax.random.normal(jax.random.PRNGKey(14), (8 * n_devices, 16))
    a2a_out = ep_moe_forward_a2a(xm, shard_moe(moe, ep_mesh), ep_mesh)
    assert bool(jnp.allclose(a2a_out, moe(xm), rtol=1e-3, atol=1e-3)), \
        "a2a EP != single-device MoE"

    # --- W4A8 tensor parallelism (r3) --------------------------------------
    from qgemm_tpu.ops.quantize import (quantize_weights_int4,
                                        quantized_matmul_prequant_w4)
    from qgemm_tpu.parallel.tp_ops import (tp_w4a8_matmul_column,
                                           tp_w4a8_matmul_row)
    k4 = 128 * model_par                 # groups divide the model axis
    x4 = jax.random.normal(k1, (8, k4), jnp.float32)
    w4 = jax.random.normal(k2, (k4, 16 * model_par), jnp.float32)
    wq4 = quantize_weights_int4(w4)
    ref4 = quantized_matmul_prequant_w4(x4, wq4)
    c4 = tp_w4a8_matmul_column(x4, wq4.qp, wq4.c, mesh)
    assert bool(jnp.allclose(c4, ref4, rtol=1e-4, atol=1e-4)), \
        "w4a8 column-TP != single-chip"
    r4 = tp_w4a8_matmul_row(x4, wq4.qp, wq4.c, mesh)
    assert bool(jnp.all(jnp.isfinite(r4))), "non-finite w4a8 row-TP"

    # --- GQA (n_kv_heads < n_heads) sharded generate (r3) ------------------
    gqa_cfg = _GPTConfig(vocab_size=64, d_model=16 * model_par,
                         n_heads=2 * model_par, n_kv_heads=model_par,
                         d_ff=16 * model_par, n_layers=2, max_seq_len=32)
    gqa = _GPT.init(gqa_cfg, key=jax.random.PRNGKey(11))
    gqa_toks = jax.jit(lambda m, p: m.generate(
        p, 2, quantized_cache=True))(gqa, jnp.ones((2, 4), jnp.int32))
    jax.block_until_ready(gqa_toks)

    # --- speculative decoding loop compiles + runs (r3) --------------------
    from qgemm_tpu.serving.speculative import speculative_generate
    spec = speculative_generate(qgpt, qgpt, jnp.ones((1, 3), jnp.int32),
                                4, gamma=2)     # self-draft: full acceptance
    assert int(spec.rounds) >= 1 and spec.tokens.shape == (4,)

    # --- pipeline parallelism: GPipe fwd + bwd over a `pipe` axis ----------
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.pipeline import pipeline_gpt_forward

    pipe_mesh = make_mesh((n_devices,), ("pipe",))
    gcfg = GPTConfig(vocab_size=64, d_model=16, n_heads=2, d_ff=32,
                     n_layers=2 * n_devices, max_seq_len=16)
    gpt = GPT.init(gcfg, key=jax.random.PRNGKey(2))
    gtoks = jnp.zeros((2 * n_devices, 8), jnp.int32)

    @jax.jit
    def pipe_train_step(m, t):
        def loss_fn(m):
            logits = pipeline_gpt_forward(m, t, mesh=pipe_mesh)
            return cross_entropy_loss(logits.reshape(-1, gcfg.vocab_size),
                                      t.reshape(-1))
        loss, grads = jax.value_and_grad(loss_fn)(m)
        return sgd_step(m, grads, 0.01), loss

    gpt, gloss = pipe_train_step(gpt, gtoks)
    jax.block_until_ready(gloss)
    assert bool(jnp.isfinite(gloss)), f"non-finite pipeline loss {gloss}"

    # --- sequence parallelism: causal ring attention over a `seq` axis -----
    from qgemm_tpu.parallel.ring_attention import ring_attention

    seq_mesh = make_mesh((n_devices,), ("seq",))
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, 2, 8 * n_devices, 8), jnp.float32)
    kk_ = jax.random.normal(kk, (2, 2, 8 * n_devices, 8), jnp.float32)
    vv = jax.random.normal(kv, (2, 2, 8 * n_devices, 8), jnp.float32)
    attn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=seq_mesh,
                                                  causal=True))(q, kk_, vv)
    jax.block_until_ready(attn)
    assert bool(jnp.all(jnp.isfinite(attn))), "non-finite ring attention"

    # Ulysses (all-to-all) sequence parallelism: heads exchanged for
    # sequence, full-S attention per head group, exchanged back
    from qgemm_tpu.parallel.ulysses import ulysses_attention
    qu = jax.random.normal(kq, (2, n_devices, 8 * n_devices, 8), jnp.float32)
    ul = jax.jit(lambda q: ulysses_attention(q, q, q, mesh=seq_mesh,
                                             causal=True))(qu)
    jax.block_until_ready(ul)
    assert bool(jnp.all(jnp.isfinite(ul))), "non-finite ulysses attention"

    # --- expert parallelism: MoE GPT, experts sharded over an `expert` axis
    from qgemm_tpu.models.moe import MoEFeedForward
    from qgemm_tpu.parallel.expert import ep_moe_forward

    ep_mesh = make_mesh((n_devices,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(4), 16, 32,
                              n_experts=2 * n_devices, top_k=2)
    xm = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 16), jnp.float32)
    # training step through the EP forward (grads flow through the psum)
    @jax.jit
    def ep_train_step(moe, xm):
        def loss_fn(moe):
            out = ep_moe_forward(xm, moe, ep_mesh)
            return jnp.mean(out * out)
        loss, grads = jax.value_and_grad(loss_fn)(moe)
        return sgd_step(moe, grads, 0.01), loss

    moe, eloss = ep_train_step(moe, xm)
    jax.block_until_ready(eloss)
    assert bool(jnp.isfinite(eloss)), f"non-finite EP loss {eloss}"
    # int8 expert serving path under the same mesh
    eq = ep_moe_forward(xm, moe.quantize(), ep_mesh)
    jax.block_until_ready(eq)
    assert bool(jnp.all(jnp.isfinite(eq))), "non-finite int8 EP output"
