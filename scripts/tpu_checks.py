#!/usr/bin/env python
"""One-shot hardware verification: every TPU-only assertion in one place.

The pytest suite runs on the virtual CPU mesh (kernels in interpreter
mode); this script is the real-chip counterpart — run it after touching
any Pallas kernel. Asserts, on actual hardware:

  1. fused quantized matmul == XLA oracle (pallas vs jnp, odd shapes too)
  2. int8 dynamic pipeline FASTER than bf16 dot at 2048^3 (the north star)
  3. flash attention fwd+bwd == jnp oracle at S=4k bf16 AND zero temp HBM
     (jit memory_analysis: the naive backward materializes ~269 MB)
  4. decode attention over the int8 cache == masked reference for odd
     batch sizes and ragged per-slot lengths (both dot branches)

Prints one JSON line {"ok": true, ...} and exits nonzero on any failure.
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    rng = np.random.default_rng(0)
    results = {}

    # 1. fused qmm parity (incl. ragged shapes)
    from qgemm_tpu.ops.quantize import quantized_matmul, quantized_matmul_xla
    for (m, k, n) in ((512, 1024, 768), (300, 500, 200), (2048, 2048, 2048)):
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
        got = quantized_matmul(x, w, backend="pallas")
        ref = quantized_matmul_xla(x, w)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 1e-3, f"qmm {m}x{k}x{n}: pallas vs xla {err}"
    results["qmm_parity"] = "ok"

    # 2. int8 beats bf16 at the reference problem size
    from qgemm_tpu.ops.pallas.quantized_matmul import quantized_matmul_pallas
    from qgemm_tpu.utils.profiling import bench_ms
    x = jax.random.uniform(jax.random.PRNGKey(0), (2048, 2048), jnp.float32,
                           minval=-1, maxval=1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (2048, 2048), jnp.float32,
                           minval=-1, maxval=1)
    t_int8 = bench_ms(quantized_matmul_pallas, x, w, iters=400, base=25)
    t_bf16 = bench_ms(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), iters=400, base=25)
    results["int8_vs_bf16"] = round(t_bf16 / t_int8, 3)
    assert t_int8 < t_bf16, f"int8 {t_int8} ms NOT faster than bf16 {t_bf16}"

    # 3. flash fwd+bwd parity + memory
    from qgemm_tpu.ops.pallas.flash_attention import (_reference_attention,
                                                      flash_attention)
    B, H, S, D = 1, 2, 4096, 128
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, True).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, True)
                       .astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))
    for a, b in zip(g(q, kk, v), gr(q, kk, v)):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        rel = float(jnp.linalg.norm(a32 - b32) / jnp.linalg.norm(b32))
        assert rel < 1e-2, f"flash grad rel err {rel}"
    mf = g.lower(q, kk, v).compile().memory_analysis().temp_size_in_bytes
    mr = gr.lower(q, kk, v).compile().memory_analysis().temp_size_in_bytes
    results["flash_bwd_temp_mb"] = round(mf / 1e6, 1)
    results["naive_bwd_temp_mb"] = round(mr / 1e6, 1)
    assert mf < 0.2 * mr, f"flash bwd temp {mf} not << naive {mr}"

    # 4. decode attention, odd B + ragged lengths, both dot branches
    from qgemm_tpu.ops.kv_cache import quantize_kv
    from qgemm_tpu.ops.pallas.decode_attention import decode_attention
    from qgemm_tpu.models.attention import scaled_dot_product_attention
    for b in (5, 8, 20):   # 20 exercises the batched-dot branch
        s = 640
        qd = jax.random.normal(jax.random.PRNGKey(2), (b, 4, 1, 128))
        kq, kc = quantize_kv(jax.random.normal(jax.random.PRNGKey(3),
                                               (b, 4, s, 128)))
        vq, vc = quantize_kv(jax.random.normal(jax.random.PRNGKey(4),
                                               (b, 4, s, 128)))
        lengths = (jnp.arange(b, dtype=jnp.int32) * 37) % (s - 16) + 16
        got = decode_attention(qd, kq, vq, lengths, kc=kc, vc=vc)
        kd = kq.astype(jnp.float32) * kc / 127.0
        vd = vq.astype(jnp.float32) * vc / 127.0
        mask = jnp.arange(s)[None, None, None, :] < lengths[:, None, None, None]
        ref = scaled_dot_product_attention(qd, kd, vd, mask=mask)
        err = float(jnp.max(jnp.abs(got - ref)))
        assert err < 6e-3, f"decode B={b}: {err}"
    results["decode_parity"] = "ok"

    # 4b. GQA decode: Hq = g*Hkv query heads over an Hkv-head cache
    bq_, hkv_, g_, sq_, dq_ = 3, 2, 4, 640, 128
    qg = jax.random.normal(jax.random.PRNGKey(5), (bq_, hkv_ * g_, 1, dq_))
    kqg, kcg = quantize_kv(jax.random.normal(jax.random.PRNGKey(6),
                                             (bq_, hkv_, sq_, dq_)))
    vqg, vcg = quantize_kv(jax.random.normal(jax.random.PRNGKey(7),
                                             (bq_, hkv_, sq_, dq_)))
    lg = jnp.asarray([640, 130, 17], jnp.int32)
    got = decode_attention(qg, kqg, vqg, lg, kc=kcg, vc=vcg)
    kd = jnp.repeat(kqg.astype(jnp.float32) * kcg / 127.0, g_, axis=1)
    vd = jnp.repeat(vqg.astype(jnp.float32) * vcg / 127.0, g_, axis=1)
    maskg = jnp.arange(sq_)[None, None, None, :] < lg[:, None, None, None]
    refg = scaled_dot_product_attention(qg, kd, vd, mask=maskg)
    err = float(jnp.max(jnp.abs(got - refg)))
    assert err < 6e-3, f"GQA decode: {err}"
    results["gqa_decode_parity"] = "ok"

    # 5. paged decode attention (scalar-prefetch kernel) == gather oracle
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                               PagedKVCache, init_paged_cache,
                                               paged_attention_reference,
                                               paged_write_prompt)
    b, h, d, pps = 4, 4, 128, 6
    n_pg = 1 + b * pps
    cache = init_paged_cache(h, d, n_pages=n_pg, batch=b, pages_per_slot=pps)
    alloc = PageAllocator(n_pg, b, pps)
    lens = [700, 129, 40, 512]
    pt = np.zeros((b, pps), np.int32)
    for slot, ln in enumerate(lens):
        for j, p in alloc.grow(slot, ln):
            pt[slot, j] = p
    cache = PagedKVCache(kq=cache.kq, kc=cache.kc, vq=cache.vq, vc=cache.vc,
                         page_table=jnp.asarray(pt), page_size=PAGE_SIZE)
    wp = jax.jit(paged_write_prompt)
    for slot, ln in enumerate(lens):
        bucket = -(-ln // PAGE_SIZE) * PAGE_SIZE
        kp = jnp.asarray(rng.normal(size=(h, bucket, d)).astype(np.float32))
        vp = jnp.asarray(rng.normal(size=(h, bucket, d)).astype(np.float32))
        cache = wp(cache, slot, kp, vp)
    from qgemm_tpu.ops.pallas.paged_attention import paged_decode_attention
    jl = jnp.asarray(lens, jnp.int32)
    qp_ = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))
    got = paged_decode_attention(qp_, cache, jl)
    ref = paged_attention_reference(qp_, cache, jl)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 5e-3, f"paged kernel vs oracle: {err}"   # bf16-dot tolerance
    results["paged_parity"] = "ok"

    # 5b. ragged-grid paged kernel == oracle (allocated > resident + padding)
    from dataclasses import replace as _rep

    from qgemm_tpu.ops.pallas.paged_attention import \
        paged_decode_attention_ragged
    from qgemm_tpu.serving.paged_cache import build_step_tables
    counts = [len(p) for p in alloc.slot_pages]
    counts[0] += 1                      # allocated-but-unfilled page
    ss, sp = build_step_tables(counts, pps, bucket=8)
    rcache = _rep(cache, step_slot=jnp.asarray(ss), step_page=jnp.asarray(sp))
    got = paged_decode_attention_ragged(qp_, rcache, jl)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 5e-3, f"ragged paged kernel vs oracle: {err}"
    # GQA: 3 query groups per pool head through the same kernel (1e-2:
    # kernel and oracle both run bf16 dots but on different shapes, so the
    # delta is rounding noise — exact-f32 parity is pinned by the CPU
    # interpret test in tests/test_gqa.py)
    qg_ = jnp.asarray(rng.normal(size=(b, h * 3, 1, d)).astype(np.float32))
    got_g = paged_decode_attention_ragged(qg_, rcache, jl)
    ref_g = paged_attention_reference(qg_, rcache, jl)
    err_g = float(jnp.max(jnp.abs(got_g - ref_g)))
    assert err_g < 1e-2, f"ragged paged GQA vs oracle: {err_g}"
    results["ragged_parity"] = "ok"

    # 5c. blocked context kernel == oracle (the prefix-skip suffix path):
    # per-slot B=1 call shape, GQA fold, and the row-tiled regime
    # (rows=512 -> two 256-row blocks). Same 1e-2 bf16 rounding bar as 5b.
    from qgemm_tpu.ops.pallas.paged_attention import paged_context_attention
    from qgemm_tpu.serving.paged_cache import \
        paged_context_attention_reference
    c0 = _rep(cache, page_table=cache.page_table[0:1])
    jl0 = jl[0:1]
    for g_ctx in (2, 4):                # rows 256 (one block) / 512 (tiled)
        qc_ = jnp.asarray(
            rng.normal(size=(1, h * g_ctx, 128, d)).astype(np.float32))
        off0 = jl0 - 128
        got_c = paged_context_attention(qc_, c0, jl0, off0)
        ref_c = paged_context_attention_reference(qc_, c0, jl0, off0)
        err_c = float(jnp.max(jnp.abs(got_c - ref_c)))
        assert err_c < 1e-2, f"context kernel g={g_ctx} vs oracle: {err_c}"
    results["context_parity"] = "ok"

    # 5d. ring attention executes its flash-composed body on hardware
    #     (1-device 'seq' mesh: the ring degenerates to one causal flash
    #     call + a no-op ppermute — validates the shard_map+kernel+custom-
    #     VJP composition compiles and matches the jnp oracle on TPU)
    from jax.sharding import Mesh
    from qgemm_tpu.models.attention import scaled_dot_product_attention
    from qgemm_tpu.parallel.ring_attention import ring_attention
    rmesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    qr = jnp.asarray(rng.normal(size=(1, 2, 512, 128)).astype(np.float32))
    kr = jnp.asarray(rng.normal(size=(1, 2, 512, 128)).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=(1, 2, 512, 128)).astype(np.float32))
    got_r = ring_attention(qr, kr, vr, mesh=rmesh, causal=True)
    ref_r = scaled_dot_product_attention(qr, kr, vr, causal=True)
    rel_r = float(jnp.linalg.norm(got_r - ref_r) / jnp.linalg.norm(ref_r))
    assert rel_r < 5e-3, f"ring attention vs oracle on TPU: {rel_r}"
    gr_ = jax.grad(lambda q: jnp.sum(ring_attention(
        q, kr, vr, mesh=rmesh, causal=True).astype(jnp.float32) ** 2))(qr)
    assert bool(jnp.isfinite(gr_).all())
    results["ring_parity"] = "ok"

    # 5c. W4A8 kernel == dequantized-weight oracle on hardware
    from qgemm_tpu.ops.quantize import (dequantize_weights_int4,
                                        quantize_weights_int4,
                                        quantized_matmul_prequant_w4)
    for (m4, k4, n4) in ((256, 2048, 1024), (33, 300, 130)):
        x4 = jnp.asarray(rng.normal(size=(m4, k4)).astype(np.float32))
        w4 = jnp.asarray(rng.normal(size=(k4, n4)).astype(np.float32)
                         / (k4 ** 0.5))
        wq4 = quantize_weights_int4(w4)
        got4 = quantized_matmul_prequant_w4(x4, wq4)
        ref4 = x4 @ dequantize_weights_int4(wq4, k=k4)
        rel4 = float(jnp.linalg.norm(got4 - ref4) / jnp.linalg.norm(ref4))
        assert rel4 < 0.02, f"w4a8 {m4}x{k4}x{n4}: {rel4}"
    results["w4a8_parity"] = "ok"

    # 6. TP serving runs the SAME fused kernels inside shard_map: on a
    #    1-device model mesh, the TP decode step's compiled HLO must contain
    #    the Pallas custom-calls (one per layer for decode attention, plus
    #    the qmm kernels), and transcripts must match the single-chip path.
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_kv_caches, \
        shard_quantized_model
    n_layers = 2
    cfg = GPTConfig(vocab_size=64, d_model=256, n_heads=2, d_ff=256,
                    n_layers=n_layers, max_seq_len=256)
    gm = GPT.init(cfg, key=jax.random.PRNGKey(7))
    qm = gm.quantize()
    mesh = make_mesh((1, 1), ("data", "model"))
    qms = shard_kv = shard_quantized_model(qm, mesh)
    bsz = 2
    caches_sd = qm.init_cache(bsz, 256, quantized=True)
    caches_tp = shard_kv_caches(qm.init_cache(bsz, 256, quantized=True), mesh)
    tok = jnp.asarray(rng.integers(0, 64, size=(bsz, 1)), jnp.int32)
    pos = jnp.full((bsz,), 130, jnp.int32)   # >=128 so the kernel engages
    step = jax.jit(lambda m, t, p, c: m.decode_step(t, p, c)[0])
    ref_logits = step(qm, tok, pos, caches_sd)
    tp_logits = step(qms, tok, pos, caches_tp)
    err = float(jnp.max(jnp.abs(ref_logits - tp_logits)))
    assert err < 5e-3, f"TP decode vs single-chip logits: {err}"
    txt = jax.jit(lambda m, t, p, c: m.decode_step(t, p, c)[0]).lower(
        qms, tok, pos, caches_tp).compile().as_text()
    n_cc = txt.count("tpu_custom_call")
    assert n_cc >= n_layers, f"TP decode HLO has {n_cc} pallas custom-calls"
    results["tp_decode_custom_calls"] = n_cc
    # full-sequence flash under TP (no-cache forward, S=256)
    toks = jnp.asarray(rng.integers(0, 64, size=(1, 256)), jnp.int32)
    fwd = jax.jit(lambda m, t: m.forward(t))
    ref_f = fwd(qm, toks)
    tp_f = fwd(qms, toks)
    errf = float(jnp.max(jnp.abs(ref_f - tp_f)))
    assert errf < 5e-3, f"TP forward vs single-chip: {errf}"
    txtf = fwd.lower(qms, toks).compile().as_text()
    ncf = txtf.count("tpu_custom_call")
    assert ncf >= n_layers, f"TP forward HLO has {ncf} pallas custom-calls"
    results["tp_flash_custom_calls"] = ncf

    # 7. int8 flash attention parity on the real MXU (the quantized-
    #    attention option — measured slower than bf16 flash on v5e,
    #    SOL.md, but it must stay CORRECT)
    from qgemm_tpu.ops.pallas.flash_attention import _reference_attention
    from qgemm_tpu.ops.pallas.int8_flash_attention import \
        flash_attention_int8
    qa = jnp.asarray(rng.normal(size=(1, 2, 512, 64)), jnp.float32)
    ka = jnp.asarray(rng.normal(size=(1, 2, 512, 64)), jnp.float32)
    va = jnp.asarray(rng.normal(size=(1, 2, 512, 64)), jnp.float32)
    ref8 = _reference_attention(qa, ka, va, True)
    for qk_only in (False, True):
        got8 = flash_attention_int8(qa, ka, va, True, qk_only=qk_only)
        e8 = float(jnp.max(jnp.abs(got8 - ref8)))
        assert e8 < 5e-2, f"int8 flash (qk_only={qk_only}) err {e8}"
    results["int8_flash_parity"] = "ok"

    # 8. paged + prefix-cache + TP admission on the real chip: a repeated
    #    >=2-page prompt must be SERVED via the suffix chunk program under
    #    shard_map (the r3 latent bug's exact path), transcript-equal to
    #    the single-device paged engine
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    pcfg = GPTConfig(vocab_size=64, d_model=256, n_heads=2, d_ff=256,
                     n_layers=2, max_seq_len=512)
    pqm = GPT.init(pcfg, key=jax.random.PRNGKey(9)).quantize()
    pqms = shard_quantized_model(pqm, mesh)
    system = [1 + (i % 60) for i in range(256)]

    def serve(model, **kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, **kw)
        outs = []
        for t in (7, 9):
            r = Request(prompt=system + [t], max_new_tokens=3)
            eng.submit(r)
            eng.run_to_completion(max_steps=30)
            outs.append((tuple(r.generated), r.error))
        return eng, outs

    eng_tp, tp_out = serve(pqms, mesh=mesh)
    _, sd_out = serve(pqm)
    assert all(e is None for _, e in tp_out), tp_out
    assert tp_out == sd_out, (tp_out, sd_out)
    assert eng_tp.alloc.prefix_hits >= 2, eng_tp.alloc.prefix_hits
    results["tp_paged_prefix_skip"] = "ok"

    # 8. SPECULATIVE paged engine on the chip: self-draft rounds accept
    #    full blocks (steps << tokens) and serve error-free; greedy bf16
    #    near-ties make exact transcript equality machine-dependent, so
    #    the pin is acceptance + health, not bitwise output (exactness is
    #    pinned in f32 by tests/test_gpt_serving.py)
    seng = ContinuousBatchingEngine(pqm, max_slots=2, paged=True,
                                    draft_model=pqm, spec_gamma=3,
                                    multi_step=2)
    sreqs = [Request(prompt=[5 + i, 6, 7], max_new_tokens=12)
             for i in range(3)]
    for r in sreqs:
        seng.submit(r)
    sfin = {r.id: r for r in seng.run_to_completion(max_steps=60)}
    assert all(sfin[r.id].error is None for r in sreqs), \
        [sfin[r.id].error for r in sreqs]
    n_tok = sum(len(sfin[r.id].generated) for r in sreqs)
    assert n_tok == 36 and seng.steps < n_tok, (n_tok, seng.steps)
    results["spec_paged_engine"] = "ok"

    print(json.dumps({"ok": True, **results}))


if __name__ == "__main__":
    main()
