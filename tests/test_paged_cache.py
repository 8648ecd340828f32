"""Paged KV cache: allocator, write paths, and attention oracle parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.attention import scaled_dot_product_attention
from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                           PagedKVCache, init_paged_cache,
                                           paged_attention_reference,
                                           paged_write_prompt,
                                           paged_write_step)
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(11)


def test_allocator_grow_release():
    a = PageAllocator(n_pages=8, batch=2, pages_per_slot=4)
    assert a.n_free == 7                      # page 0 reserved
    new = a.grow(0, 1)                        # 1 token -> 1 page
    assert len(new) == 1 and new[0][0] == 0
    assert a.grow(0, PAGE_SIZE) == []         # still fits page 0
    new = a.grow(0, PAGE_SIZE + 1)            # crosses into page 1
    assert len(new) == 1 and new[0][0] == 1
    a.grow(1, 2 * PAGE_SIZE)
    assert a.n_free == 3
    a.release(0)
    assert a.n_free == 5
    with pytest.raises(RuntimeError, match="page table full"):
        a.grow(1, 5 * PAGE_SIZE)


def _filled_cache(b=3, h=2, d=64, lengths=(40, 200, 129), pps=3,
                  n_pages=16):
    """Build a paged cache holding known K/V for each slot, plus the dense
    [B, H, S, D] arrays they should reconstruct to."""
    cache = init_paged_cache(h, d, n_pages=n_pages, batch=b,
                             pages_per_slot=pps)
    alloc = PageAllocator(n_pages, b, pps)
    s_max = pps * PAGE_SIZE
    k_dense = np.zeros((b, h, s_max, d), np.float32)
    v_dense = np.zeros((b, h, s_max, d), np.float32)
    pt = np.zeros((b, pps), np.int32)
    for slot, ln in enumerate(lengths):
        for j, p in alloc.grow(slot, ln):
            pt[slot, j] = p
    cache = PagedKVCache(kq=cache.kq, kc=cache.kc, vq=cache.vq, vc=cache.vc,
                         page_table=jnp.asarray(pt), page_size=PAGE_SIZE)
    # prefill each slot with a bucket-padded prompt
    wp = jax.jit(paged_write_prompt)
    for slot, ln in enumerate(lengths):
        bucket = -(-ln // PAGE_SIZE) * PAGE_SIZE
        kp = RNG.normal(size=(h, bucket, d)).astype(np.float32)
        vp = RNG.normal(size=(h, bucket, d)).astype(np.float32)
        k_dense[slot, :, :bucket] = kp
        v_dense[slot, :, :bucket] = vp
        cache = wp(cache, slot, jnp.asarray(kp), jnp.asarray(vp))
    return cache, k_dense, v_dense, jnp.asarray(lengths, jnp.int32)


def _dequant_dense(x):
    """Round-trip through the same per-position int8 scheme the cache uses,
    so comparisons isolate the PAGING logic from quantization noise."""
    from qgemm_tpu.serving.paged_cache import quantize_rows
    q8, c = quantize_rows(jnp.asarray(x))
    return q8.astype(jnp.float32) * c / 127.0


def test_paged_attention_matches_dense():
    b, h, d = 3, 2, 64
    cache, k_dense, v_dense, lengths = _filled_cache(b, h, d)
    q = jnp.asarray(RNG.normal(size=(b, h, 1, d)).astype(np.float32))
    got = paged_attention_reference(q, cache, lengths)
    s_max = k_dense.shape[2]
    mask = jnp.arange(s_max)[None, None, None, :] < lengths[:, None, None, None]
    ref = scaled_dot_product_attention(q, _dequant_dense(k_dense),
                                       _dequant_dense(v_dense), mask=mask)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_paged_decode_step_write():
    """A decode-step write lands at the right (page, offset) and the next
    attention sees it."""
    b, h, d = 3, 2, 64
    lengths = (40, 200, 129)
    cache, k_dense, v_dense, jl = _filled_cache(b, h, d, lengths)
    k_new = jnp.asarray(RNG.normal(size=(b, h, 1, d)).astype(np.float32))
    v_new = jnp.asarray(RNG.normal(size=(b, h, 1, d)).astype(np.float32))
    positions = jnp.asarray(lengths, jnp.int32)       # append at the end
    cache = paged_write_step(cache, k_new, v_new, positions)

    k_dense = np.array(k_dense)
    v_dense = np.array(v_dense)
    for slot, ln in enumerate(lengths):
        k_dense[slot, :, ln] = np.asarray(k_new[slot, :, 0])
        v_dense[slot, :, ln] = np.asarray(v_new[slot, :, 0])

    q = jnp.asarray(RNG.normal(size=(b, h, 1, d)).astype(np.float32))
    got = paged_attention_reference(q, cache, jl + 1)
    s_max = k_dense.shape[2]
    mask = jnp.arange(s_max)[None, None, None, :] < (jl + 1)[:, None, None, None]
    ref = scaled_dot_product_attention(q, _dequant_dense(k_dense),
                                       _dequant_dense(v_dense), mask=mask)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_pages_are_shared_pool_not_per_slot():
    """Two slots with interleaved allocations occupy disjoint physical
    pages from one pool (the memory-scaling property)."""
    a = PageAllocator(n_pages=64, batch=4, pages_per_slot=8)
    a.grow(0, 3 * PAGE_SIZE)
    a.grow(1, 2 * PAGE_SIZE)
    a.grow(0, 4 * PAGE_SIZE)
    pages0, pages1 = set(a.slot_pages[0]), set(a.slot_pages[1])
    assert len(pages0) == 4 and len(pages1) == 2
    assert not (pages0 & pages1)
    a.release(0)
    a.grow(2, 4 * PAGE_SIZE)
    # released pages are reused (freelist returns slot 0's pages)
    assert set(a.slot_pages[2]) == pages0


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------

def _gpt(seed=0, max_seq_len=512):
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=max_seq_len)
    return GPT.init(cfg, key=jax.random.PRNGKey(seed))


def test_paged_engine_matches_dense_engine():
    """Same model, same requests: the paged engine produces the dense
    engine's transcripts (greedy), while holding far fewer cache rows."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = _gpt(3)

    def run(**kw):
        eng = ContinuousBatchingEngine(model, max_slots=4, **kw)
        for i in range(6):
            eng.submit(Request(prompt=[1 + i, 2, 3], max_new_tokens=5))
        fin = eng.run_to_completion()
        return eng, sorted(tuple(r.generated) for r in fin)

    _, dense = run()
    eng, paged = run(paged=True)
    assert dense == paged
    st = eng.stats
    assert st["pages_in_use"] == 0          # all slots released at the end
    assert st["pages_total"] >= 4


def test_paged_engine_oversubscribed_backpressure():
    """A pool smaller than slots x max_seq_len still serves everything:
    admissions wait for pages instead of failing."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = _gpt(4)
    # 4 slots x 512 max_seq_len = 16 pages fully provisioned; give 6 (+null)
    eng = ContinuousBatchingEngine(model, max_slots=4, paged=True, n_pages=7)
    for i in range(8):
        eng.submit(Request(prompt=[1 + i] * 100, max_new_tokens=40))
    fin = eng.run_to_completion()
    assert len(fin) == 8
    assert all(len(r.generated) == 40 and r.error is None for r in fin)


def test_paged_engine_rejects_never_fitting_prompt():
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = _gpt(5, max_seq_len=256)        # pages_per_slot = 2
    eng = ContinuousBatchingEngine(model, max_slots=2, paged=True)
    # prompt needs 2 pages (fits); max_new pushes past the slot's table —
    # submit validation (book) rejects via max_seq_len first
    with pytest.raises(ValueError):
        eng.submit(Request(prompt=[1] * 250, max_new_tokens=100))


def test_paged_engine_cancel_releases_pages():
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = _gpt(6)
    eng = ContinuousBatchingEngine(model, max_slots=2, paged=True)
    reqs = [Request(prompt=[1 + i] * 200, max_new_tokens=50)
            for i in range(2)]
    for r in reqs:
        eng.submit(r)
    eng.step()
    used_before = eng.stats["pages_in_use"]
    assert used_before >= 4                 # 2 slots x 2 pages (200 toks)
    assert eng.cancel(reqs[0].id)
    assert eng.stats["pages_in_use"] < used_before
    fin = eng.run_to_completion()
    by_id = {r.id: r for r in fin}
    assert by_id[reqs[0].id].cancelled
    assert len(by_id[reqs[1].id].generated) == 50


def test_paged_write_prompt_batch_matches_per_slot():
    b, h, d = 3, 2, 64
    lengths = (40, 200, 129)
    cache, k_dense, v_dense, jl = _filled_cache(b, h, d, lengths)
    from qgemm_tpu.serving.paged_cache import (init_paged_cache,
                                               paged_write_prompt_batch)
    # rebuild an identical cache via ONE batched write (shared bucket)
    cache2 = init_paged_cache(h, d, n_pages=16, batch=b, pages_per_slot=3)
    from dataclasses import replace
    cache2 = replace(cache2, page_table=cache.page_table)
    s_max = 3 * PAGE_SIZE
    kb = jnp.asarray(k_dense)  # [B, H, S_max, D] (zeros beyond each bucket)
    vb = jnp.asarray(v_dense)
    cache2 = jax.jit(paged_write_prompt_batch)(cache2, kb, vb)
    q = jnp.asarray(RNG.normal(size=(b, h, 1, d)).astype(np.float32))
    a = paged_attention_reference(q, cache, jl)
    bq = paged_attention_reference(q, cache2, jl)
    # identical int8 contents within the valid region
    assert float(jnp.max(jnp.abs(a - bq))) < 1e-5


def test_paged_engine_under_mesh_matches_single_device():
    """Paged serving + tensor parallelism: head-sharded pools, the paged
    write+attend runs inside shard_map, transcripts match the single-device
    paged engine exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    mesh = make_mesh((2, 4), ("data", "model"))
    qm = _gpt(12, max_seq_len=512).quantize()
    qms = shard_quantized_model(qm, mesh)

    def run(model, **kw):
        eng = ContinuousBatchingEngine(model, max_slots=4, paged=True, **kw)
        for i in range(6):
            eng.submit(Request(prompt=[1 + i, 2, 3], max_new_tokens=5))
        return sorted(tuple(r.generated)
                      for r in eng.run_to_completion())

    assert run(qm) == run(qms, mesh=mesh)


def test_paged_engine_pool_too_small_errors_not_hangs():
    """A request whose worst case exceeds the WHOLE pool (but fits the
    per-slot table) must finish with .error, not backpressure forever
    (r2 review finding: the eternal requeue hung run_to_completion)."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    model = _gpt(13, max_seq_len=512)
    eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, n_pages=3)
    eng.submit(Request(prompt=[1] * 200, max_new_tokens=100))   # needs 3 > 2
    small = Request(prompt=[2, 3], max_new_tokens=4)            # needs 1
    eng.submit(small)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=200)}
    assert len(fin) == 2
    big = [r for r in fin.values() if r.id != small.id][0]
    assert big.error and "pages" in big.error
    assert len(fin[small.id].generated) == 4


def test_ragged_kernel_matches_reference():
    """The flat ragged-grid kernel (interpret mode on CPU) matches the
    gather oracle with mixed residencies, allocated-beyond-resident pages,
    and tail padding steps."""
    from qgemm_tpu.ops.pallas.paged_attention import \
        paged_decode_attention_ragged
    from qgemm_tpu.serving.paged_cache import build_step_tables

    b, h, d = 3, 2, 64
    lengths = (40, 200, 129)
    cache, _, _, jl = _filled_cache(b=b, h=h, d=d, lengths=lengths)
    # allocated counts from the same growth pattern, PLUS one extra
    # allocated-but-unfilled page for slot 1 (engine reserves worst case)
    counts = [-(-ln // PAGE_SIZE) for ln in lengths]
    counts[1] += 1
    ss, sp = build_step_tables(counts, cache.page_table.shape[1], bucket=16)
    assert len(ss) == 16                      # real steps padded to 16
    from dataclasses import replace
    cache = replace(cache, step_slot=jnp.asarray(ss),
                    step_page=jnp.asarray(sp))

    q = jnp.asarray(RNG.normal(size=(b, h, 1, d)), jnp.float32)
    ref = paged_attention_reference(q, cache, jl)
    got = paged_decode_attention_ragged(q, cache, jl)
    assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_context_kernel_matches_reference():
    """The blocked context kernel (interpret mode on CPU, f32 — exact)
    matches paged_context_attention_reference: multi-row chunks at
    per-slot offsets, GQA query groups, mixed residencies."""
    from qgemm_tpu.ops.pallas.paged_attention import (
        paged_context_attention, paged_context_vmem_ok)
    from qgemm_tpu.serving.paged_cache import \
        paged_context_attention_reference

    b, h, d, c = 3, 2, 64, 16
    lengths = (40, 200, 129)
    cache, _, _, jl = _filled_cache(b=b, h=h, d=d, lengths=lengths)
    offs = jl - c                             # rows end at each slot's tail
    for hq in (h, 2 * h):                     # MHA and GQA (g=2)
        assert paged_context_vmem_ok(h, hq // h, c, d, PAGE_SIZE)
        q = jnp.asarray(RNG.normal(size=(b, hq, c, d)), jnp.float32)
        ref = paged_context_attention_reference(q, cache, jl, offs)
        got = paged_context_attention(q, cache, jl, offs)
        assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # the model's per-slot call shape: B=1, scalar offset
    q1 = jnp.asarray(RNG.normal(size=(1, 4, c, d)), jnp.float32)
    c1 = PagedKVCache(kq=cache.kq, kc=cache.kc, vq=cache.vq, vc=cache.vc,
                      page_table=cache.page_table[1:2],
                      page_size=PAGE_SIZE)
    ref = paged_context_attention_reference(q1, c1, jl[1:2], int(offs[1]))
    got = paged_context_attention(q1, c1, jl[1:2], int(offs[1]))
    assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_context_kernel_row_tiling():
    """Chunks whose GQA-folded rows exceed the 256-row VMEM tile split
    over the row-block grid dim — both the TIGHT causal-skip regime
    (row blocks inside one GQA group, incl. the group-wrap block
    boundary) and the loose one (a block mixing groups)."""
    from qgemm_tpu.ops.pallas.paged_attention import (_ctx_row_block,
                                                      paged_context_attention)
    from qgemm_tpu.serving.paged_cache import \
        paged_context_attention_reference

    b, h, d = 2, 2, 64
    lengths = (300, 513)
    cache, _, _, jl = _filled_cache(b=b, h=h, d=d, lengths=lengths,
                                    pps=6, n_pages=16)
    for hq, c in ((2, 300),     # g=1, rows=300 -> Rb=100: tight, off-pow2
                  (4, 256),     # g=2, rows=512 -> Rb=128: group wrap at
                                #   the block-2 boundary
                  (8, 64)):     # g=4, rows=256 -> Rb=128 > C: loose bound
        rows = (hq // h) * c
        if rows > 128:
            assert _ctx_row_block(rows) < rows    # tiling engaged
        offs = jl - c
        q = jnp.asarray(RNG.normal(size=(b, hq, c, d)), jnp.float32)
        ref = paged_context_attention_reference(q, cache, jl, offs)
        got = paged_context_attention(q, cache, jl, offs)
        assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_build_step_tables():
    from qgemm_tpu.serving.paged_cache import build_step_tables
    ss, sp = build_step_tables([2, 0, 3], pages_per_slot=4, bucket=4,
                               pages_per_step=1)
    # slot 0: pages 0,1; slot 1: forced page-0 step; slot 2: pages 0,1,2
    assert ss[:6].tolist() == [0, 0, 1, 2, 2, 2]
    assert sp[:6].tolist() == [0, 1, 0, 0, 1, 2]
    assert len(ss) == 8                       # padded to bucket
    assert (np.asarray(sp[6:]) == 4).all()    # padding marked invalid
    assert (np.asarray(ss[6:]) == 2).all()
    # unrolled steps: one step per PAIR of pages
    ss, sp = build_step_tables([2, 0, 3], pages_per_slot=4, bucket=4,
                               pages_per_step=2)
    assert ss[:4].tolist() == [0, 1, 2, 2]
    assert sp[:4].tolist() == [0, 0, 0, 2]


def test_prefix_caching_shares_and_lru_reuses():
    """Automatic prefix caching: identical full prompt-prefix pages share
    physical pages across concurrent requests (refcounted), idle published
    pages survive in the LRU cache for later requests, transcripts are
    unchanged, and eviction returns pages under pool pressure."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=512)
    model = GPT.init(cfg, key=jax.random.PRNGKey(31)).quantize()
    system = list(range(1, 1 + 256))           # two full shared pages

    def run(prefix_cache):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True,
                                       prefix_cache=prefix_cache)
        reqs = [Request(prompt=system + [60 + i], max_new_tokens=3)
                for i in range(2)]
        for r in reqs:
            eng.submit(r)
        eng.step()                             # both admitted concurrently
        tables = np.asarray(eng._pt_host).copy()
        fin = {r.id: r.generated for r in eng.run_to_completion(max_steps=30)}
        return eng, tables, [fin[r.id] for r in reqs]

    eng, tables, out = run(True)
    _, _, ref = run(False)
    assert out == ref                          # transcripts identical
    # the two slots' first two logical pages are the SAME physical pages
    assert tables[0][0] == tables[1][0] and tables[0][1] == tables[1][1]
    assert eng.alloc.prefix_hits >= 2
    # both finished -> shared pages idle in the LRU cache, not freed
    assert len(eng.alloc.cached) == 2
    st = eng.stats
    assert st["prefix_cached_pages"] == 2 and st["prefix_hits"] >= 2

    # a LATER request with the same prefix reuses the cached pages
    eng.submit(Request(prompt=system + [90], max_new_tokens=3))
    eng.step()
    assert eng.alloc.prefix_hits >= 4
    assert len(eng.alloc.cached) == 0          # resurrected from the LRU
    eng.run_to_completion(max_steps=30)

    # eviction under pressure: filling the pool reclaims cached pages
    free_before = eng.alloc.n_free             # includes cached
    while eng.alloc.free or eng.alloc.cached:
        eng.alloc._take_page()
    assert not eng.alloc.prefix_map            # evicted pages unpublished


def test_prefix_cache_backpressure_accounting():
    """Regression: matched pages idle in the LRU count toward n_free but
    are consumed by acquisition — the admission check must subtract them
    or a mid-admit grow can exhaust the pool and crash the step. Setup: a
    long-runner holds 2 of 4 pages; a finished request left 1 published
    page cached + 1 free; a same-prefix request needing 3 pages must
    BACKPRESSURE (not crash), then complete when the long-runner frees."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=384)
    model = GPT.init(cfg, key=jax.random.PRNGKey(33)).quantize()
    eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, n_pages=5)

    # one full shareable page + a tail token (the page must not be the
    # LAST prompt page: the admission always recomputes the final token's
    # page and never acquires pages it will recompute — r4 semantics)
    system = list(range(1, 129))
    long_runner = Request(prompt=[90] * 200, max_new_tokens=56)   # 2 pages
    quick = Request(prompt=system + [50], max_new_tokens=2)       # 2 pages
    eng.submit(long_runner)
    eng.submit(quick)
    for _ in range(4):                          # quick finishes, C runs on
        eng.step()
    assert len(eng.alloc.cached) == 1           # published page idling

    same_prefix = Request(prompt=system + [51], max_new_tokens=200)  # 3 pages
    eng.submit(same_prefix)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=300)}
    assert fin[long_runner.id].error is None
    assert len(fin[long_runner.id].generated) == 56
    assert fin[same_prefix.id].error is None
    assert len(fin[same_prefix.id].generated) == 200
    assert eng.alloc.prefix_hits >= 1           # the prefix was reused


def test_paged_chunked_prefill_matches_unchunked():
    """r3 verdict #2: paged mode admits long prompts chunk by chunk through
    ONE compiled suffix-chunk program — transcripts match the unchunked
    paged engine, mixed prompt lengths share the executable."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    model = _gpt(44, max_seq_len=1024)
    prompts = [[(3 + i + j) % 97 for j in range(ln)]
               for i, ln in enumerate((600, 130, 300, 57))]

    def run(**kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, **kw)
        reqs = [Request(prompt=p, max_new_tokens=4) for p in prompts]
        for r in reqs:
            eng.submit(r)
        eng.run_to_completion(max_steps=100)
        return eng, [(tuple(r.generated), r.error) for r in reqs]

    eng_c, got = run(chunked_prefill=256)
    _, ref = run()
    assert all(e is None for _, e in got), got
    assert got == ref
    # the 600- and 300-token admissions (3 + 2 chunks) reused ONE program
    assert eng_c._prefill_paged_suffix._cache_size() == 1
    st = eng_c.stats
    assert st["admissions"] == 4 and "admit_p50_ms" in st


def test_paged_chunked_prefill_composes_with_prefix_cache():
    """A repeated long prompt under paged+chunked admission still skips the
    shared prefix pages: the chunk loop starts after them, transcripts
    match a no-prefix engine, and prefix_hits fire."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    model = _gpt(45)
    system = list(range(1, 1 + 256))            # two shareable pages

    def run(prefix_cache):
        eng = ContinuousBatchingEngine(model, max_slots=1, paged=True,
                                       chunked_prefill=128,
                                       prefix_cache=prefix_cache)
        outs = []
        for tail in (list(range(60, 60 + 130)), [70]):
            r = Request(prompt=system + tail, max_new_tokens=4)
            eng.submit(r)
            eng.run_to_completion(max_steps=40)
            outs.append((tuple(r.generated), r.error))
        return eng, outs

    eng, got = run(True)
    _, ref = run(False)
    assert all(e is None for _, e in got), got
    assert got == ref
    # second admission: 2 shared pages skipped, suffix [70] via one chunk
    assert eng.alloc.prefix_hits >= 2
    assert eng.stats["prefill_tokens_skipped"] == 256


def test_full_match_admission_never_rewrites_shared_pages():
    """r3 advisor (medium): a fully-matched page-aligned prompt must NOT
    rewrite shared physical pages. The admission acquires shared only the
    pages it will not recompute; the recomputed last page goes to a FRESH
    physical page, so a concurrent holder's content stays bit-identical."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    model = _gpt(41)
    eng = ContinuousBatchingEngine(model, max_slots=2, paged=True)
    system = list(range(1, 1 + 256))            # exactly two pages

    r1 = Request(prompt=system, max_new_tokens=20)
    eng.submit(r1)
    eng.step()                                  # r1 admitted + decoding
    shared = list(eng.alloc.slot_pages[0][:2])  # its two prompt pages
    kq_before = np.asarray(eng.caches[0].kq)

    r2 = Request(prompt=system, max_new_tokens=3)   # full page-aligned match
    eng.submit(r2)
    eng.step()
    t = np.asarray(eng._pt_host)
    assert t[1][0] == t[0][0]                   # page 0 shared
    assert t[1][1] != t[0][1]                   # last page recomputed fresh
    kq_after = np.asarray(eng.caches[0].kq)
    for p in shared:                            # holder's pages untouched
        np.testing.assert_array_equal(kq_before[p], kq_after[p])

    fin = {r.id: r for r in eng.run_to_completion(max_steps=60)}
    assert fin[r1.id].error is None and len(fin[r1.id].generated) == 20
    assert fin[r2.id].error is None and len(fin[r2.id].generated) == 3
    assert eng.alloc.prefix_hits >= 1


def test_prefix_cache_compute_skip_under_tp():
    """r3 verdict #1: a TP paged engine with repeated >=128-token prompts
    must SERVE matched-prefix admissions (the suffix prefill runs the
    paged chunk program under shard_map) — transcript parity with the
    single-device paged engine, prefix_hits firing, and no .error."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    mesh = make_mesh((2, 4), ("data", "model"))
    qm = _gpt(42).quantize()
    qms = shard_quantized_model(qm, mesh)
    system = list(range(1, 1 + 256))            # two full shared pages

    def run(model, **kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True, **kw)
        outs = []
        for tail in ([60, 61], [70]):
            r = Request(prompt=system + tail, max_new_tokens=4)
            eng.submit(r)
            eng.run_to_completion(max_steps=40)
            outs.append((tuple(r.generated), r.error))
        return eng, outs

    eng_tp, tp = run(qms, mesh=mesh)
    _, sd = run(qm)
    assert all(e is None for _, e in tp), tp
    assert tp == sd
    assert eng_tp.prefix_cache                  # stayed enabled under TP
    assert eng_tp.alloc.prefix_hits >= 2
    assert eng_tp.stats["prefill_tokens_skipped"] == 256


def test_prefix_cache_compute_skip():
    """The matched prefix is not just shared storage — the model runs ONLY
    on the suffix (context attention over the shared pages), and the
    transcript still matches a no-prefix-cache engine."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=512)
    model = GPT.init(cfg, key=jax.random.PRNGKey(37)).quantize()
    system = list(range(1, 1 + 256))

    def run(prefix_cache):
        eng = ContinuousBatchingEngine(model, max_slots=1, paged=True,
                                       prefix_cache=prefix_cache)
        outs = []
        for tail in ([60, 61], [70]):
            r = Request(prompt=system + tail, max_new_tokens=4)
            eng.submit(r)
            eng.run_to_completion(max_steps=30)
            outs.append(r.generated)
        return eng, outs

    eng, outs = run(True)
    _, ref = run(False)
    assert outs == ref, (outs, ref)
    # the second admission skipped the 2 shared prompt pages entirely
    assert eng.stats["prefill_tokens_skipped"] == 256
    assert eng.alloc.prefix_hits >= 2


def test_paged_chunked_tail_padding_never_overflows_table():
    """Review r4: a fixed-size tail chunk whose padding would extend past
    the slot's page-table width must fall back to the non-chunked
    admission (whose page-aligned bucket always fits) instead of
    clamp-writing padding junk over the last real prompt page."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    model = _gpt(46, max_seq_len=640)       # 5 pages per slot
    prompt = [(7 + j) % 97 for j in range(620)]

    def run(**kw):
        eng = ContinuousBatchingEngine(model, max_slots=1, paged=True, **kw)
        r = Request(prompt=prompt, max_new_tokens=8)
        eng.submit(r)
        eng.run_to_completion(max_steps=40)
        return tuple(r.generated), r.error

    # chunk = 384 -> padded extent 768 = 6 pages > 5-page table
    chunked = run(chunked_prefill=384)
    ref = run()
    assert chunked[1] is None, chunked
    assert chunked == ref


def test_paged_kernels_at_other_page_sizes():
    """Page size is a parameter (r5: engine ``page_size=``, sweep in
    scripts/bench_page_size.py): the rectangular and ragged decode kernels
    match the oracle at 64- and 256-token pages, mixed residencies."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from qgemm_tpu.serving.paged_cache import (
        PageAllocator, build_step_tables, init_paged_cache,
        paged_write_prompt, paged_attention_reference)
    from qgemm_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_ragged)

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    for ps in (64, 256):
        b, h, d, pps = 4, 4, 128, 8
        npg = 1 + b * pps
        cache = init_paged_cache(h, d, npg, b, pps, page_size=ps)
        alloc = PageAllocator(npg, b, pps)
        lens = [ps * 2 - 5, 37, ps, 3 * ps + 11]
        pt = np.zeros((b, pps), np.int32)
        for s, ln in enumerate(lens):
            for j, p in alloc.grow(s, ln, ps):
                pt[s, j] = p
        cache = replace(cache, page_table=jnp.asarray(pt))
        wp = jax.jit(paged_write_prompt)
        for s, ln in enumerate(lens):
            ext = -(-ln // ps) * ps
            kp = jax.random.normal(jax.random.fold_in(k1, s),
                                   (h, ext, d), jnp.float32)
            vp = jax.random.normal(jax.random.fold_in(k2, s),
                                   (h, ext, d), jnp.float32)
            cache = wp(cache, s, kp, vp)
        ss, sp = build_step_tables([len(p) for p in alloc.slot_pages], pps)
        rcache = replace(cache, step_slot=jnp.asarray(ss),
                         step_page=jnp.asarray(sp))
        q = jax.random.normal(k2, (b, h, 1, d), jnp.float32)
        jl = jnp.asarray(lens, jnp.int32)
        ref = paged_attention_reference(q, cache, jl)
        tol = 0.02 if jax.default_backend() != "cpu" else 2e-5
        for fn, c in ((paged_decode_attention, cache),
                      (paged_decode_attention_ragged, rcache)):
            got = fn(q, c, jl)
            assert float(jnp.max(jnp.abs(got - ref))) < tol, (ps, fn)


def test_int4_kv_pack_roundtrip():
    """quantize_kv_int4 + pack/unpack_int4_rows: values land within one int4
    quantization step; scales carry the int8 convention (q * c / 127)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qgemm_tpu.ops.kv_cache import quantize_kv_int4

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 64))
    vals, c = quantize_kv_int4(x)
    assert vals.shape == x.shape and vals.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(vals))) <= 7
    deq = vals.astype(jnp.float32) * (c / 127.0)
    step = np.asarray(jnp.max(jnp.abs(x), axis=-1, keepdims=True)) / 7.0
    assert np.all(np.abs(np.asarray(deq - x)) <= step * 0.51 + 1e-6)
    # sublane row pack/unpack roundtrip (the POOL layout)
    from qgemm_tpu.ops.kv_cache import pack_int4_rows, unpack_int4_rows
    packed = pack_int4_rows(vals, axis=1)
    assert packed.shape == (3, 4, 64)
    assert np.array_equal(np.asarray(unpack_int4_rows(packed, axis=1)),
                          np.asarray(vals))


def test_int4_kv_paged_kernels_match_reference():
    """Both paged decode kernels read int4-packed pools (in-kernel nibble
    unpack) and match the gather oracle, which unpacks after the gather —
    mixed residencies, GQA."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace
    from qgemm_tpu.serving.paged_cache import (
        PageAllocator, build_step_tables, init_paged_cache,
        paged_write_prompt, paged_attention_reference)
    from qgemm_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_ragged)

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    b, hkv, g, d, pps, ps = 4, 2, 2, 64, 6, 128
    npg = 1 + b * pps
    cache = init_paged_cache(hkv, d, npg, b, pps, page_size=ps, kv_bits=4)
    assert cache.kq.shape[2] == ps // 2      # sublane (row) packing
    alloc = PageAllocator(npg, b, pps)
    lens = [200, 37, 128, 300]
    pt = np.zeros((b, pps), np.int32)
    for s, ln in enumerate(lens):
        for j, p in alloc.grow(s, ln, ps):
            pt[s, j] = p
    cache = replace(cache, page_table=jnp.asarray(pt))
    wp = jax.jit(paged_write_prompt)
    for s, ln in enumerate(lens):
        ext = -(-ln // ps) * ps
        kp = jax.random.normal(jax.random.fold_in(k1, s), (hkv, ext, d))
        vp = jax.random.normal(jax.random.fold_in(k2, s), (hkv, ext, d))
        cache = wp(cache, s, kp, vp)
    ss, sp = build_step_tables([len(p) for p in alloc.slot_pages], pps)
    rcache = replace(cache, step_slot=jnp.asarray(ss),
                     step_page=jnp.asarray(sp))
    q = jax.random.normal(k2, (b, hkv * g, 1, d), jnp.float32)
    jl = jnp.asarray(lens, jnp.int32)
    ref = paged_attention_reference(q, cache, jl)
    tol = 0.05 if jax.default_backend() != "cpu" else 2e-5
    got_r = paged_decode_attention_ragged(q, rcache, jl)
    assert float(jnp.max(jnp.abs(got_r - ref))) < tol
    # rectangular kernel is MHA-shaped (H == pool heads)
    qm = jax.random.normal(k1, (b, hkv, 1, d), jnp.float32)
    ref_m = paged_attention_reference(qm, cache, jl)
    got_m = paged_decode_attention(qm, cache, jl)
    assert float(jnp.max(jnp.abs(got_m - ref_m))) < tol
