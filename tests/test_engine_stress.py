"""Randomized engine stress: mixed modes, churn, cancellation, invariants.

Seeded fuzz over the composition surface the targeted tests pin pairwise:
paged + prefix caching + chunked admission + speculation + multi-step +
mixed sampling + stop tokens + mid-flight cancels, all at once. The
assertions are INVARIANTS (every request reaches a terminal state, slot
and page accounting returns to empty, transcripts respect their limits),
not transcripts — the pairwise parity tests own exactness."""

import jax
import numpy as np
import pytest

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

CFG = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64, n_layers=2,
                max_seq_len=384)


@pytest.mark.parametrize("seed,kw", [
    (0, dict(paged=True)),
    (1, dict(paged=True, chunked_prefill=128, multi_step=3)),
    (2, dict(paged=True, spec=True, multi_step=2)),
    (3, dict(spec=True, quantized_cache=True)),
    (4, dict(scheduler="native", paged=True, spec=True, multi_step=2)),
    (5, dict(scheduler="native", chunked_prefill=128)),
    # r5 tiers: over-commit preemption under churn (tiny pages force real
    # pool pressure), overlapped chunked admission, int4-KV pools, and
    # the native scheduler driving overcommit + overlap together
    (6, dict(paged=True, overcommit=True, page_size=32, n_pages=16)),
    (7, dict(paged=True, chunked_prefill=64, overlap_admission=True,
             page_size=64)),
    (8, dict(paged=True, kv_bits=4, spec=True, multi_step=2)),
    (9, dict(scheduler="native", paged=True, overcommit=True,
             overlap_admission=True, chunked_prefill=64, page_size=32,
             n_pages=20)),
])
def test_engine_stress_invariants(seed, kw):
    if kw.get("scheduler") == "native":
        from qgemm_tpu.serving import native
        if not native.available():
            pytest.skip("libqgemm_sched.so not built")
    kw = dict(kw)
    model = GPT.init(CFG, key=jax.random.PRNGKey(40 + seed))
    if kw.pop("spec", False):
        kw["draft_model"] = GPT.init(CFG, key=jax.random.PRNGKey(90 + seed))
        kw["spec_gamma"] = 3
    eng = ContinuousBatchingEngine(model, max_slots=3, **kw)
    rng = np.random.default_rng(seed)

    shared = [1 + int(t) for t in rng.integers(0, 90, 140)]
    reqs = []
    for i in range(14):
        kind = rng.integers(0, 4)
        if kind == 0:       # short greedy
            prompt = [1 + int(t) for t in rng.integers(0, 90,
                                                       rng.integers(1, 6))]
        elif kind == 1:     # long (chunked-admission territory)
            prompt = [1 + int(t) for t in rng.integers(0, 90,
                                                       rng.integers(129, 200))]
        elif kind == 2:     # shared prefix (prefix-cache territory)
            prompt = shared + [int(rng.integers(1, 90))]
        else:               # sampled
            prompt = [1 + int(t) for t in rng.integers(0, 90, 3)]
        r = Request(prompt=prompt,
                    max_new_tokens=int(rng.integers(1, 12)),
                    temperature=float(rng.choice([0.0, 0.0, 0.9])),
                    stop_tokens=[int(rng.integers(1, 90))]
                    if rng.random() < 0.3 else None,
                    logprobs=bool(rng.random() < 0.3))
        reqs.append(r)

    # staggered submission with mid-flight cancels
    cancelled = set()
    for i, r in enumerate(reqs):
        eng.submit(r)
        if i % 3 == 2:
            for _ in range(int(rng.integers(1, 4))):
                eng.step()
        if rng.random() < 0.2:
            victim = reqs[int(rng.integers(0, i + 1))]
            if eng.cancel(victim.id):
                cancelled.add(victim.id)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=2000)}

    # invariants
    assert len(fin) == len(reqs), (len(fin), len(reqs))
    for r in reqs:
        f = fin[r.id]
        assert f.done or f.cancelled, f
        assert f.error is None, (f.id, f.error)
        assert len(f.generated) <= r.max_new_tokens
        if not f.cancelled and r.stop_tokens is None:
            assert len(f.generated) == r.max_new_tokens, \
                (f.id, len(f.generated), r.max_new_tokens)
        if r.stop_tokens and not f.cancelled and f.generated \
                and len(f.generated) < r.max_new_tokens:
            assert f.generated[-1] in r.stop_tokens
        if r.logprobs and not f.cancelled:
            assert len(f.token_logprobs) == len(f.generated)
    assert eng.book.num_active == 0 and eng.book.num_waiting == 0
    if eng.paged:
        # every page back in the pool (idle prefix-published pages sit in
        # the LRU but COUNT as free — acquisition consumes them)
        assert eng.alloc.n_free == eng.caches[0].n_pages - 1, \
            (eng.alloc.n_free, eng.caches[0].n_pages)


@pytest.mark.parametrize("seed,kw", [
    (0, dict(paged=True, multi_step=3)),
    (1, dict(spec=True, quantized_cache=True)),
    (2, dict(paged=True, spec=True, multi_step=2)),
])
def test_seq2seq_stress_invariants(seed, kw):
    from qgemm_tpu.models.transformer import Transformer, TransformerConfig
    from qgemm_tpu.serving.seq2seq import Seq2SeqEngine

    cfg = TransformerConfig(vocab_size=89, d_model=32, n_heads=4, d_ff=64,
                            n_layers=2, max_seq_len=64)
    kw = dict(kw)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(50 + seed))
    if kw.pop("spec", False):
        kw["draft_model"] = Transformer.init(
            cfg, key=jax.random.PRNGKey(70 + seed))
        kw["spec_gamma"] = 3
    eng = Seq2SeqEngine(model, max_slots=3, max_new_tokens=24, **kw)
    rng = np.random.default_rng(seed)

    reqs = []
    for i in range(10):
        src = [1 + int(t) for t in rng.integers(0, 80,
                                                rng.integers(1, 12))]
        r = Request(prompt=src,
                    max_new_tokens=int(rng.integers(1, 10)),
                    temperature=float(rng.choice([0.0, 0.0, 1.0])),
                    stop_tokens=[int(rng.integers(1, 80))]
                    if rng.random() < 0.3 else None,
                    logprobs=bool(rng.random() < 0.3))
        reqs.append(r)

    for i, r in enumerate(reqs):
        eng.submit(r)
        if i % 3 == 2:
            for _ in range(int(rng.integers(1, 3))):
                eng.step()
        if rng.random() < 0.2:
            eng.cancel(reqs[int(rng.integers(0, i + 1))].id)
    fin = {r.id: r for r in eng.run_to_completion(max_steps=2000)}

    assert len(fin) == len(reqs)
    for r in reqs:
        f = fin[r.id]
        assert f.done or f.cancelled, f
        assert f.error is None, (f.id, f.error)
        assert len(f.generated) <= r.max_new_tokens
        if not f.cancelled and r.stop_tokens is None:
            assert len(f.generated) == r.max_new_tokens
        if r.logprobs and not f.cancelled:
            assert len(f.token_logprobs) == len(f.generated)
    assert eng.book.num_active == 0 and eng.book.num_waiting == 0
    if eng.paged:
        assert eng.alloc.n_free == eng.caches[0].n_pages - 1
