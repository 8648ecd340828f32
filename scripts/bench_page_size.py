#!/usr/bin/env python
"""Page-size sweep for the ragged paged decode kernel, end-to-end.

r4 verdict item 6: SOL.md claimed "beating ~70% needs wider pages, which
trades against allocator granularity" — an argument, not a measurement.
This measures it: greedy decode tokens/s over the PAGED int8 cache at page
sizes 64/128/256 on a long-context serving shape (default the 6.86B
flagship at 1024-token prompts, batch 8), plus the allocator-granularity
cost each size implies (pages per request and worst-case fragmentation =
unused tail tokens per request).

The in-jit marginal-cost protocol (two generation lengths, differenced)
times the decode loop itself, tunnel-RTT-free — same as bench_serving.
Wider pages halve the scalar-prefetch grid's step count AND page-table /
prefix-hash work, but strand up to page_size-1 tokens per request tail.

Usage: python scripts/bench_page_size.py [--layers 32 --d-model 4096 ...]
       (defaults to the 6.86B config; use --layers 8 --d-model 1024 for a
       quick smoke run)
"""

import argparse
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def _paged_generate(model, prompt, n_new, caches):
    from qgemm_tpu.serving.paged_cache import paged_write_prompt_batch

    b, s_p = prompt.shape
    ps = caches[0].page_size
    bucket = -(-s_p // ps) * ps
    # the dense throwaway prefill cache rounds to the decode kernel's
    # 128-row blocks on TPU; pad the bucket so page writes line up
    bucket = max(bucket, -(-bucket // 128) * 128)
    tmp = model.init_cache(b, bucket)
    logits, tmp = model.prefill(
        jnp.pad(prompt, ((0, 0), (0, bucket - s_p))), tmp)
    caches = [paged_write_prompt_batch(pc, t[0], t[1])
              for pc, t in zip(caches, tmp)]
    tok0 = jnp.argmax(logits[:, s_p - 1, :], axis=-1)[:, None]

    def step(carry, t):
        tok, caches = carry
        logits, caches = model.decode_step(
            tok, jnp.full((b,), s_p + t, jnp.int32), caches)
        nxt = jnp.argmax(logits, axis=-1)[:, None]
        return (nxt, caches), tok[:, 0]

    (_, _), toks = jax.lax.scan(step, (tok0, caches), jnp.arange(n_new))
    return toks.T


def build_caches(model, batch, s_p, n_max, page_size):
    from qgemm_tpu.serving.paged_cache import (PageAllocator,
                                               build_step_tables,
                                               init_paged_cache)
    cfg = model.cfg
    pps = -(-(s_p + n_max) // page_size)
    # the batched prompt write covers whole 128-aligned buckets
    pps = max(pps, -(-(-(-s_p // 128) * 128) // page_size))
    npg = 1 + batch * pps
    dh = cfg.d_model // cfg.n_heads
    hkv = getattr(cfg, "n_kv_heads", 0) or cfg.n_heads
    alloc = PageAllocator(npg, batch, pps)
    pt = np.zeros((batch, pps), np.int32)
    for slot in range(batch):
        for j, p in alloc.grow(slot, s_p + n_max, page_size):
            pt[slot, j] = p
    ss, sp = build_step_tables([len(p) for p in alloc.slot_pages], pps)
    from dataclasses import replace
    caches = [replace(init_paged_cache(hkv, dh, npg, batch, pps,
                                       page_size=page_size),
                      page_table=jnp.asarray(pt), step_slot=jnp.asarray(ss),
                      step_page=jnp.asarray(sp))
              for _ in model.blocks]
    return caches, pps


def time_generate_paged(model, prompt, n, n_max, page_size, repeats=3):
    caches, _ = build_caches(model, prompt.shape[0], prompt.shape[1],
                             n_max, page_size)
    f = jax.jit(lambda m, p, c: _paged_generate(m, p, n, c).sum())
    float(f(model, prompt, caches))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(model, prompt, caches))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--d-model", type=int, default=4096)
    ap.add_argument("--d-ff", type=int, default=16384)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--n-hi", type=int, default=96)
    ap.add_argument("--n-lo", type=int, default=16)
    ap.add_argument("--page-sizes", default="64,128,256")
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig

    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, d_ff=args.d_ff,
                    n_layers=args.layers,
                    max_seq_len=args.prompt_len + args.n_hi + 8,
                    dtype="bfloat16")
    model = GPT.init_quantized(cfg, key=jax.random.PRNGKey(0))
    log(f"model: {model.num_params()/1e9:.2f}B params, paged int8 KV")
    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.prompt_len), 0, args.vocab)

    rows = []
    for ps in [int(x) for x in args.page_sizes.split(",")]:
        t_hi = time_generate_paged(model, prompt, args.n_hi, args.n_hi, ps)
        t_lo = time_generate_paged(model, prompt, args.n_lo, args.n_hi, ps)
        per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
        tps = args.batch / per_tok
        total = args.prompt_len + args.n_hi
        pages = -(-total // ps)
        frag = pages * ps - total         # stranded tail tokens/request
        rows.append({"page_size": ps, "tokens_per_sec": round(tps, 1),
                     "pages_per_request": pages,
                     "tail_fragmentation_tokens": frag})
        log(f"page={ps:4d}: {per_tok*1e3:.3f} ms/step -> {tps:,.0f} tok/s "
            f"({pages} pages/req, tail frag {frag} tok)")

    best = max(rows, key=lambda r: r["tokens_per_sec"])
    print(json.dumps({
        "metric": "paged_decode_tokens_per_sec_by_page_size",
        "value": best["tokens_per_sec"], "unit": "tokens/s",
        "best_page_size": best["page_size"], "rows": rows,
        "batch": args.batch, "prompt_len": args.prompt_len,
    }))


if __name__ == "__main__":
    main()
