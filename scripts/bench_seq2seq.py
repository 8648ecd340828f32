#!/usr/bin/env python
"""Encoder-decoder decode throughput: tokens/s, float vs int8 decoder
cache (BASELINE config 4 with the GPT family's serving machinery).

Marginal-cost protocol as bench_serving.py: jit model.generate at two
generation lengths and difference, so encode cost, dispatch overhead and
tunnel RTT cancel.

Usage: python scripts/bench_seq2seq.py [--layers N] [--d-model D] ...
"""

import argparse
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def time_generate(model, src, n, quantized_cache, repeats=3):
    f = jax.jit(lambda m, s: m.generate(
        s, n, quantized_cache=quantized_cache).sum())
    float(f(model, src))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(model, src))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--d-ff", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--src-len", type=int, default=64)
    ap.add_argument("--n-hi", type=int, default=128)
    ap.add_argument("--n-lo", type=int, default=16)
    args = ap.parse_args()

    from qgemm_tpu.models.transformer import Transformer, TransformerConfig
    cfg = TransformerConfig(vocab_size=args.vocab, d_model=args.d_model,
                            n_heads=args.heads, d_ff=args.d_ff,
                            n_layers=args.layers,
                            max_seq_len=max(args.src_len, args.n_hi) + 8,
                            dtype="bfloat16")
    model = Transformer.init(cfg, key=jax.random.PRNGKey(0))
    n_params = sum(int(l.size) for l in jax.tree_util.tree_leaves(model)
                   if hasattr(l, "size"))
    q = model.quantize()
    src = jax.random.randint(jax.random.PRNGKey(1),
                             (args.batch, args.src_len), 0, args.vocab)
    log(f"enc-dec model: {n_params/1e9:.2f}B params, {args.layers}L enc + "
        f"{args.layers}L dec, batch {args.batch}")

    results = {}
    for name, m, qkv in (("bf16", model, False), ("int8", q, False),
                         ("int8+int8kv", q, True)):
        t_hi = time_generate(m, src, args.n_hi, qkv)
        t_lo = time_generate(m, src, args.n_lo, qkv)
        per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
        results[name] = args.batch / per_tok
        log(f"{name}: {per_tok*1e3:.3f} ms/step -> {results[name]:,.0f} "
            f"tokens/s (batch {args.batch})")

    # paged decoder self-cache (the Seq2SeqEngine paged tier): the same
    # decode-step program the engine jits, scanned so tunnel RTT cancels.
    # Slots sit mid-generation (2 pages resident) with worst-case tables
    # preallocated — the engine's steady state.
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, init_paged_cache,
                                               paged_write_prompt_batch)
    pos0 = PAGE_SIZE + 8
    pps = -(-(pos0 + args.n_hi + 8) // PAGE_SIZE)
    hkv = args.heads
    dh = args.d_model // args.heads
    npg = 1 + args.batch * pps
    pt = jnp.arange(1, npg).reshape(args.batch, pps)
    caches = []
    for _ in range(args.layers):
        c = init_paged_cache(hkv, dh, npg, args.batch, pps)
        from dataclasses import replace
        c = replace(c, page_table=pt)
        k0 = jax.random.normal(jax.random.PRNGKey(3),
                               (args.batch, hkv, pps * PAGE_SIZE, dh),
                               jnp.bfloat16)
        caches.append(paged_write_prompt_batch(c, k0, k0))
    enc_kvs = [q.dec_blocks[0].cross_attn.precompute_kv(
        jax.random.normal(jax.random.PRNGKey(4),
                          (args.batch, args.src_len, args.d_model),
                          jnp.bfloat16)) for _ in range(args.layers)]

    def paged_steps(n):
        def step(carry, t):
            tok, caches = carry
            logits, caches = q.decode_logits(tok, pos0 + t, enc_kvs, caches)
            return (jnp.argmax(logits, -1)[:, None], caches), ()

        f = jax.jit(lambda tok, caches: jax.lax.scan(
            step, (tok, caches), jnp.arange(n))[0][0].sum())
        tok0 = jnp.ones((args.batch, 1), jnp.int32)
        float(f(tok0, caches))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(tok0, caches))
            best = min(best, time.perf_counter() - t0)
        return best

    per_tok_paged = (paged_steps(args.n_hi) - paged_steps(args.n_lo)) \
        / (args.n_hi - args.n_lo)
    results["int8+paged"] = args.batch / per_tok_paged
    log(f"int8+paged: {per_tok_paged*1e3:.3f} ms/step -> "
        f"{results['int8+paged']:,.0f} tokens/s (batch {args.batch})")

    print(json.dumps({
        "metric": "seq2seq_decode_tokens_per_sec_int8kv",
        "value": round(results["int8+int8kv"], 1),
        "unit": "tokens/s", "params_b": round(n_params / 1e9, 2),
        "batch": args.batch,
        "int8_vs_bf16": round(results["int8"] / results["bf16"], 3),
        "int8kv_vs_bf16": round(results["int8+int8kv"] / results["bf16"], 3),
        "paged_vs_bf16": round(results["int8+paged"] / results["bf16"], 3),
        "paged_tokens_per_sec": round(results["int8+paged"], 1),
    }))


if __name__ == "__main__":
    main()
