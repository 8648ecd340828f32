#!/usr/bin/env python
"""Serving decode throughput: tokens/s for a GPT decoder, bf16 vs int8.

Measures the in-jit KV-cached decode loop (model.generate's lax.scan) at two
generation lengths and differences them, so prefill cost, dispatch overhead
and tunnel RTT cancel — the same marginal-cost protocol as
utils/profiling.bench_ms. The engine's host-side step() loop is NOT what is
timed here: through the remote-TPU tunnel every host step pays ~30 ms RTT,
which measures the tunnel, not the TPU.

Usage: python scripts/bench_serving.py [--layers N] [--d-model D] [--batch B]
"""

import argparse
import json
import sys
import time

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def time_generate(model, prompt, n, repeats=3, quantized_cache=False):
    f = jax.jit(lambda m, p: m.generate(
        p, n, quantized_cache=quantized_cache).sum())
    float(f(model, prompt))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(model, prompt))
        best = min(best, time.perf_counter() - t0)
    return best


def _paged_generate(model, prompt, n_new, caches):
    """Greedy generation over pre-allocated paged caches: dense-cache
    prefill, page writes, then the decode scan (attention routes through
    the scalar-prefetch paged kernel)."""
    from qgemm_tpu.serving.paged_cache import paged_write_prompt_batch

    b, s_p = prompt.shape
    ps = caches[0].page_size
    bucket = -(-s_p // ps) * ps
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


def time_generate_paged(model, prompt, n, n_max, repeats=3, kv_bits=8):
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                               PagedKVCache, init_paged_cache)
    import numpy as np
    cfg = model.cfg
    b, s_p = prompt.shape
    pps = -(-(s_p + n_max) // PAGE_SIZE)
    npg = 1 + b * pps
    dh = cfg.d_model // cfg.n_heads
    alloc = PageAllocator(npg, b, pps)
    pt = np.zeros((b, pps), np.int32)
    for slot in range(b):
        for j, p in alloc.grow(slot, s_p + n_max):
            pt[slot, j] = p
    ptj = jnp.asarray(pt)
    caches = [init_paged_cache(cfg.n_heads, dh, npg, b, pps,
                               kv_bits=kv_bits)
              for _ in model.blocks]
    from dataclasses import replace
    caches = [replace(c, page_table=ptj) for c in caches]

    f = jax.jit(lambda m, p, c: _paged_generate(m, p, n, c).sum())
    float(f(model, prompt, caches))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(model, prompt, caches))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--d-ff", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=0,
                    help="GQA: KV heads < query heads (0 = MHA); divides "
                         "cache HBM and decode read traffic by the group")
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--n-hi", type=int, default=128)
    ap.add_argument("--n-lo", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kv4", action="store_true",
                    help="with --paged: also time the int4-KV pool "
                         "(halves cache read bytes again over int8 — the "
                         "long-context decode stream; quality pinned in "
                         "RESULTS_QUALITY.md)")
    ap.add_argument("--paged", action="store_true",
                    help="also time the paged int8 cache path (adds a "
                         "large one-off compile: ~10 min for 24L over the "
                         "remote tunnel)")
    ap.add_argument("--int8-only", action="store_true",
                    help="skip the bf16 run and init straight into int8 "
                         "(layer-by-layer; for models whose float weights "
                         "don't fit HBM, e.g. 6.7B-class on 16 GB)")
    ap.add_argument("--outliers", action="store_true",
                    help="also time the LLM.int8() mixed-precision "
                         "decomposition path (threshold 6.0, capacity 32 "
                         "per GEMM) — the >6.7B accuracy regime")
    ap.add_argument("--w4", action="store_true",
                    help="also time W4A8 (int4 group-quantized weights — "
                         "halves weight HBM again over int8; decode is "
                         "weight-bound so this is the bandwidth headline)")
    args = ap.parse_args()

    from dataclasses import replace as _replace

    from qgemm_tpu.models.gpt import GPT, GPTConfig

    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, n_kv_heads=args.kv_heads,
                    d_ff=args.d_ff, n_layers=args.layers,
                    max_seq_len=args.prompt_len + args.n_hi + 8,
                    dtype="bfloat16")
    if args.int8_only:
        q = GPT.init_quantized(cfg, key=jax.random.PRNGKey(args.seed))
        runs = [("int8", q, False), ("int8+int8kv", q, True)]
        n_params = q.num_params()
    else:
        model = GPT.init(cfg, key=jax.random.PRNGKey(args.seed))
        n_params = model.num_params()
        q = model.quantize()
        runs = [("bf16", model, False), ("int8", q, False),
                ("int8+int8kv", q, True)]
    if args.w4:
        if args.int8_only:
            q4 = GPT.init_quantized(cfg, key=jax.random.PRNGKey(args.seed),
                                    bits=4)
        else:
            q4 = model.quantize(bits=4)
        runs.append(("w4a8+int8kv", q4, True))
    if args.outliers:
        # same int8 weights, outlier decomposition switched on (it is a
        # meta field of QuantizedLinear — no reconversion needed)
        def _with_outliers(mod):
            if hasattr(mod, "outlier_threshold"):
                return _replace(mod, outlier_threshold=6.0,
                                outlier_capacity=32)
            return mod
        qo = jax.tree_util.tree_map(
            _with_outliers, q,
            is_leaf=lambda m: hasattr(m, "outlier_threshold"))
        runs.append(("int8+outliers", qo, True))
    log(f"model: {n_params/1e9:.2f}B params, {args.layers}L x "
        f"d{args.d_model}, batch {args.batch}")

    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.prompt_len), 0, args.vocab)

    results = {}
    for name, m, qkv in runs:
        t_hi = time_generate(m, prompt, args.n_hi, quantized_cache=qkv)
        t_lo = time_generate(m, prompt, args.n_lo, quantized_cache=qkv)
        per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
        tps = args.batch / per_tok
        results[name] = tps
        log(f"{name}: {per_tok*1e3:.3f} ms/step -> {tps:,.0f} tokens/s "
            f"(batch {args.batch})")

    if args.paged:
        # paged int8 cache (scalar-prefetch kernel over block tables)
        t_hi = time_generate_paged(q, prompt, args.n_hi, args.n_hi)
        t_lo = time_generate_paged(q, prompt, args.n_lo, args.n_hi)
        per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
        results["int8+paged"] = args.batch / per_tok
        log(f"int8+paged: {per_tok*1e3:.3f} ms/step -> "
            f"{results['int8+paged']:,.0f} tokens/s (batch {args.batch})")
        if args.kv4:
            t_hi = time_generate_paged(q, prompt, args.n_hi, args.n_hi,
                                       kv_bits=4)
            t_lo = time_generate_paged(q, prompt, args.n_lo, args.n_hi,
                                       kv_bits=4)
            per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
            results["int8+paged_kv4"] = args.batch / per_tok
            log(f"int8+paged int4-KV: {per_tok*1e3:.3f} ms/step -> "
                f"{results['int8+paged_kv4']:,.0f} tokens/s "
                f"(batch {args.batch})")

    best = max(results, key=results.get)
    out = {
        "metric": "gpt_decode_tokens_per_sec_int8",
        "value": round(results["int8"], 1),
        "unit": "tokens/s",
        "params_b": round(n_params / 1e9, 2),
        "batch": args.batch,
        "best_config": best,
        "best_tokens_per_sec": round(results[best], 1),
    }
    if "int8+int8kv" in results:
        out["int8kv_tokens_per_sec"] = round(results["int8+int8kv"], 1)
    if "bf16" in results:
        out["int8_vs_bf16"] = round(results["int8"] / results["bf16"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
