#!/usr/bin/env python
"""Stochastic-verification machinery cost at SERVING vocab.

r4 verdict item 4 evidence: the stochastic tier's cost relative to greedy
speculation. The trained-toy comparison (bench_trained_speculative) runs
at vocab 64 where the warp pipeline is trivially cheap and the gap is
launch-bound scheduling, so it cannot see the r5 optimization (sorted-
space scalar q(x)/p(x); full warped distributions only at the single
rejection position — engine.spec_accept docstring). This measures the
greedy-vs-stochastic gap where the warp actually costs: a 50k vocab,
batch-1, acceptance-1 SELF-draft (machinery isolation — same protocol as
the stacking-table ceilings, labeled as such).

Usage: python scripts/bench_stochastic_verify.py [--layers 8 ...]
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


def _force(r):
    return float(sum(jnp.sum(l).astype(jnp.float32)
                     for l in jax.tree_util.tree_leaves(r)))


def timed(fn, *args, repeats=3):
    _force(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--n-hi", type=int, default=192)
    ap.add_argument("--n-lo", type=int, default=32)
    ap.add_argument("--gamma", type=int, default=6)
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.speculative import (speculative_generate,
                                               speculative_sample)

    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, d_ff=args.d_ff,
                    n_layers=args.layers,
                    max_seq_len=args.prompt_len + args.n_hi + args.gamma + 8,
                    dtype="bfloat16")
    target = GPT.init_quantized(cfg, key=jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (1, args.prompt_len), 0, args.vocab)
    g = args.gamma

    def marginal(fn):
        hi = timed(fn, args.n_hi)
        lo = timed(fn, args.n_lo)
        return (hi - lo) / (args.n_hi - args.n_lo)

    # self-draft: acceptance 1 by construction -> pure machinery cost
    per_g = marginal(lambda n: speculative_generate(
        target, target, prompt, n, gamma=g))
    log(f"greedy self-spec  (g={g}): {per_g*1e3:.3f} ms/tok -> "
        f"{1/per_g:,.1f} tok/s")
    # temperature-only (filters statically off): the r5 sort-free fast
    # path — the warp is softmax(logits/T), zero argsorts per round
    per_t = marginal(lambda n: speculative_sample(
        target, target, prompt, jax.random.PRNGKey(2), n, gamma=g,
        temperature=0.7))
    log(f"stoch self-spec T=0.7 (no filters): {per_t*1e3:.3f} ms/tok -> "
        f"{1/per_t:,.1f} tok/s  ({per_t/per_g:.2f}x greedy)")
    # nucleus on: the draft's gamma+1 sampling sorts are irreducible
    per_s = marginal(lambda n: speculative_sample(
        target, target, prompt, jax.random.PRNGKey(2), n, gamma=g,
        temperature=0.7, top_p=0.95))
    log(f"stoch self-spec T=0.7 top_p=.95: {per_s*1e3:.3f} ms/tok -> "
        f"{1/per_s:,.1f} tok/s  ({per_s/per_g:.2f}x greedy)")
    ratio = per_t / per_g
    log(f"stochastic / greedy cost ratio (no filters): {ratio:.3f} "
        f"(1.0 = free exact sampled-distribution semantics)")

    print(json.dumps({
        "metric": "stochastic_vs_greedy_spec_cost_ratio",
        "value": round(ratio, 4), "unit": "x",
        "vocab": args.vocab, "gamma": g,
        "greedy_tok_s": round(1 / per_g, 1),
        "stochastic_tok_s": round(1 / per_t, 1),
        "nucleus_tok_s": round(1 / per_s, 1),
        "nucleus_cost_ratio": round(per_s / per_g, 4),
    }))


if __name__ == "__main__":
    main()
