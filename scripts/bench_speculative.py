#!/usr/bin/env python
"""Quantization self-speculation throughput: the target model drafts for
itself via its own W4A8 copy (no second model, no training).

Measures batch-1 greedy decode tokens/s — the latency-bound regime where
speculative decoding pays — for (a) plain target decode, (b) plain W4A8
decode (the draft alone: fast but int4-accuracy), (c) speculative decode
(EXACT target transcripts at draft-ish speed when acceptance is high).
Whole runs are single jit calls (the spec loop is one lax.while_loop), so
tunnel RTT cancels in the two-length differencing.

Usage: python scripts/bench_speculative.py [--layers 24] [--gamma 4] ...
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
    """Scalar readback — block_until_ready is unreliable over the remote
    tunnel (see utils/profiling.py); a sum readback is the fence."""
    return float(sum(jnp.sum(l).astype(jnp.float32)
                     for l in jax.tree_util.tree_leaves(r)))


def timed(fn, *args, repeats=3):
    r = fn(*args)
    _force(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--d-ff", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--n-hi", type=int, default=192)
    ap.add_argument("--n-lo", type=int, default=32)
    ap.add_argument("--gamma", type=int, default=4)
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.speculative import speculative_generate

    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, d_ff=args.d_ff,
                    n_layers=args.layers,
                    max_seq_len=args.prompt_len + args.n_hi + args.gamma + 8,
                    dtype="bfloat16")
    model = GPT.init(cfg, key=jax.random.PRNGKey(0))
    target = model.quantize()                 # int8 serving target
    draft = model.quantize(bits=4)            # its W4A8 self-draft
    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (1, args.prompt_len), 0, args.vocab)

    def marginal(fn):
        t_hi, r = timed(fn, args.n_hi)
        t_lo, _ = timed(fn, args.n_lo)
        return (t_hi - t_lo) / (args.n_hi - args.n_lo), r

    gen = jax.jit(lambda m, p, n: m.generate(p, n), static_argnums=(2,))
    per_t, _ = marginal(lambda n: gen(target, prompt, n))
    log(f"target int8 decode : {per_t*1e3:.3f} ms/tok -> {1/per_t:,.1f} tok/s")
    per_d, _ = marginal(lambda n: gen(draft, prompt, n))
    log(f"draft  w4a8 decode : {per_d*1e3:.3f} ms/tok -> {1/per_d:,.1f} tok/s")

    per_s, res = marginal(lambda n: speculative_generate(
        target, draft, prompt, n, gamma=args.gamma))
    acc = float(res.accepted) / max(1, float(res.drafted))
    tokens_per_round = args.n_hi / max(1, int(res.rounds))
    log(f"speculative (g={args.gamma}): {per_s*1e3:.3f} ms/tok -> "
        f"{1/per_s:,.1f} tok/s  (acceptance {acc:.2f}, "
        f"{tokens_per_round:.2f} tok/target-pass)")
    # NB on acceptance: RANDOM weights put greedy logits in near-ties, so
    # the int4 draft flips argmax far more often than on a trained model
    # (whose peaked logits the draft agrees with) — this acceptance is a
    # pessimistic floor for the machinery, not a model-quality number.

    # mechanical ceiling: the target drafting for itself (acceptance 1)
    per_self, res_self = marginal(lambda n: speculative_generate(
        target, target, prompt, n, gamma=args.gamma))
    log(f"self-draft ceiling : {per_self*1e3:.3f} ms/tok -> "
        f"{1/per_self:,.1f} tok/s ({args.n_hi / int(res_self.rounds):.2f} "
        "tok/target-pass)")

    # small independent draft (the configuration that pays on TRAINED
    # models): measure the per-round cost and the break-even acceptance.
    # On random weights the draft agrees ~never, so tokens/round ~ 1 and
    # the interesting number is the measured round cost: speculation wins
    # once E[tokens/round] (set by acceptance on a real model) exceeds
    # round_cost / target_step.
    scfg = GPTConfig(vocab_size=args.vocab, d_model=512, n_heads=8,
                     d_ff=2048, n_layers=4,
                     max_seq_len=cfg.max_seq_len, dtype="bfloat16")
    sdraft = GPT.init(scfg, key=jax.random.PRNGKey(9)).quantize()
    per_sd, res_sd = marginal(lambda n: speculative_generate(
        target, sdraft, prompt, n, gamma=args.gamma))
    tpr = args.n_hi / max(1, int(res_sd.rounds))
    round_ms = per_sd * tpr * 1e3
    breakeven = round_ms / (per_t * 1e3)
    log(f"small-draft (4L d512, g={args.gamma}): round {round_ms:.2f} ms "
        f"-> breaks even at {breakeven:.2f} tok/target-pass "
        f"(max {args.gamma + 1}; random-weight acceptance "
        f"{float(res_sd.accepted) / max(1, float(res_sd.drafted)):.2f} "
        "gives ~1 — trained-model acceptance is the lever)")

    # transcript fidelity (bf16 chunk-vs-step rounding can flip near-ties)
    ref = gen(target, prompt, args.n_lo)
    spec = speculative_generate(target, draft, prompt, args.n_lo,
                                gamma=args.gamma)
    mismatches = int(jnp.sum(ref[0] != spec.tokens))
    log(f"transcript mismatches vs target greedy: {mismatches}/{args.n_lo} "
        "(0 in f32; bf16 near-tie rounding between the chunk verifier and "
        "single-step decode)")

    print(json.dumps({
        "metric": "speculative_decode_tokens_per_sec",
        "value": round(1 / per_s, 1), "unit": "tokens/s",
        "target_tokens_per_sec": round(1 / per_t, 1),
        "speedup_vs_target": round(per_t / per_s, 3),
        "self_draft_speedup": round(per_t / per_self, 3),
        "acceptance": round(acc, 3), "gamma": args.gamma,
        "mismatches": mismatches,
        "small_draft_round_ms": round(round_ms, 3),
        "small_draft_breakeven_tokens_per_round": round(breakeven, 2),
    }))


if __name__ == "__main__":
    main()
