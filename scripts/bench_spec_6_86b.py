#!/usr/bin/env python
"""W4A8 quantization self-speculation at the 6.86B flagship (the LLM.int8()
regime, /root/reference/README.md:26 — models >6.7B params).

r4 verdict item 2: the trained speculative measurement lived on a 19M toy
where decode is launch-bound; this measures speculation where it matters —
the weight-streaming-bound 6.86B target the whole repo serves. Draft =
``target.quantize(bits=4)`` (serving/speculative.py:22-27 no-training
path): the int4 copy streams ~half the weight bytes per step, and the
verify chunk scores gamma+1 positions in ONE target weight stream, so the
round cost is ~((gamma+1)/2 + 1) target-step-equivalents against
(accepted+1) tokens produced.

Both models are built from the SAME random weights in one block-by-block
pass (peak HBM = int8 model + int4 model + ONE float block, ~10.5 GB on a
16 GB chip; embeddings and layernorms are SHARED pytree leaves, not
copies). Acceptance is therefore the REAL int4-vs-int8 greedy agreement of
identically-initialized weights — not a self-draft identity. On random
weights greedy logits sit in near-ties, so this acceptance is a floor; on
a trained checkpoint the int4 copy agrees far more often (int8 vs W4A8 KL
on the trained 6L model: RESULTS_QUALITY.md).

Whole generations are single jit calls (speculative_generate is one
lax.while_loop), timed by two-length differencing so tunnel RTT cancels.

Usage: python scripts/bench_spec_6_86b.py [--layers 32] [--d-model 4096]
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
    r = fn(*args)
    _force(r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, r


def init_dual_quantized(cfg, key):
    """Build the int8 target AND its int4 self-draft from the same random
    weights, block by block (float weights freed per block — the
    GPT.init_quantized discipline, gpt.py:146, applied twice per block).
    Embedding / final LN are shared leaves between the two pytrees."""
    from qgemm_tpu.models.embedding import Embedding
    from qgemm_tpu.models.gpt import GPT, GPTBlock
    from qgemm_tpu.models.linear import Linear
    from qgemm_tpu.models.transformer import LayerNorm

    keys = iter(jax.random.split(key, cfg.n_layers + 2))
    d = cfg.jdtype
    embed = Embedding.init(next(keys), cfg.vocab_size, cfg.d_model,
                           cfg.max_seq_len, d)
    blocks8, blocks4 = [], []
    for i in range(cfg.n_layers):
        blk = GPTBlock.init(next(keys), cfg)
        q8 = blk.quantize()
        q4 = blk.quantize(bits=4)
        jax.block_until_ready(jax.tree_util.tree_leaves((q8, q4)))
        del blk
        blocks8.append(q8)
        blocks4.append(q4)
        log(f"  block {i + 1}/{cfg.n_layers} quantized (int8 + int4)")
    head = Linear.init(next(keys), cfg.d_model, cfg.vocab_size, bias=False,
                       dtype=d)
    h8, h4 = head.quantize(), head.quantize(bits=4)
    jax.block_until_ready(jax.tree_util.tree_leaves((h8, h4)))
    del head
    ln_f = LayerNorm.init(cfg.d_model, d)
    t = GPT(embed=embed, blocks=blocks8, ln_f=ln_f, lm_head=h8, cfg=cfg)
    dr = GPT(embed=embed, blocks=blocks4, ln_f=ln_f, lm_head=h4, cfg=cfg)
    return t, dr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--d-model", type=int, default=4096)
    ap.add_argument("--d-ff", type=int, default=16384)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--n-hi", type=int, default=128)
    ap.add_argument("--n-lo", type=int, default=32)
    ap.add_argument("--gammas", default="2,4,6")
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.speculative import speculative_generate

    gammas = [int(g) for g in args.gammas.split(",")]
    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, d_ff=args.d_ff,
                    n_layers=args.layers,
                    max_seq_len=args.prompt_len + args.n_hi
                    + max(gammas) + 8,
                    dtype="bfloat16")
    log("building int8 target + int4 self-draft (shared weights)...")
    target, draft = init_dual_quantized(cfg, jax.random.PRNGKey(0))
    n_params = target.num_params()
    log(f"target: {n_params / 1e9:.2f}B params")
    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (1, args.prompt_len), 0, args.vocab)

    def marginal(fn):
        t_hi, r = timed(fn, args.n_hi)
        t_lo, _ = timed(fn, args.n_lo)
        return (t_hi - t_lo) / (args.n_hi - args.n_lo), r

    gen = jax.jit(lambda m, p, n: m.generate(p, n), static_argnums=(2,))
    per_t, _ = marginal(lambda n: gen(target, prompt, n))
    log(f"target int8 decode : {per_t*1e3:.3f} ms/tok -> "
        f"{1/per_t:,.1f} tok/s")
    per_d, _ = marginal(lambda n: gen(draft, prompt, n))
    log(f"draft  w4a8 decode : {per_d*1e3:.3f} ms/tok -> "
        f"{1/per_d:,.1f} tok/s (cost ratio {per_d/per_t:.2f})")

    rows = []
    best = (per_t, 0)
    for g in gammas:
        per_s, res = marginal(lambda n, g=g: speculative_generate(
            target, draft, prompt, n, gamma=g))
        acc = float(res.accepted) / max(1, float(res.drafted))
        tpr = args.n_hi / max(1, int(res.rounds))
        rows.append({"gamma": g, "tokens_per_sec": round(1 / per_s, 1),
                     "acceptance": round(acc, 3),
                     "tok_per_target_pass": round(tpr, 2),
                     "speedup_vs_plain": round(per_t / per_s, 3)})
        log(f"spec g={g}: {1/per_s:,.1f} tok/s  acceptance {acc:.3f}  "
            f"{tpr:.2f} tok/pass  {per_t/per_s:.2f}x plain")
        if per_s < best[0]:
            best = (per_s, g)

    # transcript fidelity at the best gamma
    ref = gen(target, prompt, args.n_lo)
    spec = speculative_generate(target, draft, prompt, args.n_lo,
                                gamma=best[1] or gammas[0])
    mism = int(jnp.sum(ref[0] != spec.tokens))
    log(f"transcript mismatches vs target greedy: {mism}/{args.n_lo}")

    print(json.dumps({
        "metric": "w4a8_selfspec_6_86b_tokens_per_sec",
        "value": round(1 / best[0], 1), "unit": "tokens/s",
        "params_b": round(n_params / 1e9, 2),
        "plain_int8_tokens_per_sec": round(1 / per_t, 1),
        "draft_cost_ratio": round(per_d / per_t, 3),
        "best_gamma": best[1], "gamma_sweep": rows,
        "transcript_mismatches": mism,
    }))


if __name__ == "__main__":
    main()
