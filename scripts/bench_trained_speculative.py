#!/usr/bin/env python
"""REALIZED speculative-decoding speedup on TRAINED models (r3 verdict #3:
the random-weight bench only established the break-even floor — trained
acceptance is the lever, so measure it).

Trains a target (6L d512, lr 1e-3 — the largest config that reliably
forms the induction circuit; 8L+/d1024 stall at ln(V) in this step
budget) and a small draft (2L d128) on the induction task
(examples/train_gpt_lm.train_model — the draft learns the same copy
circuit, so it AGREES with the target on the in-context-copy region), then
measures batch-1 greedy decode tokens/s for plain int8 target decode vs
speculative decode at several gamma, plus stochastic speculative sampling
(rejection-sampling verifier) at temperature 0.7. Whole runs are single
jit calls; marginal-cost differencing cancels the tunnel RTT.

Usage: python scripts/bench_trained_speculative.py [--steps 4000]
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


def rep_marginal(make_run, prompts, r_hi=48, r_lo=8, repeats=3):
    """Per-RUN device cost by repetition amplification: scan ``make_run``
    over R DISTINCT prompts inside one jit (distinct inputs defeat CSE/
    hoisting) and difference R_hi vs R_lo. These tiny trained models
    finish a whole 56-token generation in ~1-2 ms of device time — far
    under the tunnel's +-25% of ~30 ms RTT — so single-run marginal
    differencing is pure noise; amplification makes the signal tens of
    ms."""
    def total(R):
        f = jax.jit(lambda ps: jax.lax.fori_loop(
            0, R, lambda i, acc: acc + make_run(ps[i]), jnp.float32(0.0)))
        float(f(prompts))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(prompts))
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(r_hi) - total(r_lo)) / (r_hi - r_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--draft-steps", type=int, default=2000)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=64)
    ap.add_argument("--n-hi", type=int, default=56)
    ap.add_argument("--ckpt-dir", default="/tmp/qgemm_spec_ckpt",
                    help="trained target/draft cache (reruns skip training)")
    args = ap.parse_args()

    from examples.train_gpt_lm import batch_iter, train_model
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.speculative import (speculative_generate,
                                               speculative_sample)
    from qgemm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    max_len = args.seq_len + args.n_hi + 16
    tcfg = dict(d_model=512, n_heads=8, d_ff=2048, n_layers=6)
    dcfg = dict(d_model=128, n_heads=4, d_ff=512, n_layers=2)
    tstats = dstats = {"heldout_acc": -1.0}

    def get(name, cfgd, steps, lr, seed):
        path = _os.path.join(args.ckpt_dir, f"{name}.npz")
        cfg = GPTConfig(vocab_size=args.vocab, max_seq_len=max_len, **cfgd)
        if _os.path.exists(path):
            log(f"loading cached {name} from {path}")
            return load_checkpoint(
                path, GPT.init(cfg, key=jax.random.PRNGKey(seed))), None
        log(f"training {name} ({cfgd['n_layers']}L d{cfgd['d_model']}, "
            f"lr {lr})...")
        m, st = train_model(
            steps=steps, batch=16, seq_len=args.seq_len, vocab=args.vocab,
            lr=lr, max_seq_len=max_len, seed=seed, log=log, **cfgd)
        log(f"{name} held-out copy acc {st['heldout_acc']:.3f}")
        _os.makedirs(args.ckpt_dir, exist_ok=True)
        save_checkpoint(path, m)
        return m, st

    target_f, st = get("target_6l_d512", tcfg, args.steps, 1e-3, 0)
    tstats = st or tstats
    draft_f, st = get("draft_2l_d128", dcfg, args.draft_steps, 3e-3, 3)
    dstats = st or dstats

    target = target_f.quantize()          # int8 serving target
    draft = draft_f.quantize()

    # R distinct induction prompts (first half + 4 copied tokens) —
    # generation continues the copy, the region both models learned
    half = (args.seq_len + 1) // 2
    seqs = next(batch_iter(jax.random.PRNGKey(99), 48, args.seq_len,
                           args.vocab))
    prompts = seqs[:, :half + 4]
    prompt = prompts[:1]
    n = args.n_hi

    per_t = rep_marginal(
        lambda p: target.generate(p[None], n).sum().astype(jnp.float32),
        prompts) / n
    log(f"target int8 decode : {per_t*1e3:.4f} ms/tok "
        f"-> {1/per_t:,.1f} tok/s")

    gen = jax.jit(lambda m, p, nn: m.generate(p, nn), static_argnums=(2,))
    rows = []
    for gamma in (2, 4, 6, 8):
        per_s = rep_marginal(
            lambda p, g=gamma: speculative_generate(
                target, draft, p[None], n, gamma=g)
            .tokens.sum().astype(jnp.float32), prompts) / n
        res = speculative_generate(target, draft, prompt, n, gamma=gamma)
        acc = float(res.accepted) / max(1.0, float(res.drafted))
        tpr = n / max(1, int(res.rounds))
        mism = int(jnp.sum(gen(target, prompt, n)[0] != res.tokens))
        log(f"spec g={gamma}: {per_s*1e3:.4f} ms/tok -> {1/per_s:,.1f} "
            f"tok/s  acceptance {acc:.3f}  {tpr:.2f} tok/pass  "
            f"speedup {per_t/per_s:.2f}x  mismatches {mism}/{n}")
        rows.append({"gamma": gamma, "tok_s": round(1 / per_s, 1),
                     "acceptance": round(acc, 3),
                     "tok_per_pass": round(tpr, 2),
                     "speedup": round(per_t / per_s, 3),
                     "mismatches": mism})

    # stochastic verification at temperature 0.7 (rejection sampling)
    g = 6
    per_ss = rep_marginal(
        lambda p: speculative_sample(
            target, draft, p[None], jax.random.PRNGKey(0), n, gamma=g,
            temperature=0.7).tokens.sum().astype(jnp.float32), prompts) / n
    res_ss = speculative_sample(target, draft, prompt,
                                jax.random.PRNGKey(0), n, gamma=g,
                                temperature=0.7)
    acc_ss = float(res_ss.accepted) / max(1.0, float(res_ss.drafted))
    log(f"stochastic spec (T=0.7, g={g}): {per_ss*1e3:.4f} ms/tok -> "
        f"{1/per_ss:,.1f} tok/s  acceptance {acc_ss:.3f}  "
        f"speedup {per_t/per_ss:.2f}x")

    best = max(rows, key=lambda r: r["speedup"])
    print(json.dumps({
        "metric": "trained_speculative_speedup",
        "value": best["speedup"], "unit": "x",
        "target_tok_s": round(1 / per_t, 1),
        "target_heldout_acc": round(tstats["heldout_acc"], 4),
        "draft_heldout_acc": round(dstats["heldout_acc"], 4),
        "rows": rows,
        "stochastic": {"temperature": 0.7, "gamma": g,
                       "acceptance": round(acc_ss, 3),
                       "speedup": round(per_t / per_ss, 3),
                       "tok_s": round(1 / per_ss, 1)},
    }))


if __name__ == "__main__":
    main()
