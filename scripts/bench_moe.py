#!/usr/bin/env python
"""MoE serving decode throughput vs a dense model at iso-ACTIVE params.

r4 verdict item 1: the expert-parallel MoE family had correctness tests
but zero performance evidence. This measures engine-decode tokens/s for a
top-2-of-8 MoE GPT whose ACTIVE FFN params per token equal the dense 1.41B
row's (2 experts x d_ff 4096 == dense d_ff 8192), int8 weights, batch 8 —
the same marginal-cost in-jit generate protocol as bench_serving.py.

Reading the result: decode is WEIGHT-STREAM-bound, and a batch of 8 top-2
tokens routes into essentially every expert, so the MoE step streams the
TOTAL expert weights (8 x 4096 = 4x the dense row's FFN bytes) regardless
of per-token compute. MoE tok/s therefore lands near a dense model of the
same TOTAL size, not the same active size — the MoE win is quality per
active FLOP, not decode speed. The analytic weight-stream roofline for
both models is printed next to the measurement so that statement is data.

Usage: python scripts/bench_moe.py [--layers 24] [--d-model 2048] ...
"""

import argparse
import json
import sys

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

from bench_serving import log, time_generate  # noqa: E402  (same protocol)


def weight_bytes_int8(model) -> int:
    """Total int8 weight + f32 scale/embed bytes the decode step streams."""
    return sum(int(l.size) * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(model)
               if hasattr(l, "size"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--d-ff-expert", type=int, default=4096)
    ap.add_argument("--n-experts", type=int, default=8)
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=50272)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--n-hi", type=int, default=128)
    ap.add_argument("--n-lo", type=int, default=16)
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig

    d_ff_active = args.top_k * args.d_ff_expert
    base = dict(vocab_size=args.vocab, d_model=args.d_model,
                n_heads=args.heads, n_layers=args.layers,
                max_seq_len=args.prompt_len + args.n_hi + 8,
                dtype="bfloat16")
    moe_cfg = GPTConfig(d_ff=args.d_ff_expert, n_experts=args.n_experts,
                        moe_top_k=args.top_k, **base)
    dense_cfg = GPTConfig(d_ff=d_ff_active, **base)

    prompt = jax.random.randint(jax.random.PRNGKey(1),
                                (args.batch, args.prompt_len), 0, args.vocab)

    results = {}
    for name, cfg in (("dense_iso_active", dense_cfg), ("moe", moe_cfg)):
        m = GPT.init_quantized(cfg, key=jax.random.PRNGKey(0))
        total = m.num_params()
        wbytes = weight_bytes_int8(m)
        roof_tps = args.batch / (wbytes / 819e9)
        for tag, qkv in ((name, False), (name + "+int8kv", True)):
            t_hi = time_generate(m, prompt, args.n_hi, quantized_cache=qkv)
            t_lo = time_generate(m, prompt, args.n_lo, quantized_cache=qkv)
            per_tok = (t_hi - t_lo) / (args.n_hi - args.n_lo)
            results[tag] = args.batch / per_tok
            log(f"{tag}: {per_tok*1e3:.3f} ms/step -> "
                f"{results[tag]:,.0f} tok/s (batch {args.batch}, "
                f"{total/1e9:.2f}B total params, weight-stream roofline "
                f"{roof_tps:,.0f} tok/s -> "
                f"{100*results[tag]/roof_tps:.0f}%)")
        results[name + "_roofline_tps"] = roof_tps
        results[name + "_params_b"] = total / 1e9
        del m

    out = {
        "metric": "moe_decode_tokens_per_sec_int8kv",
        "value": round(results["moe+int8kv"], 1),
        "unit": "tokens/s", "batch": args.batch,
        "dense_iso_active_int8kv": round(results["dense_iso_active+int8kv"],
                                         1),
        "moe_vs_dense_iso_active": round(
            results["moe+int8kv"] / results["dense_iso_active+int8kv"], 3),
        "moe_params_b": round(results["moe_params_b"], 2),
        "dense_params_b": round(results["dense_iso_active_params_b"], 2),
        "moe_pct_weight_stream_roofline": round(
            100 * results["moe+int8kv"] / results["moe_roofline_tps"], 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
