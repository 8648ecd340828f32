#!/usr/bin/env python
"""Continuous-batching GPT serving demo.

Stands up an int8-quantized decoder (random weights — the reference's demos
are random-weight too, src/transformer.cu:171-172), submits a stream of
requests with mixed prompt/generation lengths, and drives the engine to
completion, reporting slot occupancy and throughput. The host-side
bookkeeping runs in the native C++ scheduler when built (make -C csrc).

Usage: python examples/serve_gpt.py [--layers N] [--requests R] [--slots K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# a sitecustomize boot hook may pre-import jax and pin a remote platform
# before env vars are read — honor JAX_PLATFORMS explicitly so
# `JAX_PLATFORMS=cpu python examples/serve_gpt.py --tp 8` works with the
# virtual CPU mesh (tests/conftest.py does the same)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--max-seq-len", type=int, default=256)
    ap.add_argument("--scheduler", default="auto",
                    choices=["auto", "python", "native"])
    ap.add_argument("--no-quantize", action="store_true")
    ap.add_argument("--w4", action="store_true",
                    help="W4A8: int4 group-quantized weights (halves "
                         "weight HBM over int8)")
    ap.add_argument("--kv-heads", type=int, default=0,
                    help="GQA: KV heads < query heads (0 = MHA) — divides "
                         "KV-cache HBM and decode read traffic")
    ap.add_argument("--paged", action="store_true",
                    help="paged int8 KV cache: HBM scales with committed "
                         "request maxima, not slots x max-seq-len")
    ap.add_argument("--n-pages", type=int, default=0,
                    help="page-pool size (0 = full provisioning)")
    ap.add_argument("--chunked", type=int, default=0,
                    help="chunked prefill size (0 = off): long prompts "
                         "admit chunk-by-chunk through one compiled "
                         "program (dense AND paged modes)")
    ap.add_argument("--multi-step", type=int, default=0,
                    help="decode K steps per dispatch when the queue is "
                         "empty (amortizes per-token host round trips)")
    ap.add_argument("--draft-layers", type=int, default=0,
                    help="speculative decoding: stand up a draft of this "
                         "many layers (d_model/4) proposing --spec-gamma "
                         "tokens per round; stacks with --multi-step "
                         "(K rounds per dispatch)")
    ap.add_argument("--spec-gamma", type=int, default=4)
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel ways (BASELINE config 5): shard "
                         "the int8 model over a (1, tp) mesh — needs >= tp "
                         "devices (a pod slice, or the virtual CPU mesh via "
                         "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_"
                         "platform_device_count=N)")
    args = ap.parse_args()

    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, n_kv_heads=args.kv_heads,
                    d_ff=4 * args.d_model,
                    n_layers=args.layers, max_seq_len=args.max_seq_len)
    model = GPT.init(cfg, key=jax.random.PRNGKey(args.seed))
    mesh = None
    if not args.no_quantize:
        model = model.quantize(bits=4 if args.w4 else 8)
    if args.tp > 1:
        if args.no_quantize:
            raise SystemExit("--tp drives the int8 shard_map kernels; "
                             "drop --no-quantize")
        from qgemm_tpu.parallel.mesh import make_mesh
        from qgemm_tpu.parallel.sharding import shard_quantized_model
        if len(jax.devices()) < args.tp:
            raise SystemExit(f"--tp {args.tp} needs {args.tp} devices, "
                             f"have {len(jax.devices())}")
        mesh = make_mesh((1, args.tp), ("data", "model"),
                         devices=jax.devices()[:args.tp])
        model = shard_quantized_model(model, mesh)
    draft = None
    if args.draft_layers:
        dcfg = GPTConfig(vocab_size=args.vocab,
                         d_model=max(64, args.d_model // 4),
                         n_heads=max(1, args.heads // 2),
                         d_ff=args.d_model,
                         n_layers=args.draft_layers,
                         max_seq_len=args.max_seq_len)
        draft = GPT.init(dcfg, key=jax.random.PRNGKey(args.seed + 1))
        if not args.no_quantize:
            draft = draft.quantize()
        if mesh is not None:
            from qgemm_tpu.parallel.sharding import shard_quantized_model
            draft = shard_quantized_model(draft, mesh)
    engine = ContinuousBatchingEngine(model, max_slots=args.slots,
                                      scheduler=args.scheduler, mesh=mesh,
                                      paged=args.paged,
                                      n_pages=args.n_pages or None,
                                      chunked_prefill=args.chunked or None,
                                      multi_step=args.multi_step,
                                      draft_model=draft,
                                      spec_gamma=args.spec_gamma)
    print(f"model: {model.num_params()/1e6:.1f}M params "
          f"({'bf16/f32' if args.no_quantize else 'int8'}); "
          f"scheduler: {engine.scheduler}; slots: {args.slots}"
          + (f"; TP={args.tp}" if mesh is not None else ""))

    rng = np.random.default_rng(args.seed)
    for i in range(args.requests):
        plen = int(rng.integers(2, 8))  # one pow2 bucket -> one prefill compile
        engine.submit(Request(
            prompt=[int(t) for t in rng.integers(0, args.vocab, plen)],
            max_new_tokens=int(rng.integers(4, 32))))

    t0 = time.time()
    occupancy = []
    while engine.book.num_waiting or engine.book.num_active:
        engine.step()
        occupancy.append(engine.book.num_active)
    dt = time.time() - t0

    fin = engine.finished
    n_toks = sum(len(r.generated) for r in fin)
    st = engine.stats
    print(f"served {len(fin)} requests, {n_toks} tokens in {dt:.2f}s "
          f"({n_toks/dt:,.0f} tok/s host-stepped), {engine.steps} steps, "
          f"mean occupancy {np.mean(occupancy):.2f}/{args.slots}")
    print(f"engine stats: {st['tokens_generated']} tokens, "
          f"{st['tokens_per_s']:,.0f} tok/s engine-counted "
          f"(wall {st['wall_s']}s)")
    for r in fin[:4]:
        print(f"  req {r.id}: prompt[{len(r.prompt)}] -> "
              f"{len(r.generated)} tokens: {r.generated[:8]}...")
    assert all(r.done for r in fin) and len(fin) == args.requests


if __name__ == "__main__":
    main()
