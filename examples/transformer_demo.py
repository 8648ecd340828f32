#!/usr/bin/env python
"""Encoder-decoder transformer inference demo.

The reference's src/transformer.cu main (:170-185) runs a random-weight
encoder+decoder once at seq=6, d_model=8, 4 heads, 2 blocks and prints the
activations. This demo does that *and* what the reference left as TODO
(:182): embeddings, a logits head, and greedy KV-cache generation — with
every GEMM optionally routed through the fused int8 Pallas kernels.

Usage:
  python examples/transformer_demo.py                      # tiny ref config
  python examples/transformer_demo.py --preset serving     # realistic size
  python examples/transformer_demo.py --quantized --bench  # int8 + tok/s
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qgemm_tpu.models.transformer import Transformer, TransformerConfig

PRESETS = {
    # the reference demo's dims (transformer.cu:171-178), with a real vocab
    "reference": TransformerConfig(vocab_size=256, d_model=8, n_heads=4,
                                   d_ff=8, n_layers=2, max_seq_len=64),
    "small": TransformerConfig(vocab_size=8192, d_model=256, n_heads=8,
                               d_ff=1024, n_layers=4, max_seq_len=256),
    "serving": TransformerConfig(vocab_size=32000, d_model=1024, n_heads=16,
                                 d_ff=4096, n_layers=8, max_seq_len=512),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=PRESETS, default="reference")
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--src-len", type=int, default=6)  # reference seq=6
    ap.add_argument("--new-tokens", type=int, default=16)
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    cfg = PRESETS[args.preset]
    print(f"config: {cfg}", file=sys.stderr)

    model = Transformer.init(cfg, key=jax.random.PRNGKey(args.seed))
    if args.quantized:
        model = model.quantize()
        print("weights quantized to int8 (absmax per-column)", file=sys.stderr)

    key = jax.random.PRNGKey(args.seed + 1)
    src = jax.random.randint(key, (args.batch, args.src_len), 0, cfg.vocab_size)

    gen = jax.jit(lambda m, s: m.generate(s, args.new_tokens))
    t0 = time.time()
    tokens = gen(model, src)
    tokens.block_until_ready()
    compile_s = time.time() - t0
    print(f"generated tokens (greedy, KV-cache):\n{tokens}")
    print(f"first call (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    if args.bench:
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            tokens = gen(model, src)
        tokens.block_until_ready()
        dt = time.time() - t0
        toks = args.batch * args.new_tokens * iters
        print(f"throughput: {toks / dt:.1f} tokens/s "
              f"({dt / iters * 1e3:.1f} ms per {args.new_tokens}-token decode)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
