#!/usr/bin/env python
"""Flash-attention kernel throughput vs the XLA dense composition.

Effective TFLOP/s = 4*B*H*Sq*Sk*D flops (2 matmuls; causal counts the same
flops for comparability — the kernel skips ~half the work, so causal
'effective' rates can exceed the MXU peak)."""
import argparse
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qgemm_tpu.models.attention import scaled_dot_product_attention
from qgemm_tpu.ops.pallas.flash_attention import _flash_attention_fwd_impl
from qgemm_tpu.utils.profiling import bench_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dhead", type=int, default=128)
    ap.add_argument("--seqs", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    b, h, d = args.batch, args.heads, args.dhead
    dt = jnp.dtype(args.dtype)

    for s in args.seqs:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(s), 3)
        q = jax.random.normal(k1, (b, h, s, d), dt)
        k = jax.random.normal(k2, (b, h, s, d), dt)
        v = jax.random.normal(k3, (b, h, s, d), dt)
        tf = 4 * b * h * s * s * d / 1e12
        for causal in (False, True):
            row = [f"S={s:5d} causal={int(causal)}"]
            fl = jax.jit(lambda q, k, v, c=causal:
                         _flash_attention_fwd_impl(q, k, v, c))
            ms = bench_ms(fl, q, k, v, iters=300, base=20)
            row.append(f"flash {ms:7.3f} ms {tf/ms*1e3:6.1f} TF/s")
            if s <= 4096:
                xl = jax.jit(lambda q, k, v, c=causal:
                             scaled_dot_product_attention(q, k, v, causal=c))
                ms2 = bench_ms(xl, q, k, v, iters=100, base=10)
                row.append(f"| xla {ms2:7.3f} ms {tf/ms2*1e3:6.1f} TF/s "
                           f"| {ms2/ms:4.2f}x")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
