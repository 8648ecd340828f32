#!/usr/bin/env python
"""Quick A/B tile benchmark for the fused quantized matmul kernel."""
import sys
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from qgemm_tpu.ops.pallas.quantized_matmul import _qmm_call, col_quantize_pallas
from qgemm_tpu.utils.profiling import bench_ms

M = N = K = 2048
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.uniform(k1, (M, K), jnp.float32, minval=-1, maxval=1)
w = jax.random.uniform(k2, (K, N), jnp.float32, minval=-1, maxval=1)
wq, cw = col_quantize_pallas(w)
cx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12)
gflop = 2 * M * N * K / 1e9

import functools
for bm, bn, bk in [(1024, 2048, 512), (512, 2048, 2048), (1024, 2048, 2048),
                   (512, 2048, 512), (256, 2048, 2048), (512, 1024, 2048),
                   (1024, 1024, 2048), (2048, 1024, 2048), (2048, 2048, 512)]:
    try:
        f = jax.jit(functools.partial(_qmm_call, rounding="nearest",
                                      bm=bm, bn=bn, bk=bk))
        ms = bench_ms(f, x, wq, cx, cw, iters=800, base=50)
        print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}: {ms:.4f} ms  {gflop/ms:.1f} TF/s")
    except Exception as e:
        print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}: FAIL {type(e).__name__}: {e}",
              file=sys.stderr)
