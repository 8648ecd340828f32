#!/usr/bin/env python
"""Micro-bench the dynamic-path W column quantization step."""
import functools
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from qgemm_tpu.ops.pallas.quantized_matmul import col_quantize_pallas
from qgemm_tpu.utils.profiling import bench_ms

K = N = 2048
w = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.float32,
                       minval=-1, maxval=1)


@jax.jit
def xla_col_quantize(w):
    c = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12)
    q = jnp.clip(jnp.round(w * (127.0 / c)), -127, 127).astype(jnp.int8)
    return q, c


for bn in ():
    f = jax.jit(functools.partial(col_quantize_pallas, block_n=bn))
    ms = bench_ms(f, w, iters=2000, base=100)
    print(f"pallas col_quantize bn={bn:5d}: {ms*1e3:.1f} us")
ms = bench_ms(xla_col_quantize, w, iters=2000, base=100)
print(f"xla col_quantize           : {ms*1e3:.1f} us")
