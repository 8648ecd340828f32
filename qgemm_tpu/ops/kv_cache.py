"""int8 KV cache: absmax vector-wise quantization of the attention cache.

Beyond-reference serving capability (the reference has no KV cache at all —
SURVEY.md §2 C12 "no KV-cache"; this extends the framework's LLM.int8()
scheme to the cache): K/V rows are quantized per (batch, head, position)
with an absmax scale over the head dim on WRITE, and dequantized on READ —
one multiply that XLA fuses into the attention matmuls. Decode attention is
HBM-bound on reading the cache, so int8 halves both the cache's memory
footprint and its read bandwidth, which is the entire marginal cost of a
long context.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

QRANGE = 127.0
_EPS = 1e-12


class QuantizedKVCache(NamedTuple):
    """One layer's cache: int8 values + per-position float scales."""
    kq: jax.Array  # int8 [B, H, S, Dh]
    kc: jax.Array  # f32  [B, H, S, 1]  absmax over Dh
    vq: jax.Array  # int8 [B, H, S, Dv]
    vc: jax.Array  # f32  [B, H, S, 1]


def init_quantized_kv_cache(batch: int, n_heads: int, max_len: int,
                            d_head: int) -> QuantizedKVCache:
    z8 = lambda d: jnp.zeros((batch, n_heads, max_len, d), jnp.int8)
    # scale 1.0 keeps untouched (padding) rows decoding to exact zeros
    c = jnp.ones((batch, n_heads, max_len, 1), jnp.float32)
    return QuantizedKVCache(kq=z8(d_head), kc=c, vq=z8(d_head), vc=c)


def quantize_kv(x):
    """x [..., Dh] -> (int8 [..., Dh], f32 absmax [..., 1]); row = one
    (batch, head, position) vector, round-to-nearest."""
    c = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (QRANGE / c)),
                 -QRANGE, QRANGE).astype(jnp.int8)
    return q, c


def dequantize_kv(q, c, dtype):
    return (q.astype(jnp.float32) * (c * (1.0 / QRANGE))).astype(dtype)
