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


# ---------------------------------------------------------------- int4 KV
# Weights already go int4 (W4A8); the cache — the decode READ stream at
# long context — can too: per-position absmax over the head dim at range
# +-7, two values packed per byte. Halves cache bytes again over int8 and
# composes with GQA's 1/g. Scale convention: the stored scale is
# PRE-SCALED by QRANGE/QRANGE4, so every reader keeps the int8 math
# ``value * scale / QRANGE`` unchanged — only writers and the unpack know
# about nibbles (r4 verdict item 8).

QRANGE4 = 7.0


def quantize_kv_int4(x):
    """x [..., D] (D even) -> (packed int8 [..., D//2], f32 scale
    [..., 1] in the POOL'S int8 convention — see module note). Nibble
    layout: element d of [0, D/2) in the LOW nibble of byte d, element
    d + D/2 in the HIGH nibble (unpack = two arithmetic shifts + concat,
    no interleave shuffle — same layout family as ops/pallas/w4a8)."""
    d = x.shape[-1]
    c = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (QRANGE4 / c)),
                 -QRANGE4, QRANGE4).astype(jnp.int32)
    lo, hi = q[..., :d // 2], q[..., d // 2:]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return packed, c * (QRANGE / QRANGE4)


def unpack_int4_kv(packed):
    """packed int8 [..., D//2] -> int8 [..., D] nibble values in [-7, 7]
    (inverse of ``quantize_kv_int4``'s layout)."""
    p = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)     # sign-extended
    hi = jnp.right_shift(p, 4)                          # arithmetic
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
