"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

Greenfield TPU-native component (SURVEY.md §5 "Long-context / sequence
parallelism: absent" in the reference — its attention materializes the full
S x S score matrix on one device). Here the sequence dimension is sharded
across devices and the S x S matrix never exists anywhere:

  * Q, K, V are sharded on S; each device keeps its Q shard resident;
  * K/V shards rotate around the ring via ``jax.lax.ppermute`` (neighbour
    ICI traffic only), one hop per step, n_devices steps total;
  * each step folds the visiting K/V block into flash-style online-softmax
    accumulators (running max m, normalizer l, weighted accumulator acc),
    so per-device memory is O(S_local * d) and the K/V transfer of the next
    step overlaps with the current block's compute under XLA's latency
    hiding scheduler;
  * causal masking uses GLOBAL positions reconstructed from the ring step:
    after j hops a device holding Q shard p sees the K/V shard originally
    at ring position (p - j) mod n.

The math inside a step is the same online recurrence as the single-chip
Pallas flash kernel (ops/pallas/flash_attention.py) — this module composes
it across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.parallel.tp_ops import shard_map

_NEG_INF = -1e30


def _ring_body(q, k, v, *, axis: str, n: int, scale: float, causal: bool,
               s_local: int):
    """q,k,v local shards [B, H, S_local, D]; returns [B, H, S_local, Dv]."""
    p = jax.lax.axis_index(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    q32 = q.astype(jnp.float32) * scale
    q_pos = p * s_local + jax.lax.iota(jnp.int32, s_local)        # [S_local]

    def step(carry, j):
        k_cur, v_cur, m, l, acc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
        if causal:
            src = (p - j) % n                                # ring origin
            k_pos = src * s_local + jax.lax.iota(jnp.int32, s_local)
            mask = k_pos[None, :] <= q_pos[:, None]          # [Sq, Sk]
            s = jnp.where(mask, s, _NEG_INF)
        # the mask sentinel is a large FINITE negative, so a fully-masked
        # visiting block yields p_ij = exp(0) = 1 transiently; the first
        # block containing a real key rescales those contributions by
        # alpha = exp(-1e30 - m_real) = 0, flushing them exactly.
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p_ij = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p_ij, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkv->bhqv", p_ij,
                                       v_cur.astype(jnp.float32))
        k_next = jax.lax.ppermute(k_cur, axis, fwd)
        v_next = jax.lax.ppermute(v_cur, axis, fwd)
        return (k_next, v_next, m_new, l, acc), None

    b, h, _, dv = v.shape
    m0 = jnp.full((b, h, s_local, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_local, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_local, dv), jnp.float32)
    (_, _, _, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, acc0),
                                        jnp.arange(n))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(q, k, v, *, mesh: Mesh, axis: str = "seq",
                   causal: bool = False):
    """Sequence-sharded attention. q,k,v: [B, H, S, D] with S sharded over
    ``axis``; returns [B, H, S, Dv] sharded the same way. The global S must
    be divisible by the axis size."""
    n = mesh.shape[axis]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"seq len {s} not divisible by {n} '{axis}' devices")
    scale = 1.0 / (q.shape[-1] ** 0.5)

    f = shard_map(
        lambda q, k, v: _ring_body(q, k, v, axis=axis, n=n, scale=scale,
                                   causal=causal, s_local=s // n),
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    return f(q, k, v)
