"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

Greenfield TPU-native component (SURVEY.md §5 "Long-context / sequence
parallelism: absent" in the reference — its attention materializes the full
S x S score matrix on one device). Here the sequence dimension is sharded
across devices and the S x S matrix never exists anywhere:

  * Q, K, V are sharded on S; each device keeps its Q shard resident;
  * K/V shards rotate around the ring via ``jax.lax.ppermute`` (neighbour
    ICI traffic only), one hop per step, n_devices steps total;
  * each visiting block runs the single-chip FLASH kernel
    (ops/pallas/flash_attention.py; interpret mode on CPU), so the local
    math is bf16 MXU dots and no [S_local, S_local] score block ever
    reaches HBM (the r2 version ran an f32 einsum per block — correct, but
    f32 MXU rate and an S_local^2 f32 intermediate); blocks merge by the
    standard logsumexp composition;
  * causal masking picks the block's regime from its ring origin: after j
    hops a device holding Q shard p sees the K/V shard originally at ring
    position (p - j) mod n — src == p is the causal diagonal block,
    src < p fully visible, src > p contributes nothing;
  * the BACKWARD is a second ring pass: dK/dV accumulators co-rotate with
    their K/V blocks (each device adds its block-local FlashAttention-2
    gradients computed against the saved GLOBAL logsumexp, so per-block
    grads are exactly the global-softmax blockwise grads), and after n
    hops every dK/dV shard is back home carrying the full sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.parallel.tp_ops import shard_map

_NEG_INF = -1e30


def _causal_regime(p, j, n):
    """0 = fully visible, 1 = diagonal (causal), 2 = strictly future."""
    src = (p - j) % n
    return (src == p).astype(jnp.int32) + 2 * (src > p).astype(jnp.int32)


def _ring_fwd_scan(q, k, v, *, axis: str, n: int, causal: bool):
    """Local shards [B, H, S_local, D] -> (out [B, H, S_local, Dv],
    global lse [B, H, S_local])."""
    from qgemm_tpu.ops.pallas.flash_attention import _flash_attention_fwd_impl

    p = jax.lax.axis_index(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    b, h, sl, _ = q.shape
    dv = v.shape[-1]

    def step(carry, j):
        k_cur, v_cur, m, l, acc = carry
        if causal:
            out_j, lse_j = jax.lax.switch(_causal_regime(p, j, n), [
                lambda: _flash_attention_fwd_impl(q, k_cur, v_cur, False),
                lambda: _flash_attention_fwd_impl(q, k_cur, v_cur, True),
                lambda: (jnp.zeros((b, h, sl, dv), q.dtype),
                         jnp.full((b, h, sl), _NEG_INF, jnp.float32)),
            ])
        else:
            out_j, lse_j = _flash_attention_fwd_impl(q, k_cur, v_cur, False)
        # merge: m' = max(m, lse_j); acc/l rescale by exp(m - m')
        m_new = jnp.maximum(m, lse_j)
        alpha = jnp.exp(m - m_new)[..., None]
        w = jnp.exp(lse_j - m_new)[..., None]
        acc = acc * alpha + out_j.astype(jnp.float32) * w
        l = l * alpha + w
        k_next = jax.lax.ppermute(k_cur, axis, fwd)
        v_next = jax.lax.ppermute(v_cur, axis, fwd)
        return (k_next, v_next, m_new, l, acc), None

    m0 = jnp.full((b, h, sl), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, sl, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sl, dv), jnp.float32)
    (_, _, m, l, acc), _ = jax.lax.scan(step, (k, v, m0, l0, acc0),
                                        jnp.arange(n))
    lse = m + jnp.log(jnp.maximum(l[..., 0], 1e-30))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ring_local(q, k, v, axis: str, n: int, causal: bool):
    out, _ = _ring_fwd_scan(q, k, v, axis=axis, n=n, causal=causal)
    return out


def _ring_local_fwd(q, k, v, axis, n, causal):
    out, lse = _ring_fwd_scan(q, k, v, axis=axis, n=n, causal=causal)
    return out, (q, k, v, out, lse)


def _ring_local_bwd(axis, n, causal, res, g):
    """Second ring pass: per visiting block, the blockwise FA-2 backward
    kernels with the GLOBAL lse give that block's exact dQ/dK/dV
    contributions; dK/dV accumulators co-rotate with their blocks and are
    home (fully summed) after n hops."""
    from qgemm_tpu.ops.pallas.flash_attention import _flash_attention_bwd_impl

    q, k, v, out, lse = res
    p = jax.lax.axis_index(axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, j):
        k_cur, v_cur, dk_cur, dv_cur, dq = carry
        if causal:
            dq_j, dk_j, dv_j = jax.lax.switch(_causal_regime(p, j, n), [
                lambda: _flash_attention_bwd_impl(
                    q, k_cur, v_cur, out, lse, g, False),
                lambda: _flash_attention_bwd_impl(
                    q, k_cur, v_cur, out, lse, g, True),
                lambda: (jnp.zeros_like(q), jnp.zeros_like(k_cur),
                         jnp.zeros_like(v_cur)),
            ])
        else:
            dq_j, dk_j, dv_j = _flash_attention_bwd_impl(
                q, k_cur, v_cur, out, lse, g, False)
        dq = dq + dq_j.astype(jnp.float32)
        dk_cur = dk_cur + dk_j.astype(jnp.float32)
        dv_cur = dv_cur + dv_j.astype(jnp.float32)
        rot = lambda x: jax.lax.ppermute(x, axis, fwd)
        return (rot(k_cur), rot(v_cur), rot(dk_cur), rot(dv_cur), dq), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (_, _, dk, dv, dq), _ = jax.lax.scan(step, (k, v, dk0, dv0, dq0),
                                         jnp.arange(n))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring_local.defvjp(_ring_local_fwd, _ring_local_bwd)


def ring_attention(q, k, v, *, mesh: Mesh, axis: str = "seq",
                   causal: bool = False):
    """Sequence-sharded attention. q,k,v: [B, H, S, D] with S sharded over
    ``axis``; returns [B, H, S, Dv] sharded the same way. Differentiable
    (blockwise ring backward). The global S must be divisible by the axis
    size."""
    n = mesh.shape[axis]
    s = q.shape[2]
    if s % n:
        raise ValueError(f"seq len {s} not divisible by {n} '{axis}' devices")

    f = shard_map(
        lambda q, k, v: _ring_local(q, k, v, axis, n, causal),
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3,
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )
    return f(q, k, v)
