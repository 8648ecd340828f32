"""Ulysses-style sequence parallelism: all-to-all head/sequence exchange.

Second sequence-parallel flavor alongside ring attention (SURVEY §5 lists
both as absent from the reference — greenfield TPU components). Where ring
attention keeps heads whole and circulates K/V blocks around the ICI ring
(O(S/p) memory, p permute steps), Ulysses does TWO all-to-alls: activations
arrive sequence-sharded [B, H, S/p, D], an all-to-all re-shards them to
head-sharded [B, H/p, S, D] so every device runs ordinary FULL-sequence
attention for its head group (here: the flash kernel on TPU), and a second
all-to-all restores sequence sharding. Preferable when p <= H and the
per-device full-S attention fits: exactly 2 collectives regardless of p
(vs p-1 ppermute steps), and the local attention is a single dense kernel.

Differentiable end-to-end (all_to_all transposes to all_to_all).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.parallel.tp_ops import shard_map


def _local_attention(q, k, v, causal: bool):
    from qgemm_tpu.models.attention import scaled_dot_product_attention
    if jax.default_backend() != "cpu" and q.shape[-2] >= 128:
        from qgemm_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v, causal)
    return scaled_dot_product_attention(q, k, v, causal=causal)


def ulysses_attention(q, k, v, *, mesh: Mesh, axis: str = "seq",
                      causal: bool = False):
    """q, k, v: [B, H, S, D] with S sharded over ``axis``; returns
    [B, H, S, Dv] sharded the same way. Requires H divisible by the axis
    size (heads are exchanged for sequence in the all-to-all)."""
    n = mesh.shape[axis]
    _, h, s, _ = q.shape
    if h % n:
        raise ValueError(f"n_heads {h} not divisible by {n} '{axis}' devices")
    if s % n:
        raise ValueError(f"seq len {s} not divisible by {n} '{axis}' devices")

    def body(q, k, v):
        # local [B, H, S/p, D] -> [B, H/p, S, D]: split heads across
        # devices, gather the full sequence (axis 1 scattered, axis 2
        # concatenated)
        a2a = lambda x: jax.lax.all_to_all(x, axis, split_axis=1,
                                           concat_axis=2, tiled=True)
        out = _local_attention(a2a(q), a2a(k), a2a(v), causal)
        # inverse: [B, H/p, S, D] -> [B, H, S/p, D]
        return jax.lax.all_to_all(out, axis, split_axis=2, concat_axis=1,
                                  tiled=True)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, None, axis, None),) * 3,
                  out_specs=P(None, None, axis, None), check_rep=False)
    return f(q, k, v)
