"""Pipeline parallelism: GPipe microbatch schedule over a ``pipe`` mesh axis.

Greenfield TPU-native component (the reference is single-GPU with no
parallelism of any kind — SURVEY.md §2 "Parallelism & distributed
communication"). Design follows the scaling-book recipe rather than any
CUDA pattern:

  * homogeneous transformer blocks are STACKED along a leading stage axis
    and that axis is sharded over ``pipe`` — each device holds
    ``n_layers / n_stages`` blocks;
  * inside ``shard_map`` a ``lax.scan`` runs the GPipe schedule: at tick t
    stage 0 injects microbatch t, every stage applies its blocks to its
    current activation, and activations rotate one stage forward via
    ``jax.lax.ppermute`` (ICI neighbour traffic only — XLA overlaps the
    permute with the next tick's compute);
  * the last stage collects finished microbatches; total ticks
    T = n_micro + n_stages - 1, bubble fraction (n_stages-1)/T.

Everything is reverse-mode differentiable (``ppermute``'s transpose is the
inverse permute), so ``jax.grad`` through ``pipeline_apply`` yields GPipe
backward for the sharded training step — no hand-written schedule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.parallel.tp_ops import shard_map


def stack_stages(blocks, n_stages: int):
    """Stack a homogeneous list of block pytrees into a single pytree with
    leading dims [n_stages, layers_per_stage, ...] (the ``pipe``-shardable
    parameter layout)."""
    n = len(blocks)
    if n % n_stages:
        raise ValueError(f"{n} layers not divisible by {n_stages} stages")
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, n // n_stages, *x.shape[1:]), stacked)


def pipeline_apply(block_fn: Callable, stage_params, x, *, mesh: Mesh,
                   axis: str = "pipe", n_microbatches: int | None = None):
    """Run ``block_fn(params_of_one_layer, x) -> x`` through all stages.

    ``stage_params``: pytree with leading dims [n_stages, layers_per_stage]
    (from :func:`stack_stages`); sharded over ``axis`` inside.
    ``x``: [B, ...] global batch, B divisible by ``n_microbatches``.
    Returns [B, ...] replicated.
    """
    n_stages = mesh.shape[axis]
    n_micro = n_microbatches or n_stages
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by {n_micro} microbatches")
    xm = x.reshape(n_micro, b // n_micro, *x.shape[1:])

    def spmd(params, xm):
        params = jax.tree_util.tree_map(lambda p: p[0], params)  # my stage
        sid = jax.lax.axis_index(axis)
        n_ticks = n_micro + n_stages - 1
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def stage_fn(x_in):
            def layer(x, p):
                return block_fn(p, x), None
            out, _ = jax.lax.scan(layer, x_in, params)
            return out

        def tick(carry, t):
            buf, outs = carry
            inject = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            x_in = jnp.where(sid == 0, inject, buf)
            y = stage_fn(x_in)
            out_t = t - (n_stages - 1)
            idx = jnp.clip(out_t, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
            valid = (sid == n_stages - 1) & (out_t >= 0)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, y, cur), idx, 0)
            buf = jax.lax.ppermute(y, axis, fwd)
            return (buf, outs), None

        buf0 = jnp.zeros(xm.shape[1:], xm.dtype)
        outs0 = jnp.zeros_like(xm)
        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(n_ticks))
        # results live on the last stage; replicate via a masked psum
        return jax.lax.psum(
            jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs)), axis)

    stage_specs = jax.tree_util.tree_map(
        lambda _: P(axis), stage_params)
    f = shard_map(spmd, mesh=mesh, in_specs=(stage_specs, P()),
                  out_specs=P(), check_rep=False)
    out = f(stage_params, xm)
    return out.reshape(b, *out.shape[2:])


def pipeline_gpt_forward(model, tokens, *, mesh: Mesh, axis: str = "pipe",
                         n_microbatches: int | None = None):
    """Full GPT forward with the block stack pipelined over ``axis``:
    embedding and the LM head run replicated (they are a tiny fraction of
    the FLOPs); the n_layers transformer blocks run on the GPipe schedule.
    """
    n_stages = mesh.shape[axis]
    stage_params = stack_stages(model.blocks, n_stages)

    def block_fn(block, x):
        return block(x)

    x = model.embed(tokens)
    x = pipeline_apply(block_fn, stage_params, x, mesh=mesh, axis=axis,
                       n_microbatches=n_microbatches)
    return model.lm_head(model.ln_f(x))
