"""Optimizers. SGD is reference parity (src/modules/sgd.cuh:10-14:
t -= lr*dt over the parameter list; a parameter list on TPU is any pytree
and the update is one fused tree_map). Adam is the standard
beyond-reference training optimizer — its state is a pytree mirroring the
parameters, so it shards/checkpoints like everything else."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _none_leaf(x):
    return x is None


def sgd_step(params, grads, lr: float):
    """params - lr * grads, over arbitrary pytrees (None-safe for frozen
    leaves such as absent biases)."""
    return jax.tree_util.tree_map(
        lambda p, g: p if g is None else p - lr * g, params, grads,
        is_leaf=_none_leaf)


@dataclass
class SGD:
    lr: float = 0.01

    def step(self, params, grads):
        return sgd_step(params, grads, self.lr)


class AdamState(NamedTuple):
    """First/second-moment pytrees (same structure as the params) + step."""
    m: object
    v: object
    t: jax.Array


def adam_init(params) -> AdamState:
    z = lambda p: None if p is None else jnp.zeros_like(
        p, dtype=jnp.float32)
    return AdamState(
        m=jax.tree_util.tree_map(z, params, is_leaf=_none_leaf),
        v=jax.tree_util.tree_map(z, params, is_leaf=_none_leaf),
        t=jnp.zeros((), jnp.int32))


def adam_step(params, grads, state: AdamState, lr: float = 1e-3,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              weight_decay: float = 0.0):
    """One (decoupled-weight-decay) Adam update; returns (params, state).
    Moments are f32 regardless of the parameter dtype (bf16 moments lose
    the small-update tail)."""
    t = state.t + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)

    def upd(p, g, m, v):
        if g is None:
            return p, m, v
        g32 = g.astype(jnp.float32)
        m = b1 * m + (1 - b1) * g32
        v = b2 * v + (1 - b2) * g32 * g32
        step = lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        if weight_decay:
            step = step + lr * weight_decay * p.astype(jnp.float32)
        return (p - step.astype(p.dtype)), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params, is_leaf=_none_leaf)
    flat_g = jax.tree_util.tree_leaves(grads, is_leaf=_none_leaf)
    flat_m = jax.tree_util.tree_leaves(state.m, is_leaf=_none_leaf)
    flat_v = jax.tree_util.tree_leaves(state.v, is_leaf=_none_leaf)
    out = [upd(p, g, m, v)
           for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
    new_m = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
    new_v = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
    return new_p, AdamState(m=new_m, v=new_v, t=t)


@dataclass
class Adam:
    lr: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params) -> AdamState:
        return adam_init(params)

    def step(self, params, grads, state: AdamState):
        return adam_step(params, grads, state, lr=self.lr, b1=self.b1,
                         b2=self.b2, eps=self.eps,
                         weight_decay=self.weight_decay)
