"""Mixture-of-Experts feed-forward with int8 expert weights.

Greenfield capability (no reference counterpart — the reference is a
single-GPU dense project, SURVEY.md §2 "Parallelism ... absent"): a
GShard/Switch-style top-k routed MoE designed TPU-first:

  * static capacity + one-hot einsum dispatch — no dynamic shapes, the whole
    layer is one jit-compatible XLA program; dispatch/combine einsums map to
    MXU matmuls;
  * experts live in ONE stacked [E, ...] tensor so the expert axis can be
    sharded over a mesh (`parallel/expert.py` runs it under shard_map with an
    explicit psum combine — real expert parallelism);
  * `quantize()` produces per-expert LLM.int8() absmax vector-wise weights
    (same scheme as ops/quantize.py, extended to the batched expert dim),
    with activations quantized per (expert, slot) row at dispatch time.

Tokens over capacity are dropped (standard Switch semantics); the residual
connection around the FFN carries them through unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from qgemm_tpu.ops.quantize import QRANGE, _EPS
from qgemm_tpu.utils.prng import uniform_init


def _capacity(n_tokens: int, n_experts: int, top_k: int,
              capacity_factor: float) -> int:
    c = int(capacity_factor * n_tokens * top_k / n_experts) + 1
    return max(8, -(-c // 8) * 8)  # multiple of 8 for TPU-friendly layouts


def route(x, router_w, top_k: int, capacity: int):
    """Top-k routing with static capacity.

    x [T, d], router_w [d, E] -> (dispatch [T, E, C] in {0,1},
    combine [T, E, C] prob-weighted). Position within an expert is assigned
    k-major (all first-choice assignments get capacity before any second
    choice), the GShard priority rule.
    """
    t, _ = x.shape
    e = router_w.shape[1]
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                      # [T, E]
    topv, topi = jax.lax.top_k(probs, top_k)                     # [T, k]
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)          # renormalize

    oh = jax.nn.one_hot(topi, e, dtype=jnp.float32)              # [T, k, E]
    # k-major flatten so first choices win capacity
    oh_flat = oh.transpose(1, 0, 2).reshape(top_k * t, e)
    pos = jnp.cumsum(oh_flat, axis=0) - 1.0                      # [k*T, E]
    keep = (pos < capacity) * oh_flat
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                            dtype=jnp.float32)                   # [k*T, E, C]
    disp_flat = pos_oh * keep[..., None]
    gates = topv.transpose(1, 0).reshape(top_k * t)              # [k*T]
    comb_flat = disp_flat * gates[:, None, None]

    dispatch = disp_flat.reshape(top_k, t, e, capacity).sum(0)
    combine = comb_flat.reshape(top_k, t, e, capacity).sum(0)
    return dispatch, combine


def load_balancing_loss(x, router_w):
    """Switch-Transformer auxiliary load-balancing loss (§2.2, eq. 4-6):
    ``E * sum_e f_e * P_e`` where f_e is the fraction of tokens whose TOP-1
    choice is expert e and P_e the mean router probability mass on e.
    Minimized (value 1.0) at a uniform assignment; add
    ``alpha * load_balancing_loss`` (alpha ~ 1e-2) to the training loss or
    routing collapses onto a few experts and static capacity drops the
    rest. x [..., d] (same input the layer is called with)."""
    xf = x.reshape(-1, x.shape[-1])
    logits = jnp.dot(xf.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                       # [T, E]
    e = router_w.shape[1]
    top1 = jnp.argmax(probs, axis=-1)
    f = jnp.mean(jax.nn.one_hot(top1, e, dtype=jnp.float32), axis=0)
    p = jnp.mean(probs, axis=0)
    return e * jnp.sum(f * p)


def expert_ffn(expert_in, w_up, w_down):
    """Dense per-expert FFN. expert_in [E, C, d]; w_up [E, d, f];
    w_down [E, f, d] -> [E, C, d]."""
    h = jnp.einsum("ecd,edf->ecf", expert_in, w_up,
                   preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0)
    return jnp.einsum("ecf,efd->ecd", h.astype(w_down.dtype), w_down,
                      preferred_element_type=jnp.float32)


class QuantizedExpertWeight(NamedTuple):
    """Per-expert int8 weights + per-(expert, output-column) absmax scales —
    the batched-expert extension of ops/quantize.QuantizedWeight."""
    q: jax.Array  # int8 [E, in, out]
    c: jax.Array  # f32  [E, 1, out]


def quantize_expert_weights(w) -> QuantizedExpertWeight:
    c = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1,
                            keepdims=True), _EPS)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) * (QRANGE / c)),
                 -QRANGE, QRANGE).astype(jnp.int8)
    return QuantizedExpertWeight(q=q, c=c)


def _row_quantize(x):
    """x [..., d] -> (int8, f32 absmax [..., 1]) per trailing row."""
    c = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (QRANGE / c)),
                 -QRANGE, QRANGE).astype(jnp.int8)
    return q, c


def quantized_expert_ffn(expert_in, w_up: QuantizedExpertWeight,
                         w_down: QuantizedExpertWeight):
    """int8 per-expert FFN: activations quantized per (expert, slot) row,
    int8 x int8 -> int32 batched matmuls on the MXU, absmax dequant."""
    inv_r2 = 1.0 / (QRANGE * QRANGE)
    xq, cx = _row_quantize(expert_in)
    acc = jnp.einsum("ecd,edf->ecf", xq, w_up.q,
                     preferred_element_type=jnp.int32)
    h = acc.astype(jnp.float32) * (cx * w_up.c) * inv_r2
    h = jnp.maximum(h, 0.0)
    hq, ch = _row_quantize(h)
    acc2 = jnp.einsum("ecf,efd->ecd", hq, w_down.q,
                      preferred_element_type=jnp.int32)
    return acc2.astype(jnp.float32) * (ch * w_down.c) * inv_r2


@partial(jax.tree_util.register_dataclass,
         data_fields=("router_w", "w_up", "w_down"),
         meta_fields=("n_experts", "top_k", "capacity_factor"))
@dataclass
class MoEFeedForward:
    """Drop-in replacement for FeedForward (same ``__call__``/``quantize``
    interface) with E routed experts. Weights may be float arrays or
    QuantizedExpertWeight (after ``quantize()``)."""

    router_w: jax.Array  # [d, E]
    w_up: object         # [E, d, f] | QuantizedExpertWeight
    w_down: object       # [E, f, d] | QuantizedExpertWeight
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25

    @classmethod
    def init(cls, key, d_model: int, d_ff: int, n_experts: int,
             top_k: int = 2, capacity_factor: float = 1.25,
             dtype=jnp.float32) -> "MoEFeedForward":
        kr, ku, kd = jax.random.split(key, 3)
        bound_in = 1.0 / (d_model ** 0.5)
        bound_ff = 1.0 / (d_ff ** 0.5)
        return cls(
            router_w=uniform_init(kr, (d_model, n_experts), bound_in,
                                  jnp.float32),
            w_up=uniform_init(ku, (n_experts, d_model, d_ff), bound_in, dtype),
            w_down=uniform_init(kd, (n_experts, d_ff, d_model), bound_ff,
                                dtype),
            n_experts=n_experts, top_k=top_k,
            capacity_factor=capacity_factor)

    def quantize(self, **_qkw) -> "MoEFeedForward":
        if isinstance(self.w_up, QuantizedExpertWeight):
            return self
        return MoEFeedForward(
            router_w=self.router_w,
            w_up=quantize_expert_weights(self.w_up),
            w_down=quantize_expert_weights(self.w_down),
            n_experts=self.n_experts, top_k=self.top_k,
            capacity_factor=self.capacity_factor)

    @property
    def is_quantized(self) -> bool:
        return isinstance(self.w_up, QuantizedExpertWeight)

    def __call__(self, x):
        """x [..., d] -> [..., d]."""
        shape = x.shape
        xf = x.reshape(-1, shape[-1])
        t = xf.shape[0]
        cap = _capacity(t, self.n_experts, self.top_k, self.capacity_factor)
        dispatch, combine = route(xf, self.router_w, self.top_k, cap)
        expert_in = jnp.einsum("tec,td->ecd", dispatch,
                               xf.astype(jnp.float32))
        if self.is_quantized:
            expert_out = quantized_expert_ffn(expert_in, self.w_up,
                                              self.w_down)
        else:
            expert_out = expert_ffn(expert_in.astype(self.w_up.dtype),
                                    self.w_up, self.w_down)
        out = jnp.einsum("tec,ecd->td", combine, expert_out)
        return out.reshape(shape).astype(x.dtype)

    def aux_loss(self, x):
        """Switch load-balancing auxiliary loss for this layer's router on
        input ``x`` — see ``load_balancing_loss``. Kept out of ``__call__``
        so the inference path stays a pure FeedForward drop-in; training
        loops call both."""
        return load_balancing_loss(x, self.router_w)
