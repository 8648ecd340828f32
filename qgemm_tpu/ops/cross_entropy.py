"""Fused softmax-cross-entropy with hand-derived VJP.

Parity with src/ops/op_cross_entropy.cuh (fused fwd+bwd: max-shift :9-15,
exp :18, per-row NLL :36-42, analytic d_logits = (softmax - onehot)/batch
:45-58, mean batch loss :103-105). The reference computes both directions in
one pass; here the same capability is a ``jax.custom_vjp`` so the analytic
gradient is used under ``jax.grad`` instead of differentiating through
softmax — one fused backward, no recompute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softmax(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


@jax.custom_vjp
def cross_entropy_loss(logits, targets):
    """Mean NLL over the batch. logits [B, C] float, targets [B] int."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    shifted = logits - m
    lse = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    picked = jnp.take_along_axis(shifted, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(lse - picked)


def _ce_fwd(logits, targets):
    loss = cross_entropy_loss(logits, targets)
    return loss, (logits, targets)


def _ce_bwd(res, g):
    logits, targets = res
    batch = logits.shape[0]
    probs = _softmax(logits)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    # analytic d_logits = (softmax - onehot) / batch (op_cross_entropy.cuh:45-58)
    d_logits = (probs - onehot) * (g / batch)
    return d_logits, None


cross_entropy_loss.defvjp(_ce_fwd, _ce_bwd)


def cross_entropy_loss_and_grad(logits, targets):
    """Convenience mirroring the reference op's dual return (loss scalar +
    d_logits on device, op_cross_entropy.cuh:65-105)."""
    loss = cross_entropy_loss(logits, targets)
    probs = _softmax(logits)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    d_logits = (probs - onehot) / logits.shape[0]
    return loss, d_logits
