"""Token sampling: temperature / top-k / top-p (nucleus), jit-compatible.

Beyond-reference serving capability (the reference has no sampling loop at
all — its transformer demo stops before the logits head,
src/transformer.cu:182 "TODO:: MLP & op_softmax"). Everything is static
shape: top-k uses jax.lax.top_k with a static k, top-p sorts once and masks
by cumulative probability, and greedy is the temperature=0 limit.

Per-slot vectorization for continuous batching: ``temperature`` / ``top_p``
may be [B] arrays (one value per slot) while ``top_k`` is a static int
(shape-affecting; the engine buckets by it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(logits, key, temperature=1.0, top_k: int = 0,
                  top_p=1.0):
    """logits [B, V] -> tokens [B] int32.

    temperature: scalar or [B]; 0 (or <=1e-6) means greedy for that slot.
    top_k: static int; 0 disables. top_p: scalar or [B]; 1 disables.
    """
    b, v = logits.shape
    lg = logits.astype(jnp.float32)
    temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    topp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))

    greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    if top_k and top_k < v:
        kth = jax.lax.top_k(lg, top_k)[0][:, -1:]          # [B, 1]
        lg = jnp.where(lg < kth, -jnp.inf, lg)

    # nucleus: keep the smallest prefix of the sorted distribution whose
    # mass reaches top_p (the first token is always kept)
    scaled = lg / jnp.maximum(temp, 1e-6)[:, None]
    probs = jax.nn.softmax(scaled, axis=-1)
    sort_idx = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, sort_idx, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (csum - sorted_probs) < topp[:, None]    # prefix rule
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(b)[:, None], sort_idx].set(keep_sorted)
    scaled = jnp.where(keep, scaled, -jnp.inf)

    sampled = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temp <= 1e-6, greedy_tok, sampled)
