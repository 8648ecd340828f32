"""Deterministic PRNG plumbing.

Replaces the reference's global ``randgen_seed`` + cuRAND generators
(reference: src/ops/op_elemwise.cuh:14-23, op_uniform_init :729-744) with
explicit JAX PRNG keys: a seed becomes a key, keys are split — never reused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_seq(seed: int):
    """Infinite stream of fresh PRNG keys from one seed.

    Usage::

        keys = key_seq(0)
        w = uniform_init(next(keys), (in_dim, out_dim), 0.1)
    """
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def uniform_init(key, shape, bound: float, dtype=jnp.float32):
    """Uniform(-bound, +bound) init — the reference's ``init_uniform`` /
    ``op_uniform_init`` (src/modules/linear.cuh:33-39: Kaiming-uniform
    ±1/sqrt(in_dim))."""
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
