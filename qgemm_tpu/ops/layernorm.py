"""Row-wise LayerNorm (+ fused residual variant).

Parity with src/ops/op_layernorm.cuh (one thread per row, :7-33). Two
documented deviations from the reference, both bug-fixes:
  * the reference divides by ``var`` instead of ``sqrt(var + eps)``
    (op_layernorm.cuh:28) — we implement standard LayerNorm with eps;
    ``layernorm_reference_semantics`` reproduces the raw reference math for
    parity tests.
  * learnable gamma/beta are supported (the reference has none).

``layernorm_residual`` fuses the transformer block's ``add + norm``
(src/transformer.cu:58-59) into one op; the Pallas version is in
ops/pallas/layernorm.py.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def layernorm(x, gamma=None, beta=None, eps: float = 1e-5, axis: int = -1):
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y


def layernorm_residual(x, residual, gamma=None, beta=None, eps: float = 1e-5):
    """LayerNorm(x + residual) — the transformer block's add+norm fused."""
    return layernorm(x + residual, gamma=gamma, beta=beta, eps=eps)


def layernorm_reference_semantics(x, axis: int = -1):
    """Bit-faithful reproduction of the reference kernel's math
    (op_layernorm.cuh:7-33: (x - mean) / var, population variance, no eps,
    no affine). Only for parity tests against the CUDA behavior."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    return (x - mean) / var
