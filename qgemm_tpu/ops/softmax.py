"""Row-wise numerically stable softmax.

Parity with src/ops/op_softmax.cuh (max-subtract :12-17, exp-sum :19-23,
normalize :25-27). The reference runs one thread per row with a serial column
loop (and sizes its grid from the wrong dim, :38); here the row is
lane-vectorized on the VPU. A fused Pallas kernel lives in
ops/pallas/softmax.py for when softmax is the op boundary; inside attention
it is fused into the flash-attention kernel instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def softmax(x, axis: int = -1):
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)
