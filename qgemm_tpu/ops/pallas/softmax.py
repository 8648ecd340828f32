"""Fused row-wise softmax Pallas kernel.

Replaces the reference's one-thread-per-row serial kernel
(src/ops/op_softmax.cuh:7-29, with its grid-size bug at :38) with
lane-vectorized full-row tiles on the VPU: max-subtract, exp, sum, normalize
in one VMEM round trip. Used when softmax is an op boundary; attention
fuses softmax into the flash kernel instead (ops/pallas/flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.quantized_matmul import _compiler_params


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _softmax_kernel(x_ref, o_ref, *, n_valid: int):
    x = x_ref[:].astype(jnp.float32)
    if n_valid != x.shape[-1]:  # mask padding lanes out of the reduction
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        x = jnp.where(col < n_valid, x, -jnp.inf)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = (e / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def softmax_pallas(x, block_rows: int = 0):
    """Row-wise softmax over the last axis; any leading shape.
    ``block_rows`` overrides the row-block heuristic (scripts/tune_rowops.py
    sweeps it)."""
    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n)
    m = x2.shape[0]

    npad = _round_up(n, 128)
    bm = block_rows or max(8, min(512, (1 << 20) // npad // 8 * 8))
    mpad = _round_up(m, bm)
    if (mpad, npad) != (m, n):
        x2 = jnp.pad(x2, ((0, mpad - m), (0, npad - n)))

    out = pl.pallas_call(
        functools.partial(_softmax_kernel, n_valid=n),
        grid=(mpad // bm,),
        in_specs=[pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mpad, npad), x.dtype),
        compiler_params=_compiler_params(("parallel",)),
        interpret=_interpret(),
    )(x2)
    return out[:m, :n].reshape(orig_shape)
