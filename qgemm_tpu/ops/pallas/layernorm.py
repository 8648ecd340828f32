"""Fused residual-add + LayerNorm Pallas kernel.

The transformer block's ``op_add + op_layernorm`` pair
(src/transformer.cu:58-59) as ONE VMEM round trip: y = LN(x + residual) with
learnable affine. Replaces the reference's one-thread-per-row kernel
(src/ops/op_layernorm.cuh:7-33; note its /var bug — we use rsqrt(var+eps),
see ops/layernorm.py).
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


def _ln_kernel(x_ref, r_ref, g_ref, b_ref, o_ref, *, n_valid: int, eps: float,
               has_residual: bool):
    x = x_ref[:].astype(jnp.float32)
    if has_residual:
        x = x + r_ref[:].astype(jnp.float32)
    npad = x.shape[-1]
    if n_valid != npad:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        valid = col < n_valid
        x = jnp.where(valid, x, 0.0)
    inv_n = 1.0 / n_valid
    mean = jnp.sum(x, axis=-1, keepdims=True) * inv_n
    cx = x - mean
    if n_valid != npad:
        cx = jnp.where(col < n_valid, cx, 0.0)
    var = jnp.sum(cx * cx, axis=-1, keepdims=True) * inv_n
    y = cx * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows"))
def layernorm_residual_pallas(x, residual=None, gamma=None, beta=None,
                              eps: float = 1e-5, block_rows: int = 0):
    """LN(x [+ residual]) * gamma + beta over the last axis. ``block_rows``
    overrides the row-block heuristic (scripts/tune_rowops.py sweeps it)."""
    orig_shape = x.shape
    n = orig_shape[-1]
    x2 = x.reshape(-1, n)
    m = x2.shape[0]
    if residual is None:
        residual = jnp.zeros((1, 1), x.dtype)  # dummy, kernel skips it
    else:
        residual = residual.reshape(-1, n)
    if gamma is None:
        gamma = jnp.ones((n,), jnp.float32)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    npad = _round_up(n, 128)
    bm = block_rows or max(8, min(512, (1 << 20) // npad // 8 * 8))
    mpad = _round_up(m, bm)
    has_res = residual.shape == x2.shape
    if (mpad, npad) != (m, n):
        x2 = jnp.pad(x2, ((0, mpad - m), (0, npad - n)))
        if has_res:
            residual = jnp.pad(residual, ((0, mpad - m), (0, npad - n)))
    g2 = jnp.pad(gamma.reshape(1, n), ((0, 0), (0, npad - n)))
    b2 = jnp.pad(beta.reshape(1, n), ((0, 0), (0, npad - n)))
    if not has_res:
        residual = jnp.zeros((bm, npad), x.dtype)

    res_spec = (pl.BlockSpec((bm, npad), lambda i: (i, 0), memory_space=pltpu.VMEM)
                if has_res else
                pl.BlockSpec((bm, npad), lambda i: (0, 0), memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, n_valid=n, eps=eps, has_residual=has_res),
        grid=(mpad // bm,),
        in_specs=[
            pl.BlockSpec((bm, npad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            res_spec,
            pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mpad, npad), x.dtype),
        compiler_params=_compiler_params(("parallel",)),
        interpret=_interpret(),
    )(x2, residual, g2, b2)
    return out[:m, :n].reshape(orig_shape)
