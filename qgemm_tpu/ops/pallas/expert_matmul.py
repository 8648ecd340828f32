"""Grouped (expert-batched) fused int8 quantized matmul for MoE decode.

The MoE expert FFN (models/moe.py `quantized_expert_ffn`) is the one int8
GEMM family that ran OUTSIDE the fused-Pallas doctrine: `jnp.einsum` with a
separate XLA activation-quantize pass measures 78% of its weight-stream
roofline at engine-realistic decode shapes ([E=8, C=8, d=2048, f=4096]),
vs the 83% the dense fused kernel holds (SOL.md). This kernel applies the
same single-HBM-pass design (ops/pallas/quantized_matmul.py: in-register
per-row absmax -> RTN quantize -> int8xint8 MXU dot -> absmax dequant
epilogue) with a leading EXPERT grid dimension: each (e, j) step reads one
expert's [C, K] activation slab (resident in VMEM across the whole N
extent) and streams that expert's int8 [K, bn] weight tile exactly once.

**Measured NEGATIVE on v5e; kept as a tested option, NOT the serving
path** (r5; same discipline as the int8-flash finding, SOL.md). At the
decode shape above: einsum 0.212 ms (78.1% of weight-stream SOL) vs this
kernel 0.237 ms (69.7%); parity exact (max rel err 2e-7). The attribution
for the einsum residual is SMALL-ROW MXU dots, not stream inefficiency:
the same einsum at C=128 (one full MXU row tile) reaches 86.4%, C=8/64
sit at ~78% — the per-expert [C<=64, K] x [K, N] dots pad to the MXU's
row tile, and that padded compute overlaps imperfectly with the weight
stream. A grid-based kernel pays the same padding PLUS per-step grid
overhead, so it cannot win at decode C; `models/moe.py` therefore keeps
the einsum path, with this measurement as the evidence.

Decode-shaped C is tiny (capacity ~8-16 tokens per expert), so tiles pad C
up to the f32 sublane (8); the padding rows quantize to junk that lands in
padded output rows nobody reads. No reference counterpart (the reference
is dense single-GPU; MoE is a greenfield family, SURVEY §2 parallelism
note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.quantized_matmul import (_EPS, QRANGE,
                                                   _compiler_params,
                                                   _interpret, _round_up)


def _expert_qmm_kernel(x_ref, wq_ref, cw_ref, o_ref):
    """One (expert, n-block) step: fused row-quantize + int8 dot + dequant.
    Blocks carry a leading singleton expert dim."""
    x = x_ref[0].astype(jnp.float32)                       # [C, K]
    cx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    xq = jnp.clip(jnp.round(x * (QRANGE / cx)),
                  -QRANGE, QRANGE).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    inv_r2 = 1.0 / (QRANGE * QRANGE)
    o_ref[0] = ((acc.astype(jnp.float32) * (cx * inv_r2)) * cw_ref[0])


@functools.partial(jax.jit, static_argnames=())
def grouped_quantized_matmul_pallas(x, wq, cw):
    """x [E, C, K] f32 @ per-expert offline-quantized (wq int8 [E, K, N],
    cw f32 [E, 1, N]) -> [E, C, N] f32.

    Full-K tiles (the in-kernel absmax needs the whole activation row; MoE
    d_model/d_ff sit comfortably in VMEM as int8 slabs), N blocked at
    <=2048 so the int8 W tile stays <=4 MB — the dense kernel's swept
    optimum (`_pick_tiles`)."""
    e, c, k = x.shape
    n = wq.shape[2]
    cp = _round_up(c, 8)                     # f32 sublane
    kp = _round_up(k, 128)
    bn = _round_up(-(-n // (-(-n // 2048))), 128)
    np_ = _round_up(n, bn)
    if (cp, kp) != (c, k):
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, kp - k)))
    if (kp, np_) != (k, n):
        wq = jnp.pad(wq, ((0, 0), (0, kp - k), (0, np_ - n)))
        cw = jnp.pad(cw, ((0, 0), (0, 0), (0, np_ - n)), constant_values=1.0)
    out = pl.pallas_call(
        _expert_qmm_kernel,
        grid=(e, np_ // bn),
        in_specs=[
            pl.BlockSpec((1, cp, kp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cp, bn), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, cp, np_), jnp.float32),
        compiler_params=_compiler_params(("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * cp * np_ * kp,
            bytes_accessed=e * (cp * kp * 4 + kp * np_ + cp * np_ * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, wq, cw)
    return out[:, :c, :n]


def quantized_expert_ffn_pallas(expert_in, w_up, w_down):
    """Fused-kernel int8 expert FFN: grouped qmm up -> relu -> grouped qmm
    down. Same contract as models/moe.quantized_expert_ffn (expert_in
    [E, C, d]; QuantizedExpertWeight pairs) — parity-tested against it."""
    h = grouped_quantized_matmul_pallas(expert_in, w_up.q, w_up.c)
    h = jnp.maximum(h, 0.0)
    return grouped_quantized_matmul_pallas(h, w_down.q, w_down.c)
