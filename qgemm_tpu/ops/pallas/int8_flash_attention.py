"""INT8 blockwise (flash-style) attention — quantized-GEMM attention.

The framework's namesake technique applied to the attention matmuls
themselves (beyond-reference; the reference quantizes only linear-layer
GEMMs, src/ops/op_mm.cuh:69-101). Both attention dots run on the MXU at
the int8 rate (2x the bf16 peak on v5e) and K/V stream from HBM as int8
(half the bytes):

  * K smoothing (SageAttention direction, PAPERS.md): the per-channel
    mean of K over the sequence is subtracted before quantization —
    q . mu adds the SAME constant to every score in a q row, so softmax
    is INVARIANT, and removing the mean component stops it from eating
    the int8 range of outlier channels;
  * Q and K quantize per ROW (position) with absmax scales — the scales
    factor out of the int8 dot: s = (q8 . k8) * sq_row * sk_col;
  * P (the post-softmax probability block) is quantized to int8 with the
    FIXED scale 127 (exp shifting by the running max bounds p in [0, 1]);
    the running sum l accumulates sum(p8)/127, so the final normalization
    divides the quantized mass by itself — the P-rounding error largely
    cancels in the softmax normalization;
  * V quantizes per CHANNEL (output column) — that scale factors out of
    the second dot and is applied once at the finish.

Exactness: ~1e-2 relative (int8 rounding of Q/K/P/V) — a serving/prefill
option, NOT the training kernel (the bf16 flash kernel keeps the
custom-VJP backward). Forward-only by design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.flash_attention import (_compiler_params,
                                                  _interpret, _round_up,
                                                  _tiles)

_NEG_INF = -1e30


def _int8_flash_kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref,
                       m_scr, l_scr, acc_scr, *, scale: float, causal: bool,
                       n_k: int, bq: int, bk: int, sq_valid: int,
                       sk_valid: int, p_int8: bool = True):
    kk = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _block(apply_mask: bool):
        q8 = q_ref[0]                                # [BQ, D] int8
        k8 = k_ref[0]                                # [BK, D] int8
        v8 = v_ref[0]                                # [BK, Dv] int8

        s32 = jax.lax.dot_general(q8, k8, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        # row/col scales factor out of the int8 dot; 127^2 folds into them
        s = s32.astype(jnp.float32) * (sq_ref[0] * scale) \
            * sk_ref[0][:, 0][None, :]

        if apply_mask:
            qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * bq
            kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * bk
            mask = kj < sk_valid
            if causal:
                mask = jnp.logical_and(mask, kj <= qi)
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]                            # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if apply_mask:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)

        if p_int8:
            # P -> int8 at the fixed scale 127 (p in [0, 1] after the
            # shift); l accumulates the QUANTIZED mass so normalization
            # divides the rounded probabilities by their own sum
            p8 = jnp.round(p * 127.0).astype(jnp.int8)
            pv = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            lsum = jnp.sum(p8.astype(jnp.float32), axis=-1, keepdims=True)
        else:
            # qk8 variant: only the first dot is int8; P stays bf16 (v8
            # is bf16 here — see the caller)
            pv = jax.lax.dot_general(p.astype(v8.dtype), v8,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            lsum = jnp.sum(p, axis=-1, keepdims=True)
        l_scr[:] = l_scr[:] * alpha + lsum
        m_scr[:] = m_new
        acc_scr[:] = acc_scr[:] * alpha + pv.astype(jnp.float32)

    on_diag = kk * bk + bk - 1 > iq * bq if causal else False
    in_tail = (kk + 1) * bk > sk_valid
    needs_mask = jnp.logical_or(on_diag, in_tail)
    visit = kk * bk <= iq * bq + bq - 1 if causal else True
    pl.when(jnp.logical_and(visit, needs_mask))(
        functools.partial(_block, True))
    pl.when(jnp.logical_and(visit, jnp.logical_not(needs_mask)))(
        functools.partial(_block, False))

    @pl.when(kk == n_k - 1)
    def _finish():
        # V's per-channel scale (folded by the caller into the output
        # epilogue would need another input block; applying 1/127 here and
        # vc outside keeps the kernel's output [BQ, Dv] f32-scaled)
        l = jnp.maximum(l_scr[:], 1e-6)
        o = acc_scr[:] / l
        if p_int8:
            o = o * (1.0 / 127.0)
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "qk_only"))
def flash_attention_int8(q, k, v, causal: bool = False,
                         qk_only: bool = False):
    """q [B, H, Sq, D], k/v [B, H, Sk, D/Dv] f32/bf16 -> [B, H, Sq, Dv].

    Quantized (int8 x int8 -> int32 MXU) flash attention with K mean
    smoothing; ~1e-2 relative accuracy vs the f32 reference. Forward-only
    serving/prefill path (cites the reference's quantized-GEMM pipeline,
    src/ops/op_mm.cuh:69-101, extended to the attention matmuls).
    ``qk_only``: quantize only the QK^T dot; P stays bf16 and V
    unquantized (more accurate, less VPU overhead)."""
    from qgemm_tpu.ops.validation import check_attention_4d
    check_attention_4d(q, k, v)
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dv = v.shape[3]
    scale = 1.0 / (d ** 0.5)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # K smoothing: remove the per-channel sequence mean (softmax-invariant
    # row-constant shift; frees int8 range from the mean component)
    kf = kf - jnp.mean(kf, axis=2, keepdims=True)

    # per-row absmax for Q and K-centered; 127 folded into the scales
    sq_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-6)
    sk_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=-1, keepdims=True), 1e-6)
    q8 = jnp.round(qf / sq_s * 127.0).astype(jnp.int8)
    k8 = jnp.round(kf / sk_s * 127.0).astype(jnp.int8)
    if qk_only:
        v8 = v.astype(jnp.bfloat16)
        vc = None
    else:
        # per-channel absmax for V (factors out of the second dot)
        vc = jnp.maximum(jnp.max(jnp.abs(vf), axis=2, keepdims=True), 1e-6)
        v8 = jnp.round(vf / vc * 127.0).astype(jnp.int8)
    sq_s = sq_s / 127.0
    sk_s = sk_s / 127.0

    bq, bk, sqp, skp, dp, dvp = _tiles(sq, sk, d, dv)

    pad3 = lambda x, s_to, d_to: jnp.pad(
        x.reshape(b * h, x.shape[2], x.shape[3]),
        ((0, 0), (0, s_to - x.shape[2]), (0, d_to - x.shape[3])))
    qp = pad3(q8, sqp, dp)
    kp = pad3(k8, skp, dp)
    vp = pad3(v8, skp, dvp)
    sqp_s = pad3(sq_s, sqp, 1)
    skp_s = jnp.pad(sk_s.reshape(b * h, sk, 1),
                    ((0, 0), (0, skp - sk), (0, 0)),
                    constant_values=1.0)  # padded K rows masked anyway

    n_k = skp // bk
    grid = (b * h, sqp // bq, n_k)
    if causal:
        kv_ix = lambda bh, iq, kk: (bh, jnp.minimum(kk, (iq * bq + bq - 1)
                                                    // bk), 0)
    else:
        kv_ix = lambda bh, iq, kk: (bh, kk, 0)

    out = pl.pallas_call(
        functools.partial(_int8_flash_kernel, scale=scale, causal=causal,
                          n_k=n_k, bq=bq, bk=bk, sq_valid=sq, sk_valid=sk,
                          p_int8=not qk_only),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1), kv_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvp), lambda bh, iq, kk: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dvp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dvp), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel",
                                          "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * b * h * sq * sk * (d + dv) // 2,
            bytes_accessed=qp.size + kp.size + vp.size
            + b * h * sqp * dvp * q.dtype.itemsize,
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=_interpret(),
    )(qp, kp, vp, sqp_s, skp_s)
    out = out[:, :sq, :dv].reshape(b, h, sq, dv)
    if vc is None:
        return out
    # V's per-channel scale, applied once outside the kernel
    return (out.astype(jnp.float32) * vc).astype(q.dtype)
