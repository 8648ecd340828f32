"""LLM.int8()-style absmax vector-wise int8 quantized matmul — the core
capability (reference: src/ops/op_mm.cuh::op_quantized_mm :69-101).

Pipeline (identical math to the reference, SURVEY.md §2):
  1. per-row absmax of activations  Cx[m,1]
  2. per-col absmax of weights      Cw[1,n]
  3. scales sx = R/Cx, sw = R/Cw (R = 127)
  4. quantize to int8 (round-to-nearest; the reference truncates —
     MultiplyWithTypecastFunc op_elemwise.cuh:106-114 — a documented bug we
     fix; pass rounding="truncate" for bit-parity experiments)
  5. int8 x int8 -> int32 matmul on the MXU
  6. dequantize: out = acc * (Cx @ Cw) / R^2

Two execution backends:
  * "xla"    — the jnp composition below; XLA fuses steps 1-4 and 6 around
               one int8 dot. This is the oracle for the Pallas kernels.
  * "pallas" — fused TPU kernels (ops/pallas/quantized_matmul.py): one
               row-quantization kernel for activations + one int8-matmul
               kernel with the dequant epilogue fused into its grid, so X and
               W are each read from HBM once (the reference's 4.18x slowdown
               came from ~9 unfused kernel launches re-reading HBM).
  * "auto"   — pallas on TPU, xla elsewhere.

Plus the mixed-precision outlier decomposition from the LLM.int8() paper
(``quantized_matmul_outlier``): the reference scaffolded the outlier mask
(op_elemwise.cuh:699-708 op_outlier_extractor) but never wired it in; here it
is a first-class, jit-compatible path with a static outlier capacity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

QRANGE = 127.0
_EPS = 1e-12  # guards all-zero rows/cols (scale would be inf)


def _use_pallas(backend: str) -> bool:
    if backend == "auto":
        return jax.default_backend() not in ("cpu",)
    return backend == "pallas"


# ---------------------------------------------------------------------------
# quantize / dequantize primitives
# ---------------------------------------------------------------------------

def absmax_scales(x, axis: int):
    """max|x| along ``axis`` with keepdims — the Cx / Cw statistic
    (op_reduction.cuh:196)."""
    return jnp.maximum(jnp.max(jnp.abs(x), axis=axis, keepdims=True), _EPS)


def absmax_quantize(x, axis: int, rounding: str = "nearest", qrange: float = QRANGE):
    """Quantize to int8 along ``axis`` (rows of activations: axis=-1;
    cols of weights: axis=0). Returns (q int8, c absmax float32)."""
    c = absmax_scales(x, axis)
    scaled = x * (qrange / c)
    if rounding == "nearest":
        q = jnp.clip(jnp.round(scaled), -qrange, qrange).astype(jnp.int8)
    elif rounding == "truncate":  # reference bit-parity
        q = jnp.trunc(scaled).astype(jnp.int8)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    return q, c.astype(jnp.float32)


def dequantize(acc_i32, cx, cw, qrange: float = QRANGE):
    """out = acc * (Cx outer Cw) / R^2 — op_mm.cuh:96-99 fused into one
    elementwise expression (XLA folds the outer product into the multiply)."""
    return acc_i32.astype(jnp.float32) * (cx * cw) * (1.0 / (qrange * qrange))


class QuantizedWeight(NamedTuple):
    """Offline-quantized weight: int8 values + per-column absmax. This is the
    serving-path artifact — weights are quantized once, activations per step."""
    q: jax.Array   # int8 [k, n]
    c: jax.Array   # float32 [1, n] per-column absmax


def quantize_weights(w, rounding: str = "nearest") -> QuantizedWeight:
    q, c = absmax_quantize(w, axis=0, rounding=rounding)
    return QuantizedWeight(q=q, c=c)


class QuantizedWeight4(NamedTuple):
    """int4 group-quantized weight (W4A8 serving artifact — LiquidGEMM /
    AWQ direction, PAPERS.md): packed nibbles + per-(128-row K-group,
    column) absmax scales. Decode streams the whole weight matrix per
    token, so int4 halves the int8 path's dominant HBM traffic again; the
    group scales recover the accuracy a single per-column int4 scale would
    lose. The true K extent is implicit (callers know x.shape[-1]; the
    pad groups are zeros and contribute nothing)."""
    qp: jax.Array  # int8 [ceil(k/GROUP)*GROUP/2, n] packed (pack_int4 layout)
    c: jax.Array   # f32  [ceil(k/GROUP), n] per-group column absmax


def quantize_weights_int4(w) -> QuantizedWeight4:
    """w [k, n] -> QuantizedWeight4 (group size 128 along K; K is
    zero-padded to a group multiple — zero rows quantize to zero).

    The per-group scale is MSE-optimal over a clip-ratio grid rather than
    plain absmax: at 4 bits the absmax scale wastes most of the grid on
    one tail value (Gaussian group absmax ~3.2 sigma vs 15 levels), and
    clipping the tail in exchange for a finer interior grid reduces the
    reconstruction MSE by ~25% (measured: rel err 0.118 -> 0.089 on
    Gaussian weights). Offline-only cost: 6 candidate quantizations."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import GROUP, W4RANGE, pack_int4
    k, n = w.shape
    kp = -(-k // GROUP) * GROUP
    wf = jnp.pad(w.astype(jnp.float32), ((0, kp - k), (0, 0)))
    wg = wf.reshape(kp // GROUP, GROUP, n)
    cmax = jnp.maximum(jnp.max(jnp.abs(wg), axis=1), _EPS)     # [KG, n]

    def mse_for(alpha):
        c = cmax * alpha
        q = jnp.clip(jnp.round(wg * (W4RANGE / c[:, None, :])), -W4RANGE,
                     W4RANGE)
        err = q * (c[:, None, :] / W4RANGE) - wg
        return jnp.sum(err * err, axis=1), c

    alphas = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)
    mses, cs = zip(*(mse_for(a) for a in alphas))
    best = jnp.argmin(jnp.stack(mses), axis=0)                 # [KG, n]
    c = jnp.take_along_axis(jnp.stack(cs), best[None], axis=0)[0]
    q = jnp.clip(jnp.round(wg * (W4RANGE / c[:, None, :])), -W4RANGE,
                 W4RANGE).astype(jnp.int32).reshape(kp, n)
    return QuantizedWeight4(qp=pack_int4(q), c=c)


def dequantize_weights_int4(wq4: QuantizedWeight4, k=None, dtype=jnp.float32):
    """jnp oracle: reconstruct the (lossy) float weights ([:k] when the
    true K extent is given)."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import GROUP, W4RANGE, unpack_int4
    q = unpack_int4(wq4.qp).astype(jnp.float32)                # [kp, n]
    kp, n = q.shape
    w = q.reshape(kp // GROUP, GROUP, n) * (wq4.c[:, None, :] / W4RANGE)
    w = w.reshape(kp, n)
    return (w if k is None else w[:k]).astype(dtype)


def quantized_matmul_prequant_w4(x, wq4: QuantizedWeight4):
    """x [m, k] @ int4 weights via the fused W4A8 kernel (interpreter mode
    on CPU — the same program, so transcripts are backend-independent)."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import w4a8_matmul_pallas
    return w4a8_matmul_pallas(x, wq4.qp, wq4.c)


# ---------------------------------------------------------------------------
# int8 matmul
# ---------------------------------------------------------------------------

def int8_matmul(xq, wq):
    """int8 x int8 -> int32 on the MXU (reference runs this in fp32 shared
    memory, op_mm.cuh:16-17 — on TPU true int8 is ~2x the bf16 MXU rate)."""
    return jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


# ---------------------------------------------------------------------------
# full pipelines
# ---------------------------------------------------------------------------

def quantized_matmul_xla(x, w, rounding: str = "nearest", qrange: float = QRANGE):
    """The jnp composition — oracle for the Pallas kernels."""
    xq, cx = absmax_quantize(x, axis=-1, rounding=rounding, qrange=qrange)
    wq, cw = absmax_quantize(w, axis=0, rounding=rounding, qrange=qrange)
    acc = int8_matmul(xq, wq)
    return dequantize(acc, cx, cw, qrange)


@functools.partial(jax.jit, static_argnames=("rounding", "backend"))
def quantized_matmul(x, w, rounding: str = "nearest", backend: str = "auto"):
    """Dynamic quantized matmul: quantizes BOTH operands on the fly —
    op_quantized_mm parity (op_mm.cuh:69-101). x [m,k] f32/bf16, w [k,n]."""
    from qgemm_tpu.ops.validation import check_float, check_matmul_2d
    check_matmul_2d(x, w)
    check_float("x", x)
    check_float("w", w)
    if _use_pallas(backend):
        from qgemm_tpu.ops.pallas.quantized_matmul import quantized_matmul_pallas
        return quantized_matmul_pallas(x, w, rounding=rounding)
    return quantized_matmul_xla(x, w, rounding=rounding)


def quantized_matmul_prequant(x, wq: QuantizedWeight, backend: str = "auto",
                              rounding: str = "nearest"):
    """Serving path: weights already int8, activations quantized per call."""
    from qgemm_tpu.ops.validation import check, check_dtype, check_float, \
        check_matmul_2d
    check_matmul_2d(x, wq.q, "x", "wq.q")
    check_float("x", x)
    check_dtype("wq.q", wq.q, "int8")
    check(wq.c.shape == (1, wq.q.shape[1]),
          f"wq.c: expected per-column scales (1, {wq.q.shape[1]}), "
          f"got {wq.c.shape}")
    if _use_pallas(backend):
        from qgemm_tpu.ops.pallas.quantized_matmul import (
            quantized_matmul_prequant_pallas,
        )
        return quantized_matmul_prequant_pallas(x, wq.q, wq.c, rounding=rounding)
    xq, cx = absmax_quantize(x, axis=-1, rounding=rounding)
    acc = int8_matmul(xq, wq.q)
    return dequantize(acc, cx, wq.c)


def quantized_matmul_prequant_outlier(x, wq: QuantizedWeight,
                                      threshold: float = 6.0,
                                      capacity: int = 32,
                                      backend: str = "auto",
                                      matmul_fn=None):
    """Serving-path outlier decomposition (bitsandbytes semantics): weights
    live ONLY in int8. Outlier activation feature-dims (|x| column absmax >
    threshold, static top-k capacity) are zeroed in the int8 path; the
    matching int8 weight ROWS are dequantized to bf16 on the fly
    (w_row ~= wq[row] * cw / 127) and matmul'd against the outlier columns
    in bf16. Memory stays int8; accuracy recovers the X-quantization error,
    which dominates for LLM.int8()-style outliers.

    ``matmul_fn(x_in, wq) -> out`` overrides the inlier int8 matmul — the
    tensor-parallel QuantizedLinear routes it through shard_map tp_ops while
    the outlier split/extract stays at the global-array (GSPMD) level."""
    k = x.shape[-1]
    capacity = min(capacity, k)
    col_absmax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))
    top_vals, top_idx = jax.lax.top_k(col_absmax, capacity)
    selected = top_vals > threshold

    mask = jnp.zeros((k,), jnp.bool_).at[top_idx].set(selected)
    x_in = jnp.where(mask, 0.0, x)
    if matmul_fn is not None:
        out = matmul_fn(x_in, wq)
    elif isinstance(wq, QuantizedWeight4):
        out = quantized_matmul_prequant_w4(x_in, wq)
    else:
        out = quantized_matmul_prequant(x_in, wq, backend=backend)

    x_o = jnp.take(x, top_idx, axis=-1) * selected.astype(x.dtype)
    if isinstance(wq, QuantizedWeight4):
        w_rows = _take_rows_w4(wq, top_idx)                       # [cap, n]
    else:
        w_rows = jnp.take(wq.q, top_idx, axis=0).astype(jnp.float32) \
            * wq.c * (1.0 / QRANGE)                               # [cap, n]
    od = _outlier_dot_dtype()
    out_fp = jax.lax.dot_general(
        x_o.astype(od), w_rows.astype(od),
        dimension_numbers=(((x_o.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out + out_fp


def _take_rows_w4(wq4: "QuantizedWeight4", idx):
    """Dequantize arbitrary K-rows from the packed int4 layout (outlier
    decomposition over W4A8 weights). Row r lives in group r // GROUP; its
    packed row is group*64 + r % 64, in the LOW nibble for the group's
    first 64 rows and the HIGH nibble for the rest (pack_int4 layout).
    idx [cap] -> f32 [cap, n]."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import GROUP, W4RANGE
    half = GROUP // 2
    g = idx // GROUP
    r = idx % GROUP
    is_hi = r >= half
    prow = g * half + jnp.where(is_hi, r - half, r)
    packed = jnp.take(wq4.qp, prow, axis=0).astype(jnp.int32)     # [cap, n]
    lo = (packed << 28) >> 28
    hi = packed >> 4
    q = jnp.where(is_hi[:, None], hi, lo).astype(jnp.float32)
    c = jnp.take(wq4.c, g, axis=0)                                # [cap, n]
    return q * (c / W4RANGE)


def _outlier_dot_dtype():
    """bf16 on TPU (MXU-native); f32 on CPU, whose DotThunk cannot execute
    BF16 x BF16 = F32 (hit by the virtual-mesh tests)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


# ---------------------------------------------------------------------------
# mixed-precision outlier decomposition (LLM.int8() §3; BASELINE config 5)
# ---------------------------------------------------------------------------

def quantized_matmul_outlier(x, w, threshold: float = 6.0,
                             capacity: int | None = None,
                             backend: str = "auto"):
    """out = int8_mm(x with outlier feature-dims zeroed, w)
           + bf16_mm(x[:, outliers], w[outliers, :]).

    Outlier feature dims are columns of x whose absmax exceeds ``threshold``
    (the LLM.int8() criterion). ``capacity`` is the static maximum number of
    outlier dims (jit-friendly: top-k + masking, no dynamic shapes); dims
    below threshold inside the top-k are masked to zero so the result is
    exact w.r.t. the threshold as long as #outliers <= capacity.
    """
    k = x.shape[-1]
    if capacity is None:
        capacity = max(8, k // 128)
    capacity = min(capacity, k)

    col_absmax = jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1)))  # [k]
    top_vals, top_idx = jax.lax.top_k(col_absmax, capacity)
    selected = top_vals > threshold                                   # [cap]

    outlier_mask = jnp.zeros((k,), jnp.bool_).at[top_idx].set(selected)
    x_inlier = jnp.where(outlier_mask, 0.0, x)
    out = quantized_matmul(x_inlier, w, backend=backend)

    x_o = jnp.take(x, top_idx, axis=-1) * selected.astype(x.dtype)    # [m,cap]
    w_o = jnp.take(w, top_idx, axis=0)                                # [cap,n]
    od = _outlier_dot_dtype()
    out_fp = jax.lax.dot_general(
        x_o.astype(od), w_o.astype(od),
        dimension_numbers=(((x_o.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out + out_fp
