"""Fused Pallas TPU kernels for absmax vector-wise int8 quantized matmul.

TPU-first redesign of the reference pipeline (src/ops/op_mm.cuh:69-101),
which launched ~9 unfused CUDA kernels (2 absmax, 2 inv-divide, 2
quantize-multiply, int8 mm, outer-product mm, dequant multiply) and was
4.18x SLOWER than its own fp32 GEMM (README.md:25). Here the whole pipeline
is ONE HBM pass for K <= 2048 (the tuned tiles use full-K blocks, so each
kernel step holds the entire X row in VMEM): per-row absmax Cx, quantize
(round-to-nearest), int8xint8->int32 on the MXU, and the dequant epilogue
out = acc * (Cx Cw)/127^2 all happen in registers between one X read, one
int8 W read, and one O write — the same HBM traffic as a plain matmul.
Weights are quantized offline (serving) or by a fused XLA pass (dynamic
path). For K > 2048 the kernel streams 2048-deep K slabs with an int32 VMEM
accumulator and takes the row scales from a separate fused absmax pass
(prefetched [TM,1] / [1,TN] blocks); X is never written back as int8 in
either variant.

All kernels fall back to interpreter mode off-TPU so the same tests run on
the CPU conftest mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QRANGE = 127.0
_EPS = 1e-12


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Mosaic's default 16 MB scoped-VMEM budget is shared with whatever XLA
# fusions surround the kernel in the jitted program, so the same tiles can
# compile standalone and fail inside a model step. 32 MB (swept against 48,
# 64, 100 on v5e) gives every serving shape headroom to compile AND measures
# fastest — 100 MB regresses 2048^3 f32 from 386 to 184 TF/s (a too-large
# budget relaxes the scheduler's pipelining pressure).
_VMEM_LIMIT = 32 * 1024 * 1024


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics,
                                    vmem_limit_bytes=_VMEM_LIMIT)
    except TypeError:  # older API name
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics,
                                       vmem_limit_bytes=_VMEM_LIMIT)


# ---------------------------------------------------------------------------
# col-wise weight quantization kernel (dynamic path / offline tool)
# ---------------------------------------------------------------------------

def _col_quantize_kernel(w_ref, wq_ref, cw_ref, *, rounding: str):
    w = w_ref[:].astype(jnp.float32)
    c = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), _EPS)  # [1,TN]
    scaled = w * (QRANGE / c)
    if rounding == "nearest":
        q = jnp.clip(jnp.round(scaled), -QRANGE, QRANGE).astype(jnp.int8)
    else:
        q = scaled.astype(jnp.int8)  # truncating cast (reference parity)
    wq_ref[:] = q
    cw_ref[:] = c


def col_quantize_pallas(w, rounding: str = "nearest", block_n: int = 512):
    """w [k,n] -> (wq int8 [k,n], cw f32 [1,n]); full-K column blocks."""
    k, n = w.shape
    bn = min(block_n, _round_up(n, 128))
    kp, np_ = _round_up(k, 32), _round_up(n, bn)
    if (kp, np_) != (k, n):
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    grid = (np_ // bn,)
    wq, cw = pl.pallas_call(
        functools.partial(_col_quantize_kernel, rounding=rounding),
        grid=grid,
        in_specs=[pl.BlockSpec((kp, bn), lambda j: (0, j), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((kp, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kp, np_), jnp.int8),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel",)),
        interpret=_interpret(),
    )(w)
    return wq[:k, :n], cw[:, :n]


# ---------------------------------------------------------------------------
# the fused quantize-matmul-dequant kernel
# ---------------------------------------------------------------------------

def _qmm_kernel(x_ref, wq_ref, cx_ref, cw_ref, o_ref, acc_ref, *, rounding: str,
                n_k: int):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    scale = QRANGE / cx_ref[:]                    # [TM,1]
    scaled = x * scale
    if rounding == "nearest":
        xq = jnp.clip(jnp.round(scaled), -QRANGE, QRANGE).astype(jnp.int8)
    else:
        xq = scaled.astype(jnp.int8)

    acc_ref[:] += jax.lax.dot_general(
        xq, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(kk == n_k - 1)
    def _epilogue():
        # broadcast [TM,1] then [1,TN] against acc — never materialize the
        # [TM,TN] Cx x Cw outer product (it would cost a whole extra output
        # tile of VMEM)
        inv_r2 = 1.0 / (QRANGE * QRANGE)
        o_ref[:] = ((acc_ref[:].astype(jnp.float32) * (cx_ref[:] * inv_r2))
                    * cw_ref[:]).astype(o_ref.dtype)


def _qmm_fused_cx_kernel(x_ref, wq_ref, cw_ref, o_ref, *, rounding: str):
    """Single-K-step variant: the X tile spans the whole (padded) K extent,
    so the per-row absmax is computed here instead of a separate XLA pass —
    saving one full HBM read of X (which cost the two-pass path ~30% at
    2048^3: 292 vs 386 TF/s). No int32 scratch either: one K step writes
    the output tile directly."""
    x = x_ref[:].astype(jnp.float32)
    cx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    scaled = x * (QRANGE / cx)
    if rounding == "nearest":
        xq = jnp.clip(jnp.round(scaled), -QRANGE, QRANGE).astype(jnp.int8)
    else:
        xq = scaled.astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    inv_r2 = 1.0 / (QRANGE * QRANGE)
    o_ref[:] = ((acc.astype(jnp.float32) * (cx * inv_r2))
                * cw_ref[:]).astype(o_ref.dtype)


def _qmm_fused_cx_call(x, wq, cw, *, rounding: str, bm: int, bn: int,
                       out_dtype=jnp.float32):
    m, k = x.shape
    n = wq.shape[1]
    flops = 2 * m * n * k
    return pl.pallas_call(
        functools.partial(_qmm_fused_cx_kernel, rounding=rounding),
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=_compiler_params(("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, wq, cw)


def _qmm_call(x, wq, cx, cw, *, rounding: str, bm: int, bn: int, bk: int,
              out_dtype=jnp.float32):
    m, k = x.shape
    n = wq.shape[1]
    n_m, n_n, n_k = m // bm, n // bn, k // bk
    flops = 2 * m * n * k
    return pl.pallas_call(
        functools.partial(_qmm_kernel, rounding=rounding, n_k=n_k),
        grid=(n_m, n_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, wq, cx, cw)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_tiles(m: int, n: int, k: int):
    """Swept on TPU v5e over {f32,bf16} X, m in {2048,8192}, n=k=2048
    (scripts/tune_tiles.py protocol): (bm,bn,bk)=(512,2048,full-K) wins
    every cell — 300/306 TF/s f32, 285/318 TF/s bf16 — and, unlike the
    taller bm=1024 grids, never trips Mosaic's 16 MB scoped-VMEM limit
    (whose accounting does not follow a simple tile-byte sum; several
    analytically-smaller configs fail where this one compiles). Wide-N
    reuses each X tile across the whole N extent; full-K (capped so the
    int8 W tile stays <= 4 MB) removes the accumulation loop entirely for
    k <= 2048 and streams 2048-deep slabs above that. Tile sizes divide
    the padded dims as evenly as possible to bound padding waste."""
    bn = _round_up(_cdiv(n, _cdiv(n, 2048)), 128)
    bk_cap = max(512, (4 << 20) // bn)          # int8 W tile <= 4 MB
    bk = _round_up(_cdiv(k, _cdiv(k, bk_cap)), 128)
    bm = _round_up(_cdiv(m, _cdiv(m, 512)), 32)
    return bm, bn, bk


@functools.partial(jax.jit, static_argnames=("rounding", "out_dtype"))
def quantized_matmul_prequant_pallas(x, wq, cw, rounding: str = "nearest",
                                     out_dtype=jnp.float32):
    """x [m,k] f32/bf16 @ offline-quantized (wq int8 [k,n], cw [1,n]).

    Per-row activation scales are computed by XLA (one fused pass over X),
    then quantization + int8 MXU matmul + dequant run fused in one kernel.
    """
    m, k = x.shape
    n = wq.shape[1]

    bm, bn, bk = _pick_tiles(m, n, k)
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp, np_) != (k, n):
        wq = jnp.pad(wq, ((0, kp - k), (0, np_ - n)))
        cw = jnp.pad(cw, ((0, 0), (0, np_ - n)), constant_values=1.0)

    if kp == bk:
        # full-K tiles: absmax(X row) is computable inside the kernel —
        # skip the separate XLA pass (one whole HBM read of X) entirely.
        # K-padding is zeros, so in-kernel absmax == absmax of the true row.
        out = _qmm_fused_cx_call(x, wq, cw, rounding=rounding, bm=bm, bn=bn,
                                 out_dtype=out_dtype)
        return out[:m, :n]

    cx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                             keepdims=True), _EPS)
    out = _qmm_call(x, wq, cx, cw, rounding=rounding, bm=bm, bn=bn, bk=bk,
                    out_dtype=out_dtype)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("rounding",))
def quantized_matmul_pallas(x, w, rounding: str = "nearest"):
    """Dynamic path: quantizes BOTH operands (op_quantized_mm parity).

    W is column-quantized by XLA, not the Pallas kernel: the step is purely
    HBM-bound and XLA's fused two-pass reduction+cast measured 9.3 us at
    2048^2 vs 19.4 us for the full-K-block Pallas kernel (which is VMEM
    capacity-limited to narrow 512-column blocks)."""
    w = w.astype(jnp.float32)
    cw = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), _EPS)
    scaled = w * (QRANGE / cw)
    if rounding == "nearest":
        wq = jnp.clip(jnp.round(scaled), -QRANGE, QRANGE).astype(jnp.int8)
    else:
        wq = scaled.astype(jnp.int8)
    return quantized_matmul_prequant_pallas(x, wq, cw, rounding=rounding)
