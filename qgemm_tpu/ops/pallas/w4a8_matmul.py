"""W4A8 fused Pallas kernel: int4 (group-quantized) weights x int8
(row-quantized) activations.

Beyond-reference capability in the LiquidGEMM / AWQ direction (PAPERS.md):
decode at large batch-small models is WEIGHT-HBM-bound — every generated
token streams the whole weight matrix — so int4 weights halve the
dominant traffic again over the int8 path (plus ~3% for the group scales)
at the cost of a coarser weight grid. Accuracy is recovered the standard
way: per-(K-group, column) absmax scales (group size 128) instead of
int8's single per-column scale.

Packing layout (chosen so the kernel never interleaves sublanes): group g
of 128 K-rows is stored as 64 packed int8 rows, the LOW nibble holding
rows [g*128, g*128+64) and the HIGH nibble rows [g*128+64, g*128+128) —
unpacking is two shifts plus one sublane-contiguous concat, no
row-interleave shuffle.

Compute: activations quantized per-row int8 in-kernel (same absmax scheme
as quantized_matmul.py), one int8xint8->int32 MXU dot PER GROUP, each
partial scaled by its group's f32 column scale into an f32 accumulator:

    out = cx/QR * sum_g (xq[:, g] @ unpack(wq4[g])) * cw[g] / W4R
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.quantized_matmul import (_EPS, _compiler_params,
                                                   _round_up)

QRANGE = 127.0
W4RANGE = 7.0
GROUP = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def pack_int4(q):
    """q int32/int8 [K, N] with values in [-7, 7], K a multiple of GROUP ->
    packed int8 [K/2, N]: per 128-row group, low nibbles hold the group's
    first 64 rows, high nibbles the last 64 (see module docstring)."""
    k, n = q.shape
    assert k % GROUP == 0, f"K={k} not a multiple of the group size {GROUP}"
    g = q.reshape(k // GROUP, 2, GROUP // 2, n).astype(jnp.int32)
    lo, hi = g[:, 0], g[:, 1]                       # [KG, 64, N] each
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return packed.reshape(k // 2, n).astype(jnp.int8)


def unpack_int4(packed):
    """Inverse of pack_int4 (jnp oracle; the kernel inlines the same ops).
    packed int8 [K/2, N] -> int8 [K, N] in [-7, 7]."""
    k2, n = packed.shape
    pi = packed.astype(jnp.int32)
    lo = (pi << 28) >> 28                           # sign-extended low nibble
    hi = pi >> 4                                    # arithmetic: signed high
    g = k2 // (GROUP // 2)
    lo = lo.reshape(g, GROUP // 2, n)
    hi = hi.reshape(g, GROUP // 2, n)
    return jnp.concatenate([lo, hi], axis=1).reshape(g * GROUP, n) \
        .astype(jnp.int8)


def _w4a8_kernel(x_ref, wp_ref, cw_ref, o_ref, acc_ref, *, n_k: int,
                 groups_per_slab: int):
    """Grid (M/bm, N/bn, K/bk): X slab quantized per-row int8 (scales from
    the in-kernel absmax when n_k == 1, else from the prefetched cx — the
    caller picks the variant), one MXU dot per 128-row group with the
    group's f32 column scale applied into the f32 accumulator."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    cx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), _EPS)
    xq = jnp.clip(jnp.round(x * (QRANGE / cx)), -QRANGE, QRANGE) \
        .astype(jnp.int8)

    half = GROUP // 2
    acc = jnp.zeros_like(acc_ref)
    for g in range(groups_per_slab):
        p = wp_ref[pl.ds(g * half, half), :].astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(jnp.int8)     # rows [gG, gG+64)
        hi = (p >> 4).astype(jnp.int8)              # rows [gG+64, gG+128)
        # one K=GROUP dot per group (two K=64 half-dots measured ~2x
        # slower at compute-bound shapes: K=64 underfills the 128-deep MXU)
        wg = jnp.concatenate([lo, hi], axis=0)      # [GROUP, bn]
        part = jax.lax.dot_general(
            xq[:, g * GROUP:(g + 1) * GROUP], wg,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * cw_ref[g:g + 1, :]
    # fold the row scale per slab (cx differs per slab when K is split:
    # each slab quantizes its rows on its own grid — exact, since the
    # per-slab dequant multiplies by the same cx used to quantize)
    acc_ref[:] += acc * (cx / (QRANGE * W4RANGE))

    @pl.when(kk == n_k - 1)
    def _epilogue():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_matmul_pallas(x, wp, cw, out_dtype=jnp.float32):
    """x [m, k] f32/bf16 @ int4-packed weights.

    wp int8 [k/2, n] (pack_int4 layout), cw f32 [k/GROUP, n] per-group
    column scales. Returns [m, n]. K must be a multiple of GROUP (pad X
    and weights with zero groups otherwise — zero rows contribute 0).
    """
    m, k = x.shape
    n = wp.shape[1]
    assert 2 * wp.shape[0] == _round_up(k, GROUP), \
        f"packed K {wp.shape[0]} != ceil({k}/2) by groups"

    bn = min(2048, _round_up(n, 128))
    bk = min(2048, _round_up(k, GROUP))
    bm = _round_up(min(512, _round_up(m, 32)), 32)
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    if (kp // 2, np_) != wp.shape:
        wp = jnp.pad(wp, ((0, kp // 2 - wp.shape[0]), (0, np_ - n)))
        cw = jnp.pad(cw, ((0, kp // GROUP - cw.shape[0]), (0, np_ - n)),
                     constant_values=1.0)

    n_k = kp // bk
    gps = bk // GROUP
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, n_k=n_k, groups_per_slab=gps),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gps, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel",
                                          "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + kp * np_ // 2
            + (kp // GROUP) * np_ * 4 + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x, wp, cw)
    return out[:m, :n]
