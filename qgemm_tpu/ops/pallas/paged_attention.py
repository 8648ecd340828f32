"""Paged decode attention: the kernel walks each slot's page table with
SCALAR PREFETCH — block indices are computed from the page-table entries in
SMEM, so the pages are DMA'd straight from their scattered pool locations
into VMEM with no gather materialization (the jnp oracle materializes the
gathered [B, H, S, D] cache in HBM first — an extra full read+write).

Grid (B, H, pages_per_slot), page index innermost carrying the online
softmax state; each step streams one (128-position, int8) K page + V page
for one (slot, head), applies the per-position absmax scales, masks by the
slot's true length, and accumulates. Pages beyond a slot's allocation point
at the reserved null page (0) and are masked out; consecutive identical
block indices skip the redundant DMA.

No reference counterpart (the reference has no KV cache at all); this is
the TPU-native analogue of vLLM's PagedAttention CUDA kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QRANGE = 127.0
_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _paged_kernel(pt_ref, len_ref, q_ref, kq_ref, kc_ref, vq_ref, vc_ref,
                  o_ref, m_scr, l_scr, acc_scr, *, page: int, n_pages: int,
                  scale: float, cd):
    j = pl.program_id(2)
    b = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = len_ref[b]

    @pl.when(j * page < length)
    def _block():
        q = q_ref[0, 0].astype(cd)                      # [1, D] (padded row)
        k = kq_ref[0, 0].astype(cd)                     # [page, D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s * (kc_ref[0, 0, :, 0][None, :] * (1.0 / QRANGE))

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * page
        valid = pos < length
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_scr[:]                               # [1, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_new

        p = p * (vc_ref[0, 0, :, 0][None, :] * (1.0 / QRANGE))
        v = vq_ref[0, 0].astype(cd)                     # [page, D]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(cd), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == n_pages - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[:] /
                       jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@jax.jit
def paged_decode_attention(q, cache, lengths):
    """q [B, H, 1, D]; cache: serving.paged_cache.PagedKVCache;
    lengths [B] int32. Returns [B, H, 1, D] in q's dtype."""
    b, h, _, d = q.shape
    page = cache.page_size
    n_pages = cache.page_table.shape[1]
    scale = 1.0 / (d ** 0.5)

    q3 = q[:, :, 0][:, :, None, :]                      # [B, H, 1, D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                          # page_table, lengths
        grid=(b, h, n_pages),
        in_specs=[
            pl.BlockSpec((1, 1, 1, d), lambda b, h, j, pt, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, page, d),
                         lambda b, h, j, pt, ln: (h, pt[b, j], 0, 0)),
            pl.BlockSpec((1, 1, page, 1),
                         lambda b, h, j, pt, ln: (h, pt[b, j], 0, 0)),
            pl.BlockSpec((1, 1, page, d),
                         lambda b, h, j, pt, ln: (h, pt[b, j], 0, 0)),
            pl.BlockSpec((1, 1, page, 1),
                         lambda b, h, j, pt, ln: (h, pt[b, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, d),
                               lambda b, h, j, pt, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_kernel, page=page, n_pages=n_pages,
                          scale=scale,
                          # bf16 dots on the MXU; f32 on CPU interpret so
                          # the oracle comparison is exact
                          cd=jnp.float32 if _interpret() else jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), q.dtype),
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(cache.page_table, lengths.astype(jnp.int32), q3,
      cache.kq, cache.kc, cache.vq, cache.vc)
    return out


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)
