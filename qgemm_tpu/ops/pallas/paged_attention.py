"""Paged decode attention: the kernel walks each slot's page table with
SCALAR PREFETCH — block indices are computed from the page-table entries in
SMEM, so the pages are DMA'd straight from their scattered pool locations
into VMEM with no gather materialization (the jnp oracle materializes the
gathered [B, H, S, D] cache in HBM first — an extra full read+write).

Grid (B, pages_per_slot), page index innermost carrying the online
softmax state; each step streams one contiguous (all-heads, 128-position,
int8) K page + V page for one slot, applies the per-position absmax
scales, masks by the slot's true length, and accumulates with batched
dots over the head axis. Pages beyond a slot's allocation point
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
    """Grid (B, n_pages): one step processes a whole page for ALL heads at
    once (batched dots over H). Folding H into the block is what makes the
    kernel fast: the r2 first cut gridded (B, H, n_pages) and its ~0.3 us
    fixed cost per grid step dominated an 8x slowdown vs the dense kernel;
    per-(slot,page) steps move H x page x D bytes each — enough work to
    hide the step overhead. The pool is PAGE-MAJOR ([P, H, page, D]) so
    each step's fetch is one contiguous block (H-major strided fetches
    measured a further 2.5x slowdown)."""
    j = pl.program_id(1)
    b = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = len_ref[b]

    @pl.when(j * page < length)
    def _block():
        q = q_ref[0].astype(cd)                         # [H, 1, D]
        k = kq_ref[0].astype(cd)                        # [H, page, D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0] * scale  # [H, page]
        s = s * (kc_ref[0, :, 0, :] * (1.0 / QRANGE))

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * page
        valid = pos < length
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_scr[:]                               # [H, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_new

        p = p * (vc_ref[0, :, 0, :] * (1.0 / QRANGE))
        v = vq_ref[0].astype(cd)                        # [H, page, D]
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p[:, None, :].astype(cd), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0]   # [H, D]

    @pl.when(j == n_pages - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@jax.jit
def paged_decode_attention(q, cache, lengths):
    """q [B, H, 1, D]; cache: serving.paged_cache.PagedKVCache;
    lengths [B] int32. Returns [B, H, 1, D] in q's dtype."""
    b, h, _, d = q.shape
    page = cache.page_size
    n_pages = cache.page_table.shape[1]
    scale = 1.0 / (d ** 0.5)

    q3 = q[:, :, 0].reshape(b, h, 1, d)                 # [B, H, 1, D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                          # page_table, lengths
        grid=(b, n_pages),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda b, j, pt, ln: (b, 0, 0, 0)),
            pl.BlockSpec((1, h, page, d),
                         lambda b, j, pt, ln: (pt[b, j], 0, 0, 0)),
            pl.BlockSpec((1, h, 1, page),
                         lambda b, j, pt, ln: (pt[b, j], 0, 0, 0)),
            pl.BlockSpec((1, h, page, d),
                         lambda b, j, pt, ln: (pt[b, j], 0, 0, 0)),
            pl.BlockSpec((1, h, 1, page),
                         lambda b, j, pt, ln: (pt[b, j], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda b, j, pt, ln: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_kernel, page=page, n_pages=n_pages,
                          scale=scale,
                          # bf16 dots on the MXU; f32 on CPU interpret so
                          # the oracle comparison is exact
                          cd=jnp.float32 if _interpret() else jnp.bfloat16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        compiler_params=_compiler_params(("parallel", "arbitrary")),
        interpret=_interpret(),
    )(cache.page_table, lengths.astype(jnp.int32), q3,
      cache.kq, cache.kc, cache.vq, cache.vc)
    return out[:, :, None, :]


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)
