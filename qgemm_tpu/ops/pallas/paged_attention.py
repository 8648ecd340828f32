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


def _unpack4(p, axis):
    """In-kernel int4 nibble unpack along the PAGE-ROW (sublane) axis
    (ops/kv_cache pack_int4_rows layout: first half of the page's
    positions in low nibbles, second half high; order preserved by the
    concat). int32 arithmetic shifts sign-extend both nibbles; the
    sublane concat is cheap — a lane-axis concat measured 1.9x kernel
    time (see ops/kv_cache module note)."""
    pi = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
    hi = jnp.right_shift(pi, 4)
    return jnp.concatenate([lo, hi], axis=axis).astype(jnp.int8)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _paged_kernel(pt_ref, len_ref, q_ref, kq_ref, kc_ref, vq_ref, vc_ref,
                  o_ref, m_scr, l_scr, acc_scr, *, page: int, n_pages: int,
                  scale: float, cd, bits: int = 8):
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
        kraw = kq_ref[0]                                # [H, rows, D]
        k = (_unpack4(kraw, 1) if bits == 4 else kraw).astype(cd)
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
        vraw = vq_ref[0]                                # [H, rows, D]
        v = (_unpack4(vraw, 1) if bits == 4 else vraw).astype(cd)
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
    rw = cache.kq.shape[2]                  # packed page rows (page or /2)

    q3 = q[:, :, 0].reshape(b, h, 1, d)                 # [B, H, 1, D]

    def kv_ix(b, j, pt, ln):
        # steps beyond a slot's RESIDENT pages clamp to its last resident
        # page: consecutive identical block indices make Pallas skip the
        # DMA entirely, so idle steps fetch nothing (previously each slot
        # paid one null-page fetch at the resident->unallocated transition)
        jr = jnp.minimum(j, jnp.maximum(ln[b] - 1, 0) // page)
        return (pt[b, jr], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                          # page_table, lengths
        grid=(b, n_pages),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda b, j, pt, ln: (b, 0, 0, 0)),
            pl.BlockSpec((1, h, rw, d), kv_ix),
            pl.BlockSpec((1, h, 1, page), kv_ix),
            pl.BlockSpec((1, h, rw, d), kv_ix),
            pl.BlockSpec((1, h, 1, page), kv_ix),
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
                          scale=scale, bits=cache.kv_bits,
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


RAGGED_UNROLL = 2


def _ragged_kernel(ss_ref, sp_ref, pt_ref, len_ref, q_ref, *rest, page: int,
                   scale: float, cd, unroll: int, groups: int = 1,
                   bits: int = 8):
    """Flat ragged grid: step t processes logical pages
    sp_ref[t] .. sp_ref[t]+unroll-1 of slot ss_ref[t]. Same math as the
    rectangular kernel; the differences are (a) the grid only has steps for
    pages some slot actually ALLOCATED (plus tail padding), instead of
    B x pages_per_slot — for mixed residencies the rectangular grid is
    mostly idle steps paying fixed overhead — and (b) each step streams
    ``unroll`` pages (one input-spec quartet per unrolled page), amortizing
    the fixed per-grid-step cost over more HBM traffic.

    The grid is (1, T): the leading dummy dimension works around a Mosaic
    backend abort for single-dimension grids with scalar-prefetch index
    maps under lax.scan (single calls were fine; r3 bisection).
    """
    kv_refs, (o_ref, m_scr, l_scr, acc_scr) = rest[:4 * unroll], rest[4 * unroll:]
    t = pl.program_id(1)
    b = ss_ref[t]
    j0 = sp_ref[t]
    length = len_ref[b]

    @pl.when(j0 == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for u in range(unroll):
        kq_ref, kc_ref, vq_ref, vc_ref = kv_refs[4 * u:4 * u + 4]
        j = j0 + u

        @pl.when(j * page < length)
        def _block(j=j, kq_ref=kq_ref, kc_ref=kc_ref, vq_ref=vq_ref,
                   vc_ref=vc_ref):
            hkv = kq_ref.shape[1]
            # per-KV-head unrolled MXU dots, like the dense decode kernel's
            # per-batch unroll (its r2 A/B: ~10% over one batched
            # dot_general); bounded program size at serving head counts.
            # GQA (groups > 1): each KV head's dot takes its group's
            # ``groups`` query rows at once — same g-row pattern the dense
            # kernel uses. (A single bulk astype of the whole page before
            # the head loop measured ~6% SLOWER — Mosaic schedules the
            # sliced converts into the dot pipeline better.)
            srows = []
            for hi in range(hkv):
                kb_raw = kq_ref[0, hi]                  # [rows, D]
                kb = (_unpack4(kb_raw, 0) if bits == 4
                      else kb_raw).astype(cd)
                qh = q_ref[0, hi * groups:(hi + 1) * groups, 0].astype(cd)
                srows.append(jax.lax.dot_general(
                    qh, kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))  # [G, page]
            s = jnp.concatenate(srows, axis=0) * scale  # [Hq, page]

            def rep(x):                                 # [Hkv, X] -> [Hq, X]
                return x if groups == 1 else jnp.repeat(x, groups, axis=0)

            s = s * (rep(kc_ref[0, :, 0, :]) * (1.0 / QRANGE))

            pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * page
            valid = pos < length
            s = jnp.where(valid, s, _NEG_INF)

            m_prev = m_scr[:]                           # [Hq, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[:] = m_new

            p = p * (rep(vc_ref[0, :, 0, :]) * (1.0 / QRANGE))
            orows = []
            for hi in range(hkv):
                vb_raw = vq_ref[0, hi]                  # [rows, D]
                vb = (_unpack4(vb_raw, 0) if bits == 4
                      else vb_raw).astype(cd)
                orows.append(jax.lax.dot_general(
                    p[hi * groups:(hi + 1) * groups].astype(cd), vb,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))  # [G, D]
            acc_scr[:] = acc_scr[:] * alpha + jnp.concatenate(orows, axis=0)

    # write when the slot's LAST resident page is in this step's unrolled
    # range; later steps for the slot (allocated-but-unfilled, or tail
    # padding with sp == pages_per_slot) skip compute above and never touch
    # o_ref, so the block flushed at the slot transition is the finished one.
    @pl.when(jnp.logical_and(j0 * page < length,
                             (j0 + unroll) * page >= length))
    def _finish():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@jax.jit
def paged_decode_attention_ragged(q, cache, lengths):
    """Ragged-grid paged decode: grid size = len(cache.step_slot) (static),
    one step per page some slot allocated.

    ``step_slot``/``step_page`` [T] int32 (host-built, see
    serving.paged_cache.build_step_tables): steps sorted by slot, logical
    page ascending within a slot in strides of RAGGED_UNROLL, every slot
    present with its page-0 step; tail padding has
    step_page == pages_per_slot (skips compute, DMA clamps to the slot's
    last resident page so no traffic). T changes only when page
    ALLOCATIONS change (admission/growth), not per decode step, so jit
    recompiles exactly when the engine already syncs page tables."""
    step_slot, step_page = cache.step_slot, cache.step_page
    b, hq, _, d = q.shape
    h = cache.kq.shape[1]                # pool (KV) heads
    groups = hq // h                     # GQA query groups per KV head
    page = cache.page_size
    scale = 1.0 / (d ** 0.5)
    t_steps = step_slot.shape[0]
    unroll = RAGGED_UNROLL

    q3 = q[:, :, 0].reshape(b, hq, 1, d)

    def kv_ix(u):
        def ix(z, t, ss, sp, pt, ln):
            bb = ss[t]
            # clamp beyond-resident pages (allocated-but-unfilled, odd tails
            # of an unrolled pair, tail padding) to the slot's last resident
            # page -> consecutive identical indices, Pallas skips the DMA
            jr = jnp.minimum(sp[t] + u, jnp.maximum(ln[bb] - 1, 0) // page)
            return (pt[bb, jr], 0, 0, 0)
        return ix

    rw = cache.kq.shape[2]               # packed page rows (page or /2)
    kv_specs, kv_args = [], []
    for u in range(unroll):
        kv_specs += [
            pl.BlockSpec((1, h, rw, d), kv_ix(u)),
            pl.BlockSpec((1, h, 1, page), kv_ix(u)),
            pl.BlockSpec((1, h, rw, d), kv_ix(u)),
            pl.BlockSpec((1, h, 1, page), kv_ix(u)),
        ]
        kv_args += [cache.kq, cache.kc, cache.vq, cache.vc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # step_slot, step_page, page_table, lengths
        grid=(1, t_steps),
        in_specs=[
            pl.BlockSpec((1, hq, 1, d),
                         lambda z, t, ss, sp, pt, ln: (ss[t], 0, 0, 0)),
        ] + kv_specs,
        out_specs=pl.BlockSpec((1, hq, d),
                               lambda z, t, ss, sp, pt, ln: (ss[t], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, 1), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ragged_kernel, page=page, scale=scale,
                          cd=jnp.float32 if _interpret() else jnp.bfloat16,
                          unroll=unroll, groups=groups,
                          bits=cache.kv_bits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        compiler_params=_compiler_params(("arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(step_slot.astype(jnp.int32), step_page.astype(jnp.int32),
      cache.page_table, lengths.astype(jnp.int32), q3, *kv_args)
    return out[:, :, None, :]


def _context_kernel(pt_ref, len_ref, off_ref, q_ref, *rest, page: int,
                    n_steps: int, scale: float, cd, rows_c: int,
                    rb_size: int, tight: bool, unroll: int):
    """Grid (B, row_blocks, n_pages): multi-row (chunk) attention over the
    paged cache with ONLINE softmax carried across pages — the blocked
    analogue of ``serving.paged_cache.paged_context_attention_reference``.
    Each step streams one contiguous (all-KV-heads, 128-position) K page +
    V page and adds a [Hkv, Rb, page] score tile; rows are a tile of the
    GQA-FOLDED chunk (row r is query head-group r // C at chunk position
    r % C, C = rows_c), so causal masking compares each KV position
    against off + r % C. The row-block grid dim caps VMEM at the 128-row
    budget for arbitrarily long chunks (an untiled 512-row GQA chunk
    measured a 28.6 MB scoped-vmem OOM), and when a block's rows sit in
    one GQA group (``tight``: C % Rb == 0) its page sweep STOPS at the
    block's last causal position — early row blocks skip both the compute
    and (via index-map clamping) the DMA for later pages. Each grid step
    processes ``unroll`` consecutive logical pages (one input-spec
    quartet per page, the ragged decode kernel's pattern): the first cut
    at one page/step measured ~2.8 us of fixed per-step cost against
    ~0.7 us of useful work."""
    kv_refs = rest[:4 * unroll]
    o_ref, m_scr, l_scr, acc_scr = rest[4 * unroll:]
    b = pl.program_id(0)
    rb = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = len_ref[b]
    off = off_ref[b]
    if tight:       # block's rows span positions [off + rb*Rb % C, bound]
        bound = off + jax.lax.rem(rb * rb_size, rows_c) + rb_size - 1
    else:           # block mixes GQA groups: spans all chunk positions
        bound = off + rows_c - 1

    for u in range(unroll):
        kq_ref, kc_ref, vq_ref, vc_ref = kv_refs[4 * u:4 * u + 4]
        j = t * unroll + u

        @pl.when(jnp.logical_and(j * page < length, j * page <= bound))
        def _block(j=j, kq_ref=kq_ref, kc_ref=kc_ref, vq_ref=vq_ref,
                   vc_ref=vc_ref):
            q = q_ref[0].astype(cd)                     # [Hkv, Rb, D]
            k = kq_ref[0].astype(cd)                    # [Hkv, page, D]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            s = s * (kc_ref[0, :, 0, :] * (1.0 / QRANGE))[:, None, :]

            # masks are head-independent: build them [Rb, page] and
            # broadcast (3D [Hkv, Rb, page] iota/compare temps measured a
            # scoped-vmem OOM at Hkv=16, Rb=256 — masks were most of it)
            mshape = (s.shape[1], s.shape[2])
            pos_k = jax.lax.broadcasted_iota(jnp.int32, mshape, 1) \
                + j * page
            r = jax.lax.broadcasted_iota(jnp.int32, mshape, 0) \
                + rb * rb_size
            pos_q = off + jax.lax.rem(r, rows_c)
            valid = jnp.logical_and(pos_k <= pos_q, pos_k < length)[None]
            s = jnp.where(valid, s, _NEG_INF)

            m_prev = m_scr[:]                           # [Hkv, Rb, 1]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=-1, keepdims=True))
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            m_scr[:] = m_new

            p = p * (vc_ref[0, :, 0, :] * (1.0 / QRANGE))[:, None, :]
            v = vq_ref[0].astype(cd)                    # [Hkv, page, D]
            acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
                p.astype(cd), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # [Hkv, Rb, D]

    @pl.when(t == n_steps - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


_CTX_ROW_BLOCK = 128
CTX_UNROLL = 2


def _ctx_row_block(rows: int) -> int:
    """Largest divisor of the folded row count <= the 128-row tile (one
    full MXU of rows; 256-row tiles at Hkv=16 sat at ~18.5 MB scoped vmem
    — over the 16 MB limit — and 512 untiled hit 28.6 MB)."""
    if rows <= _CTX_ROW_BLOCK:
        return rows
    for cand in range(_CTX_ROW_BLOCK, 0, -1):
        if rows % cand == 0:
            return cand
    return rows


def paged_context_vmem_ok(hkv: int, groups: int, c: int, d: int,
                          page: int) -> bool:
    """Scoped-VMEM gate for the context kernel AFTER row tiling: the
    dominant terms are the [Hkv, Rb, page] f32 score tiles (~3 live
    copies through the masking/softmax pipeline) and the q/acc row
    blocks. Empirically calibrated: Hkv=16, Rb=256, D=64, page=128
    compiles (~8.4 MB by this model), Rb=512 does not (28.6 MB actual).
    The model layer falls back to the gather oracle beyond it."""
    rb = _ctx_row_block(groups * c)
    tile_b = 3 * hkv * rb * page * 4
    row_b = hkv * rb * (2 + 4) * d
    kv_b = 4 * CTX_UNROLL * hkv * page * (d + 4)
    return tile_b + row_b + kv_b < 12 * 2 ** 20


def paged_context_attention(q, cache, lengths, offset):
    """Blocked paged context attention: q [B, Hq, C, D] rows at positions
    offset..offset+C-1 attend every cached position <= their own (the
    chunk's K/V already written — paged_write_prompt first). Same contract
    as paged_context_attention_reference, but the pages stream straight
    from their pool locations via scalar-prefetch index maps (no gathered
    [B, H, S, D] materialization in HBM) and masking/softmax fuse into the
    page loop. ``offset`` scalar or [B]. Caller gates on
    paged_context_vmem_ok.

    MEASURED CROSSOVER (v5e, Hkv=16, D=64, C=256, 18-page table): wins
    1.27x over the gather oracle when the resident length is short
    relative to the reserved table width (4/18 pages resident — the
    oracle gathers and computes over the FULL width, the causal page
    skip stops this kernel at the bound), loses ~2.5x when most of the
    width is resident (chunk attention is compute-bound and one big
    einsum feeds the MXU better than per-page 128-wide score tiles; page
    unrolling did not close the gap). The model layer therefore defaults
    to the oracle — see models.attention._paged_context_attend."""
    assert cache.kv_bits == 8, \
        "paged_context_attention is int8-pool-only; the int4-KV path " \
        "uses the gather reference (which unpacks) for context chunks"
    b, hq, c, d = q.shape
    h = cache.kq.shape[1]                # pool (KV) heads
    groups = hq // h
    rows = groups * c
    page = cache.page_size
    n_pages = cache.page_table.shape[1]
    scale = 1.0 / (d ** 0.5)
    rb_size = _ctx_row_block(rows)
    n_rb = rows // rb_size
    # tight causal bound needs each row block inside ONE GQA group
    tight = rb_size <= c and c % rb_size == 0
    unroll = min(CTX_UNROLL, n_pages)
    n_steps = -(-n_pages // unroll)

    off = jnp.broadcast_to(jnp.asarray(offset, jnp.int32).reshape(-1), (b,))
    qf = q.reshape(b, h, rows, d)        # GQA fold: row = gi * C + ci

    def kv_ix(u):
        def ix(z, rb, t, pt, ln, of):
            # clamp (a) beyond-length steps and (b) pages past the row
            # block's causal bound to the last needed page -> consecutive
            # identical indices, Pallas skips the DMA
            j = t * unroll + u
            jr = jnp.minimum(j, jnp.maximum(ln[z] - 1, 0) // page)
            if tight:
                bnd = of[z] + jax.lax.rem(rb * rb_size, c) + rb_size - 1
            else:
                bnd = of[z] + c - 1
            jr = jnp.minimum(jr, bnd // page)
            jr = jnp.minimum(jr, n_pages - 1)
            return (pt[z, jr], 0, 0, 0)
        return ix

    kv_specs, kv_args = [], []
    for u in range(unroll):
        kv_specs += [
            pl.BlockSpec((1, h, page, d), kv_ix(u)),
            pl.BlockSpec((1, h, 1, page), kv_ix(u)),
            pl.BlockSpec((1, h, page, d), kv_ix(u)),
            pl.BlockSpec((1, h, 1, page), kv_ix(u)),
        ]
        kv_args += [cache.kq, cache.kc, cache.vq, cache.vc]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # page_table, lengths, offsets
        grid=(b, n_rb, n_steps),
        in_specs=[
            pl.BlockSpec((1, h, rb_size, d),
                         lambda z, rb, t, pt, ln, of: (z, 0, rb, 0)),
        ] + kv_specs,
        out_specs=pl.BlockSpec((1, h, rb_size, d),
                               lambda z, rb, t, pt, ln, of: (z, 0, rb, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, rb_size, 1), jnp.float32),
            pltpu.VMEM((h, rb_size, 1), jnp.float32),
            pltpu.VMEM((h, rb_size, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_context_kernel, page=page, n_steps=n_steps,
                          scale=scale,
                          cd=jnp.float32 if _interpret() else jnp.bfloat16,
                          rows_c=c, rb_size=rb_size, tight=tight,
                          unroll=unroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, rows, d), q.dtype),
        compiler_params=_compiler_params(
            ("parallel", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )(cache.page_table, lengths.astype(jnp.int32), off, qf, *kv_args)
    return out.reshape(b, hq, c, d)


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)
