"""Paged KV cache: block-table indirection over a fixed page pool.

Production-serving extension beyond the slot-contiguous cache (reference
has no KV cache at all; BASELINE's north star is continuous batching).
The slot cache allocates ``max_slots x max_seq_len`` up front — HBM scales
with the WORST case. Here the cache is a pool of fixed-size pages plus a
per-slot page table, and pages are allocated on demand as sequences grow:
HBM scales with the tokens actually resident, so the same chip holds more
concurrent slots (or longer worst-case contexts) for mixed-length traffic.

TPU-native design constraints drive the layout:
  * everything is static-shape under jit — the pool ``[P, H, page, D]``
    and page tables ``[B, pages_per_slot]`` never change shape; occupancy
    is data (the allocator is host-side bookkeeping, like the scheduler);
  * page size is 128 (the lane-tile row count), so a page is exactly one
    kernel block and the Pallas decode kernel walks the page table with
    scalar prefetch — no gather materialization;
  * K/V are stored int8 with per-position absmax scales (the int8-KV
    serving path; ops/kv_cache.py semantics).

``paged_attention_reference`` is the jnp oracle (gathers pages, masked
attention); the fused kernel lives in ops/pallas/paged_attention.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops.kv_cache import (QRANGE, pack_int4_rows,
                                    quantize_kv as quantize_rows,
                                    quantize_kv_int4, unpack_int4_rows)

PAGE_SIZE = 128


@partial(jax.tree_util.register_dataclass,
         data_fields=("kq", "kc", "vq", "vc", "page_table", "step_slot",
                      "step_page"),
         meta_fields=("page_size", "kv_bits"))
@dataclass
class PagedKVCache:
    """One layer's paged cache.

    kq/vq: int8 pools [P, H, page, D]; kc/vc: f32 scales [P, H, 1, page]
    — PAGE-MAJOR, and the scales keep positions on the LANE axis (a
    [..., page, 1] layout puts one float on each 128-lane row: its DMA
    moves 128x the bytes).
    page_table: int32 [B, pages_per_slot] — logical page j of slot b lives
    in physical page page_table[b, j]. Unallocated entries hold 0 and are
    never read (attention masks strictly by per-slot length).
    step_slot/step_page: optional int32 [T] ragged-grid tables
    (``build_step_tables``) — when present, decode uses the flat ragged
    kernel whose grid has one step per ALLOCATED page instead of
    B x pages_per_slot (mostly-idle steps for mixed residencies).
    """
    kq: jax.Array
    kc: jax.Array
    vq: jax.Array
    vc: jax.Array
    page_table: jax.Array
    step_slot: Optional[jax.Array] = None
    step_page: Optional[jax.Array] = None
    page_size: int = PAGE_SIZE
    # 4 = int4-packed pools: two nibbles per byte pairing PAGE POSITIONS
    # (row r low nibble, row r + page/2 high — ops/kv_cache module note;
    # pools become [P, H, page/2, D]); halves cache HBM again over int8.
    # Scales stay full-width [P, H, 1, page] in the int8 convention
    # (pre-scaled), so readers' math is bit-for-bit the same — only
    # writers and the kernels' sublane unpack branch.
    kv_bits: int = 8

    @property
    def n_pages(self) -> int:
        return self.kq.shape[0]


def build_step_tables(alloc_counts, pages_per_slot: int, bucket: int = 16,
                      pages_per_step: Optional[int] = None):
    """Host-side ragged-grid tables from per-slot ALLOCATED page counts.

    Returns (step_slot, step_page) int32 numpy arrays of length T = the
    total step count rounded up to ``bucket`` (bounds distinct jit shapes).
    One step covers ``pages_per_step`` consecutive logical pages (default:
    the kernel's RAGGED_UNROLL), so step_page strides by it. Every slot
    contributes at least its page-0 step (a slot with no pages still needs
    one so the kernel writes its — garbage, host-masked — output block);
    tail padding repeats the last slot with step_page == pages_per_slot,
    which the kernel treats as always-invalid (skips compute, clamps the
    DMA index to the slot's last resident page).
    """
    if pages_per_step is None:
        from qgemm_tpu.ops.pallas.paged_attention import RAGGED_UNROLL
        pages_per_step = RAGGED_UNROLL
    ss, sp = [], []
    for b, n in enumerate(alloc_counts):
        n = max(1, int(n))
        pages = range(0, n, pages_per_step)
        ss.extend([b] * len(pages))
        sp.extend(pages)
    t = -(-len(ss) // bucket) * bucket
    pad = t - len(ss)
    ss.extend([ss[-1]] * pad)
    sp.extend([pages_per_slot] * pad)
    return np.asarray(ss, np.int32), np.asarray(sp, np.int32)


def init_paged_cache(n_heads: int, head_dim: int, n_pages: int,
                     batch: int, pages_per_slot: int,
                     page_size: int = PAGE_SIZE,
                     kv_bits: int = 8) -> PagedKVCache:
    rw = page_size if kv_bits == 8 else page_size // 2   # packed rows
    z8 = lambda: jnp.zeros((n_pages, n_heads, rw, head_dim), jnp.int8)
    zf = lambda: jnp.ones((n_pages, n_heads, 1, page_size), jnp.float32)
    return PagedKVCache(
        kq=z8(), kc=zf(), vq=z8(), vc=zf(),
        page_table=jnp.zeros((batch, pages_per_slot), jnp.int32),
        page_size=page_size, kv_bits=kv_bits)


class PageAllocator:
    """Host-side page freelist + PREFIX CACHE (mirrors the scheduler
    split: device arrays are static, occupancy is host bookkeeping).
    Page 0 is reserved as the null page so fresh page tables are valid.

    Prefix caching (vLLM-style, all host-side): a full 128-token prompt
    page's content is a pure function of its token chunk and positions
    (K/V at position p depend only on token p — not on the attention
    context), so identical prompt prefixes across requests can SHARE
    physical pages. Pages are refcounted; published pages whose refcount
    drops to zero go to an LRU cache instead of the free list, so a later
    request with the same prefix (the system-prompt pattern) reuses them
    with zero new allocation — they are only evicted when the free list
    runs dry."""

    def __init__(self, n_pages: int, batch: int, pages_per_slot: int):
        from collections import OrderedDict
        self.free: List[int] = list(range(n_pages - 1, 0, -1))  # 0 reserved
        self.slot_pages: List[List[int]] = [[] for _ in range(batch)]
        self.pages_per_slot = pages_per_slot
        self.refs = {}          # page -> live refcount
        self.page_hash = {}     # published page -> chain hash
        self.prefix_map = {}    # chain hash -> page
        self.cached = OrderedDict()  # refcount-0 published pages (LRU)
        self.prefix_hits = 0

    @property
    def n_free(self) -> int:
        """Allocatable pages: the free list plus evictable cached pages."""
        return len(self.free) + len(self.cached)

    def pages_needed(self, n_tokens: int, page_size: int = PAGE_SIZE) -> int:
        return -(-n_tokens // page_size)

    def _take_page(self) -> int:
        if self.free:
            return self.free.pop()
        if self.cached:                     # evict the LRU cached prefix
            page, _ = self.cached.popitem(last=False)
            h = self.page_hash.pop(page)
            del self.prefix_map[h]
            return page
        raise RuntimeError("page pool exhausted")

    def grow(self, slot: int, n_tokens: int,
             page_size: int = PAGE_SIZE) -> List[tuple]:
        """Ensure ``slot`` has pages for ``n_tokens``; returns the list of
        (logical_index, physical_page) entries newly allocated (to be
        written into the device page table). Raises if the pool or the
        slot's table is exhausted."""
        need = self.pages_needed(n_tokens, page_size)
        have = len(self.slot_pages[slot])
        if need > self.pages_per_slot:
            raise RuntimeError(f"slot {slot}: page table full ({need})")
        # ATOMIC: check the whole allocation up front so exhaustion never
        # leaves pages in slot_pages that the caller's device table missed
        # (the over-commit tier preempts and RETRIES after this raise)
        if need - have > self.n_free:
            raise RuntimeError("page pool exhausted")
        new = []
        while len(self.slot_pages[slot]) < need:
            j = len(self.slot_pages[slot])
            p = self._take_page()
            self.refs[p] = 1
            self.slot_pages[slot].append(p)
            new.append((j, p))
        return new

    def acquire_shared(self, slot: int, h) -> Optional[int]:
        """If a page published under chain-hash ``h`` exists, attach it as
        the slot's next logical page (refcount++; resurrects it from the
        LRU cache if idle) and return its id; else None."""
        page = self.prefix_map.get(h)
        if page is None:
            return None
        if page in self.cached:
            del self.cached[page]
        self.refs[page] = self.refs.get(page, 0) + 1
        self.slot_pages[slot].append(page)
        self.prefix_hits += 1
        return page

    def peek_prefix(self, hashes) -> int:
        """Length of the longest CONTIGUOUS published prefix of the hash
        chain (no acquisition — safe before admission checks)."""
        n = 0
        for h in hashes:
            if h not in self.prefix_map:
                break
            n += 1
        return n

    def peek_prefix_cached(self, hashes, n_match: int) -> int:
        """How many of the first ``n_match`` matched pages are currently
        IDLE in the LRU cache. Acquiring those removes them from the
        allocatable count (``n_free`` includes cached pages), so admission
        backpressure math must subtract them."""
        return sum(1 for h in hashes[:n_match]
                   if self.prefix_map[h] in self.cached)

    def reset_prefix_cache(self) -> None:
        """Drop every published mapping and return idle cached pages to the
        free list (engine decode-fault recovery: rebuilt pools invalidate
        all cached content)."""
        self.free.extend(self.cached.keys())
        self.cached.clear()
        self.prefix_map.clear()
        self.page_hash.clear()

    def publish(self, slot: int, j: int, h) -> None:
        """Register the slot's logical page ``j`` under chain-hash ``h`` so
        future admissions can share it. First publisher wins."""
        page = self.slot_pages[slot][j]
        if h in self.prefix_map or page in self.page_hash:
            return
        self.prefix_map[h] = page
        self.page_hash[page] = h

    def release(self, slot: int) -> None:
        for p in self.slot_pages[slot]:
            self.refs[p] = self.refs.get(p, 1) - 1
            if self.refs[p] <= 0:
                del self.refs[p]
                if p in self.page_hash:
                    self.cached[p] = None   # keep for future prefix hits
                else:
                    self.free.append(p)
        self.slot_pages[slot] = []


@jax.jit
def paged_write_step(cache: PagedKVCache, k_new, v_new, positions):
    """Write one decode step's K/V. k_new/v_new [B, H, 1, D];
    positions [B] (the position being written). The page for the position
    must already be allocated (engine grows tables before the step)."""
    b = k_new.shape[0]
    ps = cache.page_size
    logical = positions // ps
    phys = jnp.take_along_axis(cache.page_table, logical[:, None],
                               axis=1)[:, 0]                    # [B]
    off = positions % ps

    qrows = quantize_kv_int4 if cache.kv_bits == 4 else quantize_rows
    kq, kc = qrows(k_new[:, :, 0, :])                           # [B, H, D]
    vq, vc = qrows(v_new[:, :, 0, :])
    del b
    hp = cache.page_size // 2

    def scat(pool, val):
        if cache.kv_bits == 4:
            # position pairs share a byte-row (sublane packing): merge the
            # written position's nibble into the resident byte (read-
            # modify-write — decode writes one row per slot, so this is a
            # [B, H, D] gather + bitwise + scatter, negligible next to the
            # attention read)
            row = off % hp
            is_hi = (off >= hp)[:, None, None]
            old = pool[phys, :, row].astype(jnp.int32)          # [B, H, D]
            nib = val.astype(jnp.int32) & 0xF
            merged = jnp.where(is_hi, (old & 0x0F) | (nib << 4),
                               (old & ~jnp.int32(0xF)) | nib)
            # wrap to int8 two's complement explicitly
            merged = jnp.right_shift(jnp.left_shift(merged, 24), 24)
            return pool.at[phys, :, row].set(merged.astype(jnp.int8),
                                             mode="drop")
        # values pool [P, H, page, D]; write val [B, H, D] at (phys_b, :, off_b)
        # (advanced indices split by a slice put the B axis first)
        return pool.at[phys, :, off].set(val, mode="drop")

    def scat_scale(pool, val):
        # scales pool [P, H, 1, page]; write val [B, H] at (phys_b, :, 0, off_b)
        return pool.at[phys, :, 0, off].set(val[..., 0], mode="drop")

    from dataclasses import replace
    return replace(cache, kq=scat(cache.kq, kq), kc=scat_scale(cache.kc, kc),
                   vq=scat(cache.vq, vq), vc=scat_scale(cache.vc, vc))


def paged_write_prompt(cache: PagedKVCache, slot, k_prompt, v_prompt,
                       first_page: int = 0):
    """Prefill: write a (bucket-padded) prompt SEGMENT's K/V for one slot,
    starting at logical page ``first_page`` (0 = whole prompt; >0 = the
    suffix segment of a prefix-cache-skipped admission).
    k_prompt/v_prompt [H, S_bucket, D] (S_bucket a multiple of page_size).
    The whole bucket is written; rows beyond the true prompt length are
    junk-but-never-read (attention masks strictly by per-slot length)."""
    ps = cache.page_size
    s_bucket = k_prompt.shape[1]
    n_log = s_bucket // ps
    qrows = quantize_kv_int4 if cache.kv_bits == 4 else quantize_rows
    kq, kc = qrows(k_prompt)                                    # [H, S, D]
    vq, vc = qrows(v_prompt)

    def write_page(cache_arrays, j):
        kq_p, kc_p, vq_p, vc_p = cache_arrays
        phys = cache.page_table[slot, j + first_page]
        if cache.kv_bits == 4:
            sl = lambda x: pack_int4_rows(jax.lax.dynamic_slice_in_dim(
                x, j * ps, ps, axis=1), axis=1)
        else:
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, j * ps, ps,
                                                        axis=1)
        put = lambda pool, val: jax.lax.dynamic_update_slice(
            pool, val[None], (phys, 0, 0, 0))
        # scales [H, page, 1] -> lane-major [1, H, 1, page] (FULL page
        # width in both bit modes)
        sl_s = lambda x: jax.lax.dynamic_slice_in_dim(x, j * ps, ps, axis=1)
        put_s = lambda pool, val: jax.lax.dynamic_update_slice(
            pool, val[..., 0][:, None][None], (phys, 0, 0, 0))
        return (put(kq_p, sl(kq)), put_s(kc_p, sl_s(kc)),
                put(vq_p, sl(vq)), put_s(vc_p, sl_s(vc))), None

    (kq_p, kc_p, vq_p, vc_p), _ = jax.lax.scan(
        write_page, (cache.kq, cache.kc, cache.vq, cache.vc),
        jnp.arange(n_log))
    from dataclasses import replace
    return replace(cache, kq=kq_p, kc=kc_p, vq=vq_p, vc=vc_p)


def paged_write_prompt_batch(cache: PagedKVCache, k_prompts, v_prompts):
    """Prefill ALL slots at once: k/v_prompts [B, H, S_bucket, D] with
    S_bucket a multiple of page_size. One scatter per logical page (the
    per-slot variant inlines B x layers scans — too big a program for a
    whole-model prefill). Slots whose table entry is 0 write the null page
    (harmless: never read)."""
    ps = cache.page_size
    n_log = k_prompts.shape[2] // ps
    qrows = quantize_kv_int4 if cache.kv_bits == 4 else quantize_rows
    kq, kc = qrows(k_prompts)                          # [B, H, S, D]
    vq, vc = qrows(v_prompts)
    kq_p, kc_p, vq_p, vc_p = cache.kq, cache.kc, cache.vq, cache.vc
    pk = (lambda x: pack_int4_rows(x, axis=2)) if cache.kv_bits == 4 \
        else (lambda x: x)
    for j in range(n_log):
        phys = cache.page_table[:, j]                  # [B]
        sl = slice(j * ps, (j + 1) * ps)
        kq_p = kq_p.at[phys].set(pk(kq[:, :, sl]), mode="drop")
        vq_p = vq_p.at[phys].set(pk(vq[:, :, sl]), mode="drop")
        # scales pool is lane-major [P, H, 1, page]
        kc_p = kc_p.at[phys].set(
            kc[:, :, sl, 0][:, :, None, :], mode="drop")
        vc_p = vc_p.at[phys].set(
            vc[:, :, sl, 0][:, :, None, :], mode="drop")
    from dataclasses import replace
    return replace(cache, kq=kq_p, kc=kc_p, vq=vq_p, vc=vc_p)


def gather_slot_kv(cache: PagedKVCache, max_pages: Optional[int] = None):
    """jnp oracle: materialize each slot's logical K/V [B, H, S_max, D]
    (+ scales) by gathering its pages. S_max = pages_per_slot * page_size
    unless ``max_pages`` caps it."""
    pt = cache.page_table if max_pages is None \
        else cache.page_table[:, :max_pages]

    def gather(pool):
        # values pool [P, H, rows, D] -> [B, H, n_log*page, D]
        # (int4 pools unpack PER PAGE along the row axis after the
        # gather; scales are pre-scaled to the int8 convention so
        # downstream math is unchanged)
        g = pool[pt]                         # [B, n_log, H, rows, D]
        if cache.kv_bits == 4:
            g = unpack_int4_rows(g, axis=3)  # rows -> page
        b, n, h, p, d = g.shape
        return g.transpose(0, 2, 1, 3, 4).reshape(b, h, n * p, d)

    def gather_scale(pool):
        # scales pool [P, H, 1, page] -> [B, H, n_log*page, 1]
        g = pool[pt][:, :, :, 0]             # [B, n_log, H, page]
        b, n, h, p = g.shape
        return g.transpose(0, 2, 1, 3).reshape(b, h, n * p)[..., None]

    return (gather(cache.kq), gather_scale(cache.kc),
            gather(cache.vq), gather_scale(cache.vc))


def paged_context_attention_reference(q, cache: PagedKVCache, lengths,
                                      offset):
    """Multi-row (chunk/prefill) attention over the paged cache: q
    [B, Hq, C, D] rows at positions offset..offset+C-1 attend every cached
    position <= their own (causal across the prefix AND within the chunk —
    the chunk's K/V must already be written). ``offset`` scalar or [B].
    The prefix-cache compute-skip path: a suffix chunk attends the SHARED
    prefix pages without recomputing them. jnp gather oracle — the
    CPU/test reference for ops.pallas.paged_attention.
    paged_context_attention (the blocked kernel the model layer uses on
    TPU) and the fallback for chunks beyond its VMEM gate."""
    kq, kc, vq, vc = gather_slot_kv(cache)
    b, hq, c, d = q.shape
    hkv = kq.shape[1]
    g = hq // hkv
    s = kq.shape[2]
    off = jnp.asarray(offset).reshape(-1)
    if off.shape[0] == 1:
        off = jnp.broadcast_to(off, (b,))
    cd = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    qg = q.reshape(b, hkv, g * c, d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qg.astype(cd),
                        kq.astype(cd)).astype(jnp.float32)
    scores = scores * (kc[..., 0] / (QRANGE * d ** 0.5))[:, :, None, :]
    kj = jnp.arange(s)[None, None, None, :]
    row_pos = jnp.tile(jnp.arange(c), g)[None, None, :, None] \
        + off[:, None, None, None]
    valid = jnp.logical_and(kj <= row_pos,
                            kj < lengths[:, None, None, None])
    scores = jnp.where(valid, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    p = p * (vc[..., 0] * (1.0 / QRANGE))[:, :, None, :]
    out = jnp.einsum("bhqk,bhkv->bhqv", p.astype(cd),
                     vq.astype(cd)).astype(q.dtype)
    return out.reshape(b, hq, c, out.shape[-1])


def paged_attention_reference(q, cache: PagedKVCache, lengths,
                              max_pages: Optional[int] = None):
    """Oracle decode attention over the paged cache. q [B, Hq, 1, D] with
    Hq a multiple of the pool's head count (GQA: query heads
    i*g..(i+1)*g-1 share pool head i); lengths [B] (#valid positions per
    slot). Returns [B, Hq, 1, D]."""
    kq, kc, vq, vc = gather_slot_kv(cache, max_pages)
    b, hq, _, d = q.shape
    hkv = kq.shape[1]
    g = hq // hkv
    s = kq.shape[2]
    cd = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    qg = q[:, :, 0].reshape(b, hkv, g, d)       # group folds into the row axis
    scores = jnp.einsum("bhgd,bhkd->bhgk", qg.astype(cd),
                        kq.astype(cd)).astype(jnp.float32)
    scores = scores * (kc[..., 0] / (QRANGE * d ** 0.5))[:, :, None, :]
    kj = jnp.arange(s)[None, None, None, :]
    scores = jnp.where(kj < lengths[:, None, None, None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    p = p * (vc[..., 0] * (1.0 / QRANGE))[:, :, None, :]
    out = jnp.einsum("bhgk,bhkv->bhgv", p.astype(cd),
                     vq.astype(cd)).astype(q.dtype)
    return out.reshape(b, hq, d)[:, :, None, :]
