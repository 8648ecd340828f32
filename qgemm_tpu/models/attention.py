"""Attention modules.

``Attention`` is the reference-parity single-head layer
(src/modules/attention.cuh:11-71): Q/K/V projections (:54-56), scores
QK^T/sqrt(d_k) (:58-65), softmax (:68), context = A V (:69); no bias, no
output projection (W_O lives in the transformer block, as in
src/transformer.cu:52). The 3-argument ``(x_q, x_kv)`` call implements the
*intended* self/cross API used by src/transformer.cu:37,132 (the checked-in
2-arg signature doesn't compile against it — SURVEY.md §1 L5 note). Beyond
the reference we add the standard causal mask option (the reference decoder
has none, a known gap).

``MultiHeadAttention`` is the production module: batched heads in one tensor
(the reference loops heads on the host and concatenates via D2H/H2D round
trips per block, transformer.cu:33-50 — on TPU heads are just a reshaped
axis), fused output projection, optional int8-quantized projections, and an
optional KV-cache for autoregressive decoding.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from qgemm_tpu.models.linear import Linear
from qgemm_tpu.ops.softmax import softmax
from qgemm_tpu.utils.prng import uniform_init


def scaled_dot_product_attention(q, k, v, causal: bool = False,
                                 mask: Optional[jax.Array] = None,
                                 kv_offset: int | jax.Array = 0):
    """q [..., Sq, d], k [..., Sk, d], v [..., Sk, dv] -> [..., Sq, dv].

    ``kv_offset`` shifts the causal comparison for KV-cache decoding (query
    position i attends to kv positions <= i + offset).
    """
    d = q.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    if causal:
        sq, sk = scores.shape[-2], scores.shape[-1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0) + kv_offset
        kj = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        scores = jnp.where(kj <= qi, scores, jnp.asarray(-1e30, scores.dtype))
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1e30, scores.dtype))
    return jnp.einsum("...qk,...kv->...qv", softmax(scores, axis=-1), v)


@partial(jax.tree_util.register_dataclass,
         data_fields=("w_q", "w_k", "w_v"), meta_fields=())
@dataclass
class Attention:
    """Single-head scaled dot-product attention, reference-parity."""

    w_q: jax.Array  # [d_model, d_k]
    w_k: jax.Array  # [d_model, d_k]
    w_v: jax.Array  # [d_model, d_v]

    @classmethod
    def init(cls, key, d_model: int, d_k: int, d_v: int,
             dtype=jnp.float32) -> "Attention":
        # init ±1/sqrt(d_k) (attention.cuh:40-45)
        bound = 1.0 / (d_k ** 0.5)
        kq, kk, kv = jax.random.split(key, 3)
        return cls(w_q=uniform_init(kq, (d_model, d_k), bound, dtype),
                   w_k=uniform_init(kk, (d_model, d_k), bound, dtype),
                   w_v=uniform_init(kv, (d_model, d_v), bound, dtype))

    def __call__(self, x_q, x_kv=None, causal: bool = False):
        """Self-attention when x_kv is None; cross-attention otherwise
        (queries from x_q, keys/values from x_kv — transformer.cu:132)."""
        if x_kv is None:
            x_kv = x_q
        q = x_q @ self.w_q
        k = x_kv @ self.w_k
        v = x_kv @ self.w_v
        return scaled_dot_product_attention(q, k, v, causal=causal)


@partial(jax.tree_util.register_dataclass,
         data_fields=("wqkv_q", "wqkv_k", "wqkv_v", "w_o"),
         meta_fields=("n_heads", "n_kv_heads"))
@dataclass
class MultiHeadAttention:
    """Batched multi-head attention with output projection.

    Replaces the reference's host-side per-head loop + concat
    (transformer.cu:33-54) with a single reshaped-axis computation; the
    output projection W_O (transformer.cu:52-54) is part of the module.
    Projections may be Linear or QuantizedLinear (int8 serving path).

    ``n_kv_heads < n_heads`` is grouped-query attention (GQA): K/V project
    to n_kv_heads and each group of n_heads/n_kv_heads query heads shares
    one KV head — the KV cache (the decode-time HBM cost) shrinks by the
    group factor. Query heads i*g..(i+1)*g-1 attach to KV head i.
    """

    wqkv_q: object  # Linear | QuantizedLinear [d_model, d_model]
    wqkv_k: object  # [d_model, n_kv_heads * head_dim]
    wqkv_v: object
    w_o: object     # Linear | QuantizedLinear [d_model, d_model]
    n_heads: int
    n_kv_heads: int = 0      # 0 = n_heads (MHA)

    @classmethod
    def init(cls, key, d_model: int, n_heads: int, bias: bool = False,
             dtype=jnp.float32, n_kv_heads: int = 0) -> "MultiHeadAttention":
        assert d_model % n_heads == 0
        nkv = n_kv_heads or n_heads
        assert n_heads % nkv == 0, (n_heads, nkv)
        d_kv = (d_model // n_heads) * nkv
        ks = jax.random.split(key, 4)
        mk = lambda k, dout: Linear.init(k, d_model, dout, bias=bias,
                                         dtype=dtype)
        return cls(wqkv_q=mk(ks[0], d_model), wqkv_k=mk(ks[1], d_kv),
                   wqkv_v=mk(ks[2], d_kv), w_o=mk(ks[3], d_model),
                   n_heads=n_heads, n_kv_heads=n_kv_heads)

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    def quantize(self, **qkw) -> "MultiHeadAttention":
        return MultiHeadAttention(
            wqkv_q=self.wqkv_q.quantize(**qkw), wqkv_k=self.wqkv_k.quantize(**qkw),
            wqkv_v=self.wqkv_v.quantize(**qkw), w_o=self.w_o.quantize(**qkw),
            n_heads=self.n_heads, n_kv_heads=self.n_kv_heads)

    def with_tp(self, mesh, axis: str = "model") -> "MultiHeadAttention":
        """Megatron pairing for a quantized module: QKV column-sharded with
        ``gather_output=False`` (activations stay head-sharded through the
        attention math) and W_O row-sharded — exactly ONE psum per block."""
        col = lambda l: l.with_tp("column", mesh, axis, gather_output=False)
        return MultiHeadAttention(
            wqkv_q=col(self.wqkv_q), wqkv_k=col(self.wqkv_k),
            wqkv_v=col(self.wqkv_v), w_o=self.w_o.with_tp("row", mesh, axis),
            n_heads=self.n_heads, n_kv_heads=self.n_kv_heads)

    @property
    def _tp(self) -> bool:
        return getattr(self.w_o, "tp_mode", "none") != "none"

    def _split(self, x):
        b, s, d = x.shape
        return x.reshape(b, s, self.n_heads, d // self.n_heads).transpose(0, 2, 1, 3)

    def _split_kv(self, x):
        b, s, d = x.shape
        return x.reshape(b, s, self.kv_heads, d // self.kv_heads) \
            .transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, s, dh = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)

    def _repeat_kv(self, x):
        """[B, Hkv, S, D] -> [B, Hq, S, D] for full-sequence paths (the
        grouped cache paths never materialize this — see
        _grouped_cached_attention)."""
        g = self.n_heads // self.kv_heads
        if g == 1:
            return x
        return jnp.repeat(x, g, axis=1)

    def precompute_kv(self, x_kv):
        """Project and head-split K/V once (cross-attention cache: the
        encoder output's K/V are static across all decode steps)."""
        return self._split_kv(self.wqkv_k(x_kv)), \
            self._split_kv(self.wqkv_v(x_kv))

    def __call__(self, x_q, x_kv=None, causal: bool = False,
                 kv_cache=None, cache_index=None, precomputed_kv=None,
                 mask=None):
        """x_q [B, Sq, D]; x_kv [B, Sk, D] or None (self-attention).

        KV-cache decoding: pass ``kv_cache=(k_cache, v_cache)`` with shapes
        [B, H, S_max, Dh] and ``cache_index`` (current length); returns
        (out, (k_cache, v_cache)) with the new K/V written at cache_index.
        ``precomputed_kv=(k, v)``: skip K/V projection (cross-attention).
        ``mask`` [B, Sk] bool (key-side validity, e.g. padded encoder
        positions in ragged cross-attention batches) — routes through the
        jnp path (the flash kernel takes causal/padding masks only).
        """
        q = self._split(self.wqkv_q(x_q))
        if precomputed_kv is not None and len(precomputed_kv) == 4:
            # int8 cross-attention K/V (seq2seq serving: the encoder output's
            # K/V are static across every decode step, so they are quantized
            # ONCE at admission and read int8 forever after — same factored
            # dequant as the int8 self-cache, halving the per-step cross
            # read). 4-tuple (kq int8, kc f32 absmax, vq, vc).
            out = _quantized_cross_attention(q, *precomputed_kv, mask=mask)
            return self.w_o(self._merge(out))
        if precomputed_kv is not None:
            k, v = precomputed_kv
        else:
            if x_kv is None:
                x_kv = x_q
            k = self._split_kv(self.wqkv_k(x_kv))
            v = self._split_kv(self.wqkv_v(x_kv))

        g = self.n_heads // self.kv_heads
        if kv_cache is not None:
            # duck-typed paged branch: only a PagedKVCache carries a page
            # table, and testing the attribute keeps models/ free of any
            # serving import on the dense path (no import cycle as both grow)
            if getattr(kv_cache, "page_table", None) is not None:
                if self._tp and g > 1:
                    p_ = self.w_o.mesh.shape[self.w_o.tp_axis]
                    assert self.kv_heads % p_ == 0 and q.shape[1] % p_ == 0, \
                        "paged GQA TP needs both head counts divisible by " \
                        "the model axis"
                # paged decode (Sq == 1, per-slot positions): append this
                # step's K/V at each slot's position (page, offset) and
                # attend over the page table — scalar-prefetch kernel on
                # TPU, gather oracle on CPU
                from qgemm_tpu.serving.paged_cache import (
                    paged_attention_reference, paged_write_step)
                if q.shape[2] > 1:
                    # PAGED CHUNK PREFILL (the prefix-cache compute-skip
                    # path and paged chunked admission): cache_index is the
                    # chunk's page-aligned position offset; the chunk's K/V
                    # are written into the slot's pages and its rows attend
                    # every cached position <= their own (context attention
                    # — causal across the shared prefix AND within the
                    # chunk)
                    offset = jnp.asarray(cache_index)
                    if offset.ndim == 1:
                        # batched VERIFY chunk (continuous-batching
                        # speculative decoding over the paged cache): every
                        # slot's candidate block writes + attends at its own
                        # per-slot offset — unaligned to pages, so the
                        # writes go row-by-row through the decode scatter
                        # (each row's page/offset resolved from the table)
                        # and the attend is the batched gather context
                        # attention. One scatter per candidate row, not per
                        # slot: gamma+1 scatters total.
                        if self._tp:
                            out, new_cache = _tp_paged_spec_chunk(
                                self, q, k, v, kv_cache, offset)
                            return self.w_o(self._merge(out)), new_cache
                        new_cache = kv_cache
                        for j in range(q.shape[2]):
                            new_cache = paged_write_step(
                                new_cache, k[:, :, j:j + 1], v[:, :, j:j + 1],
                                offset + j)
                        lengths = offset + q.shape[2]
                        out = _paged_context_attend(q, new_cache, lengths,
                                                    offset)
                        return self.w_o(self._merge(out)), new_cache
                    assert q.shape[0] == 1, "paged chunk prefill is per-slot"
                    if self._tp:
                        p_ = self.w_o.mesh.shape[self.w_o.tp_axis]
                        assert q.shape[1] % p_ == 0 \
                            and self.kv_heads % p_ == 0, \
                            "paged chunk prefill under TP needs both head " \
                            "counts divisible by the model axis"
                        out, new_cache = _tp_paged_chunk_prefill(
                            self, q, k, v, kv_cache, offset)
                        return self.w_o(self._merge(out)), new_cache
                    from qgemm_tpu.serving.paged_cache import (
                        paged_write_prompt)
                    first_page = offset // kv_cache.page_size
                    new_cache = paged_write_prompt(
                        kv_cache, 0, k[0], v[0], first_page=first_page)
                    lengths = jnp.reshape(offset + q.shape[2], (1,))
                    out = _paged_context_attend(q, new_cache, lengths,
                                                offset)
                    return self.w_o(self._merge(out)), new_cache
                positions = jnp.broadcast_to(
                    jnp.asarray(cache_index).reshape(-1), (q.shape[0],))
                if self._tp:
                    out, new_cache = _tp_paged_decode(
                        self, q, k, v, kv_cache, positions)
                    return self.w_o(self._merge(out)), new_cache
                new_cache = paged_write_step(kv_cache, k, v, positions)
                lengths = positions + 1
                out = _paged_attend(q, new_cache, lengths)
                return self.w_o(self._merge(out)), new_cache
            from qgemm_tpu.ops.kv_cache import QuantizedKVCache, quantize_kv
            per_slot = getattr(cache_index, "ndim", 0) == 1  # [B] positions
            if per_slot:
                # continuous batching: each batch slot writes at its own
                # position (vmapped one-element dynamic update, in-place)
                upd = lambda c, n: jax.vmap(
                    lambda ci, ni, i: jax.lax.dynamic_update_slice_in_dim(
                        ci, ni, i, axis=1))(c, n, cache_index)
                idx = cache_index[:, None, None, None]
            else:
                upd = lambda c, n: jax.lax.dynamic_update_slice_in_dim(
                    c, n, cache_index, axis=2)
                idx = cache_index
            quantized = isinstance(kv_cache, QuantizedKVCache)
            if quantized:
                # int8 cache: quantize the new rows on write; on read the
                # absmax scales are factored OUT of the matmuls —
                # q.(kq*kc) == (q.kq)*kc and p@(vq*vc) == (p*vc)@vq — so the
                # dequantized bf16 cache is never materialized in HBM (XLA
                # would otherwise write it back every step, doubling decode
                # cache traffic instead of halving it)
                kq, kc = quantize_kv(k)
                vq, vc = quantize_kv(v)
                new_cache = QuantizedKVCache(
                    kq=upd(kv_cache.kq, kq), kc=upd(kv_cache.kc, kc),
                    vq=upd(kv_cache.vq, vq), vc=upd(kv_cache.vc, vc))
                k_cache, v_cache = new_cache.kq, new_cache.vq
            else:
                k_cache = upd(kv_cache[0], k)
                v_cache = upd(kv_cache[1], v)
                new_cache = (k_cache, v_cache)
            # FULL-PROMPT PREFILL (cache_index statically 0, multi-token q):
            # attend the just-projected K/V block with the flash kernel
            # instead of masked jnp attention against the ENTIRE padded
            # cache extent — O(S_p * d) HBM instead of O(S_p * S_max)
            # scores, and unquantized K/V (exact, vs reading back the int8
            # rows just written). The cache write above still happened.
            prefill0 = (isinstance(cache_index, int) and cache_index == 0
                        and causal and q.shape[2] == k.shape[2]
                        and q.shape[2] >= 128
                        and jax.default_backend() != "cpu")
            if prefill0 and self._tp:
                prefill0 = \
                    q.shape[1] % self.w_o.mesh.shape[self.w_o.tp_axis] == 0
            if prefill0:
                out = _dispatch_attention(q, self._repeat_kv(k),
                                          self._repeat_kv(v), causal=True,
                                          mha=self)
                return self.w_o(self._merge(out)), new_cache
            s_max = k_cache.shape[2]
            kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[2], s_max), 3)
            valid = kj < (idx + k.shape[2])
            if causal:
                qi = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, q.shape[2], s_max), 2) + idx
                valid = jnp.logical_and(valid, kj <= qi)
            fused_ok = (quantized and q.shape[2] == 1
                        and kv_cache.kq.shape[2] >= 128
                        and jax.default_backend() != "cpu"
                        # GQA decodes through the grouped jnp fold below:
                        # measured FASTER than the kernel's grouped variant
                        # on v5e (3,334 vs 3,170 tok/s at 24L/1152-ctx,
                        # B8 g4 — XLA fuses the int8 reads into [g, S]
                        # dots here; the kernel path still supports
                        # groups for direct callers)
                        and g == 1)
            if fused_ok and self._tp:
                # head-sharded shard_map body needs both head counts
                # divisible by the axis
                p_ = self.w_o.mesh.shape[self.w_o.tp_axis]
                fused_ok = (q.shape[1] % p_ == 0
                            and self.kv_heads % p_ == 0)
            if not fused_ok and g > 1:
                # GQA jnp fallback: fold the query-head groups into the
                # row axis — q [B, Hq, Sq, D] -> [B, Hkv, g*Sq, D] (query
                # heads i*g..(i+1)*g-1 share KV head i), and tile the
                # validity mask per group row. Every cached jnp path below
                # then reads the 1/g-sized cache UNREPLICATED (the whole
                # point: decode bandwidth and cache HBM shrink by g), with
                # BIGGER dots per KV head ([g*Sq, S] instead of [Sq, S]).
                b_, hq_, sq_, d_ = q.shape
                q = q.reshape(b_, self.kv_heads, g * sq_, d_)
                valid = jnp.tile(valid, (1, 1, g, 1))
            if fused_ok:
                # decode step over the int8 cache: the fused Pallas kernel
                # reads the cache as int8 at the HBM bound and wins at EVERY
                # cache length swept on v5e (S=128: 1.48x, 256: 1.30x,
                # 512: 2.32x, 1024: 2.28x, 2048+: ~2x — r2 sweep; any batch
                # size, validated B in {5,6,12}); below 128 positions the
                # block padding dominates, XLA path there. Under TP the same
                # kernel runs INSIDE shard_map on each device's head shard
                # (GSPMD cannot partition a pallas_call).
                lengths = jnp.broadcast_to(
                    jnp.asarray(cache_index).reshape(-1), (q.shape[0],)) + 1
                if self._tp:
                    out = _tp_dense_decode(self, q, new_cache, lengths)
                else:
                    from qgemm_tpu.ops.pallas.decode_attention import \
                        decode_attention
                    out = decode_attention(q, new_cache.kq, new_cache.vq,
                                           lengths, kc=new_cache.kc,
                                           vc=new_cache.vc)
            elif quantized:
                from qgemm_tpu.ops.kv_cache import QRANGE
                d = q.shape[-1]
                # dots in bf16: the int8->bf16 convert fuses into the dot so
                # HBM reads stay int8 (measured 2x: 0.098 vs 0.187 ms for an
                # 8x16x2048x128 cache read; an f32 upcast — or even
                # preferred_element_type=f32 — breaks the fusion and
                # materializes the converted cache)
                cd = jnp.bfloat16
                s = jnp.einsum("...qd,...kd->...qk", q.astype(cd),
                               k_cache.astype(cd)).astype(jnp.float32)
                # per-position K scale: [B,H,S,1] -> [B,H,1,S]
                s = s * (new_cache.kc[..., 0] / (QRANGE * d ** 0.5))[:, :, None, :]
                s = jnp.where(valid, s, -1e30)
                p = softmax(s, axis=-1)
                p = p * (new_cache.vc[..., 0] * (1.0 / QRANGE))[:, :, None, :]
                out = jnp.einsum("...qk,...kv->...qv", p.astype(cd),
                                 v_cache.astype(cd)).astype(q.dtype)
            else:
                out = scaled_dot_product_attention(q, k_cache, v_cache,
                                                   mask=valid)
            if g > 1 and not fused_ok:  # unfold the grouped jnp result
                out = out.reshape(b_, hq_, sq_, out.shape[-1])
            out = self.w_o(self._merge(out))
            return out, new_cache

        k, v = self._repeat_kv(k), self._repeat_kv(v)
        if mask is not None:
            out = scaled_dot_product_attention(
                q, k, v, causal=causal, mask=mask[:, None, None, :])
        else:
            out = _dispatch_attention(q, k, v, causal=causal, mha=self)
        return self.w_o(self._merge(out))


def _quantized_cross_attention(q, kq, kc, vq, vc, mask=None):
    """q [B,Hq,Sq,D]; kq/vq int8 [B,Hkv,S,D] (Hq a multiple of Hkv — GQA
    query groups fold into the row axis); kc/vc f32 [B,Hkv,S,1]
    per-position absmax. Scales are factored OUT of the matmuls
    (q.(kq*kc) == (q.kq)*kc and p@(vq*vc) == (p*vc)@vq) so the dequantized
    cache never materializes; dots in bf16 so HBM reads stay int8 (see the
    int8 self-cache path)."""
    from qgemm_tpu.ops.kv_cache import QRANGE
    b, hq, sq, d = q.shape
    hkv = kq.shape[1]
    if hq != hkv:
        q = q.reshape(b, hkv, (hq // hkv) * sq, d)
    cd = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    s = jnp.einsum("...qd,...kd->...qk", q.astype(cd),
                   kq.astype(cd)).astype(jnp.float32)
    s = s * (kc[..., 0] / (QRANGE * d ** 0.5))[:, :, None, :]
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = softmax(s, axis=-1)
    p = p * (vc[..., 0] * (1.0 / QRANGE))[:, :, None, :]
    out = jnp.einsum("...qk,...kv->...qv", p.astype(cd),
                     vq.astype(cd)).astype(q.dtype)
    return out.reshape(b, hq, sq, out.shape[-1]) if hq != hkv else out


def _tp_dense_decode(mha, q, cache, lengths):
    """Dense int8-cache decode under tensor parallelism: the cache is
    head-sharded (parallel.sharding.shard_kv_caches) and heads are
    embarrassingly parallel, so the fused decode kernel
    (ops/pallas/decode_attention.py) runs INSIDE shard_map on each device's
    own head shard — the same pattern as ``_tp_paged_decode``. Output stays
    head-sharded for the row-parallel W_O (no collective here). The cache
    WRITE happened outside (elementwise scatter — GSPMD partitions it)."""
    from jax.sharding import PartitionSpec as P

    from qgemm_tpu.ops.pallas.decode_attention import decode_attention
    from qgemm_tpu.parallel.tp_ops import shard_map

    mesh, axis = mha.w_o.mesh, mha.w_o.tp_axis

    def body(q, kq, kc, vq, vc, ln):
        return decode_attention(q, kq, vq, ln, kc=kc, vc=vc)

    hs = P(None, axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(hs, hs, hs, hs, hs, P()),
                  out_specs=hs, check_rep=False)
    return f(q, cache.kq, cache.kc, cache.vq, cache.vc, lengths)


def _paged_attend(q, cache, lengths):
    """Paged decode dispatch: ragged flat-grid kernel when the cache
    carries step tables (serving.paged_cache.build_step_tables — one grid
    step per allocated page; handles GQA query groups), rectangular
    (B x pages_per_slot) kernel otherwise (MHA only — the engine always
    supplies step tables, so the GQA-without-tables case falls back to the
    gather oracle), jnp gather oracle on CPU."""
    from qgemm_tpu.serving.paged_cache import paged_attention_reference
    if jax.default_backend() == "cpu":
        return paged_attention_reference(q, cache, lengths)
    from qgemm_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_ragged)
    if cache.step_slot is not None:
        return paged_decode_attention_ragged(q, cache, lengths)
    if q.shape[1] != cache.kq.shape[1]:
        return paged_attention_reference(q, cache, lengths)
    return paged_decode_attention(q, cache, lengths)


def _paged_context_attend(q, cache, lengths, offset):
    """Paged CONTEXT (multi-row chunk) attention dispatch. The gather
    oracle (one fused XLA gather + einsum) is the DEFAULT on TPU by
    measurement, not an unoptimized placeholder: at engine-realistic
    suffix prefills (most of the reserved table resident — Hkv=16, D=64,
    C=256 suffix on a 2176-token prompt) it ran 41 us vs the blocked
    kernel's 105 us — multi-row chunk attention is compute-bound and one
    big einsum (N = whole resident context) feeds the MXU far better than
    page-at-a-time 128-wide score tiles. The blocked kernel
    (ops.pallas.paged_attention.paged_context_attention) inverts this
    only when the RESIDENT length is short relative to the slot's
    reserved width (< ~1/3: the oracle gathers the full width, the
    kernel's causal page skip stops at the bound — measured 1.27x there),
    a regime the engine's admission-time suffix prefill doesn't hit; the
    kernel stays exported + parity-tested for callers that do."""
    from qgemm_tpu.serving.paged_cache import (
        paged_context_attention_reference)
    return paged_context_attention_reference(q, cache, lengths, offset)


def _tp_paged_spec_chunk(mha, q, k, v, cache, offsets):
    """Batched speculative VERIFY chunk over the paged cache under tensor
    parallelism: pools and heads shard over the model axis exactly as in
    ``_tp_paged_decode``; the per-slot page tables and offsets replicate.
    Each device writes its own heads' candidate rows into its pool shard
    (one decode-style scatter per chunk row) and context-attends its head
    slice — no collective in the body (the paired row-parallel W_O carries
    the block's one psum)."""
    from jax.sharding import PartitionSpec as P

    from qgemm_tpu.parallel.tp_ops import shard_map
    from qgemm_tpu.serving.paged_cache import PagedKVCache, paged_write_step

    mesh, axis = mha.w_o.mesh, mha.w_o.tp_axis
    page_size = cache.page_size
    chunk = q.shape[2]

    def body(q, k, v, kq, kc, vq, vc, pt, off):
        local = PagedKVCache(kq=kq, kc=kc, vq=vq, vc=vc, page_table=pt,
                             page_size=page_size)
        for j in range(chunk):
            local = paged_write_step(local, k[:, :, j:j + 1],
                                     v[:, :, j:j + 1], off + j)
        lengths = off + chunk
        out = _paged_context_attend(q, local, lengths, off)
        return out, local.kq, local.kc, local.vq, local.vc

    hs = P(None, axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(hs, hs, hs, hs, hs, hs, hs, P(), P()),
                  out_specs=(hs, hs, hs, hs, hs), check_rep=False)
    out, kq, kc, vq, vc = f(q, k, v, cache.kq, cache.kc, cache.vq, cache.vc,
                            cache.page_table, offsets)
    from dataclasses import replace as _rep
    return out, _rep(cache, kq=kq, kc=kc, vq=vq, vc=vc)


def _tp_paged_chunk_prefill(mha, q, k, v, cache, offset):
    """Paged chunk prefill (prefix-cache suffix / paged chunked admission)
    under tensor parallelism: pools and heads are sharded over the model
    axis exactly as in ``_tp_paged_decode``; the per-slot page-table view
    and the chunk offset replicate. Each device writes its own heads'
    chunk K/V into its pool shard and context-attends its head slice —
    no collective in the body (the paired row-parallel W_O carries the
    block's one psum)."""
    from jax.sharding import PartitionSpec as P

    from qgemm_tpu.parallel.tp_ops import shard_map
    from qgemm_tpu.serving.paged_cache import (PagedKVCache,
                                               paged_write_prompt)

    mesh, axis = mha.w_o.mesh, mha.w_o.tp_axis
    page_size = cache.page_size
    chunk = q.shape[2]

    def body(q, k, v, kq, kc, vq, vc, pt, off):
        local = PagedKVCache(kq=kq, kc=kc, vq=vq, vc=vc, page_table=pt,
                             page_size=page_size)
        local = paged_write_prompt(local, 0, k[0], v[0],
                                   first_page=off // page_size)
        lengths = jnp.reshape(off + chunk, (1,))
        out = _paged_context_attend(q, local, lengths, off)
        return out, local.kq, local.kc, local.vq, local.vc

    hs = P(None, axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(hs, hs, hs, hs, hs, hs, hs, P(), P()),
                  out_specs=(hs, hs, hs, hs, hs), check_rep=False)
    out, kq, kc, vq, vc = f(q, k, v, cache.kq, cache.kc, cache.vq, cache.vc,
                            cache.page_table, offset)
    from dataclasses import replace as _rep
    return out, _rep(cache, kq=kq, kc=kc, vq=vq, vc=vc)


def _tp_paged_decode(mha, q, k, v, cache, positions):
    """Paged decode under tensor parallelism: pools are head-sharded over
    the model axis, heads are embarrassingly parallel, so the write +
    kernel run INSIDE shard_map on each device's own head slice (GSPMD
    cannot partition a pallas_call; page tables and positions replicate).
    Output stays head-sharded — it feeds the row-parallel W_O with no
    collective here."""
    from jax.sharding import PartitionSpec as P

    from qgemm_tpu.parallel.tp_ops import shard_map
    from qgemm_tpu.serving.paged_cache import (PagedKVCache,
                                               paged_attention_reference,
                                               paged_write_step)

    mesh, axis = mha.w_o.mesh, mha.w_o.tp_axis
    page_size = cache.page_size
    ragged = cache.step_slot is not None

    def body(q, k, v, kq, kc, vq, vc, pt, pos, *steps):
        local = PagedKVCache(kq=kq, kc=kc, vq=vq, vc=vc, page_table=pt,
                             page_size=page_size,
                             step_slot=steps[0] if ragged else None,
                             step_page=steps[1] if ragged else None)
        local = paged_write_step(local, k, v, pos)
        lengths = pos + 1
        out = _paged_attend(q, local, lengths)
        return out, local.kq, local.kc, local.vq, local.vc

    hs = P(None, axis)          # [B, H, ...] activations / [P, H, ...] pools
    extra = (cache.step_slot, cache.step_page) if ragged else ()
    f = shard_map(body, mesh=mesh,
                  in_specs=(hs, hs, hs, hs, hs, hs, hs, P(), P())
                  + (P(),) * len(extra),
                  out_specs=(hs, hs, hs, hs, hs), check_rep=False)
    out, kq, kc, vq, vc = f(q, k, v, cache.kq, cache.kc, cache.vq, cache.vc,
                            cache.page_table, positions, *extra)
    from dataclasses import replace as _rep
    new_cache = _rep(cache, kq=kq, kc=kc, vq=vq, vc=vc)
    return out, new_cache


def _dispatch_attention(q, k, v, causal: bool, mha=None):
    """Full-sequence path: flash kernel on TPU for non-trivial lengths
    (O(S*d) memory, scores never hit HBM), jnp composition otherwise.
    Under tensor parallelism (``mha._tp``) the flash kernel runs INSIDE
    shard_map on each device's head shard — GSPMD cannot partition a
    pallas_call, but heads are embarrassingly parallel so the body needs no
    collective (the paired row-parallel W_O carries the block's one psum)."""
    if jax.default_backend() != "cpu" \
            and q.shape[-2] >= 128 and k.shape[-2] >= 128:
        from qgemm_tpu.ops.pallas.flash_attention import flash_attention
        if mha is not None and mha._tp:
            mesh, axis = mha.w_o.mesh, mha.w_o.tp_axis
            if q.shape[1] % mesh.shape[axis] == 0:
                from jax.sharding import PartitionSpec as P

                from qgemm_tpu.parallel.tp_ops import shard_map
                hs = P(None, axis)
                f = shard_map(
                    lambda q, k, v: flash_attention(q, k, v, causal),
                    mesh=mesh, in_specs=(hs, hs, hs), out_specs=hs,
                    check_rep=False)
                return f(q, k, v)
            return scaled_dot_product_attention(q, k, v, causal=causal)
        return flash_attention(q, k, v, causal=causal)
    return scaled_dot_product_attention(q, k, v, causal=causal)
