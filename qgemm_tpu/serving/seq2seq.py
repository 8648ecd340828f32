"""Continuous batching for the encoder-decoder family (BASELINE config 4).

The GPT engine's design carried over (serving/engine.py: fixed slot pool,
one jitted decode step over all slots, bucketed per-slot prefill, per-slot
positions as data), adapted to seq2seq semantics:

  * a Request's ``prompt`` is the SOURCE sequence; generation starts from
    BOS, so decoder positions start at 1 after admission (BOS K/V at 0);
  * admission encodes the (bucket-padded) source once, scatters each
    layer's cross-attention K/V into the slot's row of a shared
    [slots, H, S_src_max, Dh] tensor, and runs the BOS decode step into
    the slot's self-cache region — the decode loop never re-touches the
    encoder;
  * ragged sources are handled by masking: the encoder masks padded
    positions internally (bidirectional — unmasked padding would pollute
    real positions) and every decode step masks cross-attention by the
    slot's true source length;
  * the decoder self-cache may be int8 (``quantized_cache=True``) and the
    decode step then runs the fused Pallas decode-attention kernel, same
    as GPT serving.

The reference's encoder-decoder demo (src/transformer.cu) has none of
this — fixed shapes, no cache, no batching; SURVEY §2 C15.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.serving.engine import Request, _PagedPoolOps, _PyBookkeeper


class _Seq2SeqBookkeeper(_PyBookkeeper):
    """Decoder-side bookkeeping: positions count DECODER tokens (BOS at 0,
    admissions start at position 1); the source length is validated by the
    engine, not here."""

    def submit(self, req: Request, front: bool = False):
        if req.max_new_tokens + 1 > self.max_seq_len:
            raise ValueError(
                f"request {req.id}: max_new_tokens {req.max_new_tokens} "
                f"exceeds decoder budget {self.max_seq_len - 1}")
        if front:
            self.waiting.insert(0, req)
        else:
            self.waiting.append(req)

    def next_admission(self):
        if not self.waiting or self.active.all():
            return None
        slot = int(np.flatnonzero(~self.active)[0])
        req = self.waiting.pop(0)
        self.pos[slot] = 1                      # BOS occupies position 0
        self.active[slot] = True
        self.slot_req[slot] = req
        return slot, req


class Seq2SeqEngine(_PagedPoolOps):
    """Continuous batching inference engine for ``models.transformer
    .Transformer``. API mirrors ``ContinuousBatchingEngine`` (submit /
    step / run_to_completion / cancel / stats)."""

    def __init__(self, model, max_slots: int = 8,
                 max_src_len: Optional[int] = None,
                 max_new_tokens: Optional[int] = None,
                 quantized_cache: bool = False, top_k: int = 0,
                 seed: int = 0, bos_token: int = 1, mesh=None,
                 paged: bool = False, n_pages: Optional[int] = None,
                 multi_step: int = 0, draft_model=None,
                 spec_gamma: int = 4, page_size: Optional[int] = None,
                 kv_bits: int = 8):
        """``mesh``: tensor-parallel serving — pass the mesh the model was
        sharded over (parallel.sharding.shard_quantized_model on a
        ``Transformer.with_tp`` model); the decoder self-caches AND the
        per-slot cross-attention K/V are head-sharded over its ``model``
        axis to match the column-sharded projections.
        ``paged``: block-table DECODER self-cache (the growing one — it
        holds BOS + every generated token, so its HBM scales with each
        request's committed max_new_tokens instead of slots x engine
        max_dec_len). The cross-attention K/V stay dense per-slot: they
        are written once at admission, bounded by max_src_len, and never
        grow — paging them would buy nothing (the GPT-engine prefix/
        chunked admission tiers don't apply either: the decoder starts
        from a single BOS token, there is no prompt to page, share or
        chunk). ``n_pages`` sizes the pool (default full provisioning;
        less = oversubscribe with admission backpressure).
        ``multi_step``: K decode steps per dispatch when the queue is
        empty (same contract as the GPT engine: greedy transcripts
        identical, finishing slots junk-decode within their reservation
        for the rest of the block, admissions never delayed).
        ``draft_model``: SPECULATIVE DECODING for the enc-dec family
        (GPT-engine parity): a cheap draft Transformer encodes each
        source at admission (its own per-slot cross K/V + dense decoder
        self-cache) and proposes ``spec_gamma`` tokens per slot each
        round; the target verifies all slots in one batched
        ``decode_chunk`` at per-slot offsets with STOCHASTIC rejection
        sampling under each slot's own sampling params — greedy slots
        stay bit-equal to the plain engine, sampled slots distribute
        exactly as sequential warped-target sampling. Composes with
        multi_step (K rounds per dispatch) and the paged decoder
        self-cache (reservations grow by gamma+2)."""
        cfg = model.cfg
        self.model = model
        self.max_slots = max_slots
        self.max_src_len = max_src_len or cfg.max_seq_len
        self.max_dec_len = (max_new_tokens or cfg.max_seq_len - 1) + 1
        self.draft = draft_model
        self.spec_gamma = int(spec_gamma)
        self.spec_extra = (self.spec_gamma + 2) if draft_model is not None \
            else 0
        self.quantized_cache = quantized_cache
        self.top_k = top_k
        self.bos_token = bos_token
        self._key = jax.random.PRNGKey(seed)

        self.book = _Seq2SeqBookkeeper(max_slots, self.max_dec_len)
        self.paged = paged
        if paged:
            from qgemm_tpu.serving.paged_cache import (PAGE_SIZE,
                                                       PageAllocator,
                                                       init_paged_cache)
            # page capacity rounds UP to whole pages, but the bookkeeper's
            # request-validation limit must NOT widen with it: positions
            # past the configured decoder budget would run off the model's
            # positional table (review r4 finding — the dense mode rejects
            # the same request)
            ps = page_size or PAGE_SIZE
            pps = -(-self.max_dec_len // ps)
            self.max_dec_len = pps * ps
            # spec mode: verify chunks write up to spec_extra junk rows
            # past a slot's final position — widen tables + reservations
            pps += -(-self.spec_extra // ps)
            npg = n_pages or (1 + max_slots * pps)
            hkv_ = getattr(cfg, "n_kv_heads", 0) or cfg.n_heads
            self._pt_host = np.zeros((max_slots, pps), np.int32)
            assert kv_bits in (8, 4), kv_bits
            self.caches = [init_paged_cache(
                hkv_, cfg.d_model // cfg.n_heads, npg, max_slots, pps,
                page_size=ps, kv_bits=kv_bits)
                for _ in model.dec_blocks]
            self.alloc = PageAllocator(npg, max_slots, pps)
            self._page_size = ps
        else:
            self.caches = model.init_cache(
                max_slots, self.max_dec_len + self.spec_extra,
                quantized=quantized_cache)
        if draft_model is not None:
            # the draft's decoder self-cache stays DENSE in both modes
            # (it is the small model); its cross K/V stay float
            dcfg = draft_model.cfg
            ddh = dcfg.d_model // dcfg.n_heads
            dhkv = getattr(dcfg, "n_kv_heads", 0) or dcfg.n_heads
            self.draft_caches = draft_model.init_cache(
                max_slots, self.max_dec_len + self.spec_extra)
            zd = lambda: jnp.zeros(
                (max_slots, dhkv, self.max_src_len, ddh), dcfg.jdtype)
            self.draft_enc_kvs = [(zd(), zd())
                                  for _ in draft_model.dec_blocks]
        dh = cfg.d_model // cfg.n_heads
        hkv = getattr(cfg, "n_kv_heads", 0) or cfg.n_heads   # GQA: 1/g
        s_src = self.max_src_len
        if quantized_cache:
            # int8 cross-attention K/V too: the encoder output is static
            # across all of a request's decode steps, so it is quantized
            # once at admission and every step's cross read is int8 —
            # halving the second-largest per-step HBM stream
            z8 = lambda: jnp.zeros((max_slots, hkv, s_src, dh), jnp.int8)
            zc = lambda: jnp.ones((max_slots, hkv, s_src, 1), jnp.float32)
            self.enc_kvs = [(z8(), zc(), z8(), zc())
                            for _ in model.dec_blocks]
        else:
            zkv = lambda: jnp.zeros((max_slots, hkv, s_src, dh), cfg.jdtype)
            self.enc_kvs = [(zkv(), zkv()) for _ in model.dec_blocks]
        self.mesh = mesh
        if mesh is not None:
            if paged:
                from qgemm_tpu.parallel.sharding import shard_paged_caches
                self.caches = shard_paged_caches(self.caches, mesh)
            else:
                from qgemm_tpu.parallel.sharding import shard_kv_caches
                self.caches = shard_kv_caches(self.caches, mesh)
            from qgemm_tpu.parallel.sharding import shard_kv_caches
            # enc_kvs leaves are [slots, H, S_src, *] — same head-sharding
            self.enc_kvs = shard_kv_caches(self.enc_kvs, mesh)
        self.src_lens = jnp.zeros((max_slots,), jnp.int32)

        self.positions = jnp.zeros((max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((max_slots, 1), jnp.int32)
        self.temps = jnp.zeros((max_slots,), jnp.float32)
        self.topps = jnp.ones((max_slots,), jnp.float32)
        self.topks = jnp.zeros((max_slots,), jnp.int32)
        self.finished: List[Request] = []
        self.tokens_generated = 0
        self.spec_rounds = 0
        self.spec_drafted = 0
        self.spec_accepted = 0
        self._t_start = None
        self._lp_slots: Dict[int, Request] = {}
        self._admit_times: List[float] = []

        # donate the self caches only (enc_kvs are read-only in decode)
        self._decode = jax.jit(self._decode_impl, donate_argnums=(3,))
        self.multi_step = int(multi_step)
        self._decode_multi = jax.jit(self._decode_multi_impl,
                                     donate_argnums=(3,),
                                     static_argnames=("n",))
        # ONE dispatch for the six per-slot admission-state writes (same
        # rationale as the GPT engine's _set_slot — r4)
        def _set_slot_impl(state, slot, srclen, tok, temp, topp, topk):
            (src_lens, positions, cur_tokens, temps, topps, topks) = state
            return (src_lens.at[slot].set(srclen),
                    positions.at[slot].set(1),
                    cur_tokens.at[slot, 0].set(tok),
                    temps.at[slot].set(temp),
                    topps.at[slot].set(topp),
                    topks.at[slot].set(topk))
        self._set_slot = jax.jit(_set_slot_impl, donate_argnums=(0,))
        self._prefill = jax.jit(self._prefill_impl, static_argnames=("plen",))
        self._prefill_paged = jax.jit(self._prefill_paged_impl,
                                      static_argnames=("plen",))
        if draft_model is not None:
            self._spec_round = jax.jit(self._spec_round_impl,
                                       donate_argnums=(4, 5),
                                       static_argnames=("gamma",))
            self._spec_multi = jax.jit(self._spec_multi_impl,
                                       donate_argnums=(4, 5),
                                       static_argnames=("gamma", "n"))
            self._draft_admit = jax.jit(self._draft_admit_impl,
                                        static_argnames=("plen",))

    # ------------------------------------------------------------- jit fns
    def _decode_impl(self, model, tok, pos, caches, enc_kvs, src_lens,
                     key, temps, topps, topks):
        from qgemm_tpu.ops.sampling import sample_logits
        src_mask = jnp.arange(self.max_src_len)[None, :] < src_lens[:, None]
        from qgemm_tpu.ops.sampling import token_logprob
        logits, caches = model.decode_logits(tok, pos, enc_kvs, caches,
                                             src_mask=src_mask)
        nxt = sample_logits(logits, key, temperature=temps, top_k=topks,
                            top_p=topps)
        return nxt, token_logprob(logits, nxt), caches

    def _decode_multi_impl(self, model, tok, pos, caches, enc_kvs,
                           src_lens, key, temps, topps, topks, n):
        """``n`` decode steps in one dispatch (GPT-engine multi_step
        contract)."""
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        src_mask = jnp.arange(self.max_src_len)[None, :] < src_lens[:, None]

        def sub(carry, k):
            tok, pos, caches = carry
            logits, caches = model.decode_logits(tok, pos, enc_kvs, caches,
                                                 src_mask=src_mask)
            nxt = sample_logits(logits, k, temperature=temps,
                                top_k=topks, top_p=topps)
            return (nxt[:, None], pos + 1, caches), \
                (nxt, token_logprob(logits, nxt))

        (tok, pos, caches), (toks, lps) = jax.lax.scan(
            sub, (tok, pos, caches), jax.random.split(key, n))
        return toks, lps, caches

    def _spec_round_impl(self, model, draft, cur, pos, caches, dcaches,
                         enc_kvs, denc_kvs, src_lens, key, temps, topps,
                         topks, gamma):
        """One batched speculative round (GPT-engine parity, enc-dec
        flavor): the draft scans gamma+1 decode steps against ITS cross
        K/V sampling each proposal from its warped distribution; the
        target verifies every slot's candidate block in one batched
        ``decode_chunk`` at per-slot offsets; Leviathan rejection
        sampling (engine.spec_accept) advances each slot by its accepted
        prefix + 1."""
        from qgemm_tpu.ops.sampling import sample_logits_with_prob

        from qgemm_tpu.serving.engine import spec_accept
        src_mask = jnp.arange(self.max_src_len)[None, :] < src_lens[:, None]
        kd, kacc, kextra = jax.random.split(key, 3)

        def dstep(carry, j):
            tok, dc, k = carry
            k, ks = jax.random.split(k)
            logits, dc = draft.decode_logits(tok, pos + j, denc_kvs, dc,
                                             src_mask=src_mask)
            # unfiltered-temperature draft proposals (engine.spec_accept
            # contract — the verifier owns the slot's filters)
            nxt, qx = sample_logits_with_prob(logits, ks, temps, 0, 1.0)
            return (nxt[:, None], dc, k), (nxt, qx, logits)

        (_, dcaches, _), (props, qxs, dlogits) = jax.lax.scan(
            dstep, (cur, dcaches, kd), jnp.arange(gamma + 1))
        d = props[:gamma].T
        qx = qxs[:gamma].T
        dlog = dlogits[:gamma].transpose(1, 0, 2)
        seq = jnp.concatenate([cur, d], axis=1)
        tlogits, caches = model.decode_chunk(seq, pos, enc_kvs, caches,
                                             src_mask=src_mask)
        cand, produced, cur_new, lps = spec_accept(
            tlogits, d, qx, dlog, temps, topps, topks, kacc, kextra, gamma)
        return cand, produced, cur_new, lps, caches, dcaches

    def _spec_multi_impl(self, model, draft, cur, pos, caches, dcaches,
                         enc_kvs, denc_kvs, src_lens, key, temps, topps,
                         topks, gamma, n):
        """``n`` speculative rounds in one dispatch (lax.scan; GPT-engine
        _spec_multi_impl contract — positions chain through accepted
        blocks, post-finish junk replays are discarded by the host)."""
        def sub(carry, k):
            cur, pos, caches, dcaches = carry
            cand, produced, cur_new, lps, caches, dcaches = \
                self._spec_round_impl(model, draft, cur, pos, caches,
                                      dcaches, enc_kvs, denc_kvs,
                                      src_lens, k, temps, topps, topks,
                                      gamma)
            return (cur_new[:, None], pos + produced, caches, dcaches), \
                (cand, produced, lps)

        (cur, pos, caches, dcaches), (cands, produceds, lpss) = \
            jax.lax.scan(sub, (cur, pos, caches, dcaches),
                         jax.random.split(key, n))
        return cands, produceds, lpss, cur, pos, caches, dcaches

    def _draft_admit_impl(self, draft, src, src_len_true, denc_kvs,
                          dcaches, slot, plen):
        """Admission back half for the draft: encode the source with the
        DRAFT, scatter its cross K/V into the slot's rows, write its BOS
        K/V into the slot's self-cache region (the BOS logits are
        discarded — the first token is the target's)."""
        _, tmp, new_denc, _ = self._encode_and_bos(
            draft, src, src_len_true, denc_kvs, slot, plen, False)
        zero = jnp.zeros((), jnp.int32)
        scatter = lambda c, t: jax.lax.dynamic_update_slice(
            c, t, (slot, zero, zero, zero))
        new_dcaches = [jax.tree.map(scatter, c, t)
                       for c, t in zip(dcaches, tmp)]
        return new_denc, new_dcaches

    def _encode_and_bos(self, model, src, src_len_true, enc_kvs, slot,
                        plen, quantized_tmp):
        """Shared admission front half: encode the bucket-padded source
        (masked), put each layer's cross K/V into the slot's rows, run the
        BOS decode step against a throwaway 1-slot self-cache. Returns
        (logits, tmp caches holding BOS K/V at position 0, new enc_kvs,
        mask)."""
        mask = (jnp.arange(plen)[None, :] < src_len_true)
        enc_out = model.encode(src, mask=mask)
        zero = jnp.zeros((), jnp.int32)

        fresh, new_enc_kvs = [], []
        for blk, layer_kv in zip(model.dec_blocks, enc_kvs):
            k, v = blk.cross_attn.precompute_kv(enc_out)    # [1, H, plen, Dh]
            fresh.append((k, v))
            if len(layer_kv) == 4:                          # int8 cross cache
                from qgemm_tpu.ops.kv_cache import quantize_kv
                kq, kc = quantize_kv(k)
                vq, vc = quantize_kv(v)
                parts = (kq, kc, vq, vc)
            else:
                parts = (k, v)
            new_enc_kvs.append(tuple(
                jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype),
                                             (slot, zero, zero, zero))
                for dst, src in zip(layer_kv, parts)))

        tmp = model.init_cache(1, 1, quantized=quantized_tmp)
        bos = jnp.full((1, 1), self.bos_token, jnp.int32)
        logits, tmp = model.decode_logits(bos, 0, fresh, tmp, src_mask=mask)
        return logits, tmp, new_enc_kvs, mask

    def _prefill_impl(self, model, src, src_len_true, caches, enc_kvs,
                      slot, key, temp, topp, topk, plen):
        """Admit one source: encode + cross-KV scatter, then scatter the
        BOS step's K/V into the slot's self-cache region (same pattern as
        the GPT engine's prefill). ``plen`` is the static source bucket."""
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        logits, tmp, new_enc_kvs, _ = self._encode_and_bos(
            model, src, src_len_true, enc_kvs, slot, plen,
            self.quantized_cache)
        zero = jnp.zeros((), jnp.int32)

        def scatter(c_full, c_tmp):
            return jax.lax.dynamic_update_slice(
                c_full, c_tmp, (slot, zero, zero, zero))

        new_caches = [jax.tree.map(scatter, c, t)
                      for c, t in zip(caches, tmp)]
        first_tok = sample_logits(logits, key, temperature=temp,
                                  top_k=topk, top_p=topp)
        return first_tok[0], token_logprob(logits, first_tok)[0], \
            new_caches, new_enc_kvs

    def _prefill_paged_impl(self, model, src, src_len_true, caches,
                            enc_kvs, slot, key, temp, topp, topk, plen):
        """Paged admission: same front half, then write the BOS step's K/V
        row into the slot's page 0 (paged_write_step on the slot's
        page-table view — an elementwise scatter GSPMD partitions, no
        shard_map needed here)."""
        from dataclasses import replace as _rep

        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        from qgemm_tpu.serving.paged_cache import paged_write_step
        logits, tmp, new_enc_kvs, _ = self._encode_and_bos(
            model, src, src_len_true, enc_kvs, slot, plen, False)
        new_caches = []
        for c, t in zip(caches, tmp):
            view = _rep(c, page_table=jax.lax.dynamic_slice_in_dim(
                c.page_table, slot, 1, axis=0),
                step_slot=None, step_page=None)
            vw = paged_write_step(view, t[0], t[1],
                                  jnp.zeros((1,), jnp.int32))
            new_caches.append(_rep(c, kq=vw.kq, kc=vw.kc, vq=vw.vq,
                                   vc=vw.vc))
        first_tok = sample_logits(logits, key, temperature=temp,
                                  top_k=topk, top_p=topp)
        return first_tok[0], token_logprob(logits, first_tok)[0], \
            new_caches, new_enc_kvs

    # ---------------------------------------------------------------- admin
    def submit(self, req: Request):
        if len(req.prompt) > self.max_src_len:
            raise ValueError(
                f"request {req.id}: source length {len(req.prompt)} "
                f"exceeds max_src_len {self.max_src_len}")
        self.book.submit(req)

    def _admit(self):
        while True:
            adm = self.book.next_admission()
            if adm is None:
                return
            slot, req = adm
            plen = len(req.prompt)
            bucket = min(max(8, 1 << (max(plen, 1) - 1).bit_length()),
                         self.max_src_len)
            src = jnp.asarray(np.pad(
                np.asarray(req.prompt, np.int32), (0, bucket - plen))[None, :])
            eff_topk = self.top_k if req.top_k is None else req.top_k
            if self.paged:
                def _unadmit():
                    self.book.cancel(req.id)
                    for r in self.book.drain_finished():
                        if r.id != req.id:
                            self.finished.append(r)

                # reserve the request's worst case (BOS + max_new, plus
                # the spec verify chunk's junk-row headroom) eagerly so
                # mid-decode growth can never exhaust the pool — same
                # contract as the GPT paged engine
                worst = min(1 + req.max_new_tokens, self.max_dec_len) \
                    + self.spec_extra
                need = self.alloc.pages_needed(worst, self._page_size)
                pool_cap = self.caches[0].n_pages - 1   # page 0 reserved
                if need > min(self.alloc.pages_per_slot, pool_cap):
                    req.error = (f"request needs {need} pages > "
                                 f"{min(self.alloc.pages_per_slot, pool_cap)}"
                                 " available per request")
                    req.done = True
                    _unadmit()
                    self.finished.append(req)
                    continue
                if need > self.alloc.n_free:
                    # backpressure: requeue at the front until finishing
                    # requests release pages
                    _unadmit()
                    req.done = False
                    self.book.submit(req, front=True)
                    return
                if self._grow_slot(slot, worst):
                    self._sync_page_tables()
            import time as _time
            t_adm = _time.perf_counter()
            try:
                self._key, sub = jax.random.split(self._key)
                prefill_fn = (self._prefill_paged if self.paged
                              else self._prefill)
                first_tok, first_lp, self.caches, self.enc_kvs = prefill_fn(
                    self.model, src, jnp.int32(plen), self.caches,
                    self.enc_kvs, jnp.int32(slot), sub,
                    jnp.float32(req.temperature), jnp.float32(req.top_p),
                    jnp.int32(eff_topk), plen=bucket)
            except Exception as e:  # noqa: BLE001 — per-request isolation
                req.error = f"{type(e).__name__}: {e}"
                req.done = True
                self.book.cancel(req.id)
                if self.paged:
                    self._release_slot_pages(slot)
                for r in self.book.drain_finished():
                    if r.id != req.id:
                        self.finished.append(r)
                self.finished.append(req)
                continue
            if self.draft is not None:
                # the draft encodes the same source into ITS per-slot
                # cross K/V + BOS self-cache so spec rounds propose with
                # full source context
                self.draft_enc_kvs, self.draft_caches = self._draft_admit(
                    self.draft, src, jnp.int32(plen), self.draft_enc_kvs,
                    self.draft_caches, jnp.int32(slot), plen=bucket)
            (self.src_lens, self.positions, self.cur_tokens, self.temps,
             self.topps, self.topks) = self._set_slot(
                (self.src_lens, self.positions, self.cur_tokens,
                 self.temps, self.topps, self.topks), jnp.int32(slot),
                jnp.int32(plen), first_tok,
                jnp.float32(req.temperature), jnp.float32(req.top_p),
                jnp.int32(eff_topk))
            self.tokens_generated += 1
            if req.logprobs:
                req.token_logprobs.append(float(first_lp))
                self._lp_slots[slot] = req
            self.book.admitted(slot, int(first_tok))
            if not self.book.active_mask()[slot]:
                # finished AT admission (first token hit a stop/EOS, or
                # max_new_tokens == 1): the slot is already free — drop
                # the logprobs subscription and release the pages NOW, or
                # the stale subscription would collect the slot's next
                # occupant's logprobs and the pages would leak (the
                # post-step freed-slot sweep only sees slots that were
                # active when the step began; fuzz-found r4)
                self._lp_slots.pop(slot, None)
                if self.paged:
                    self._release_slot_pages(slot)
                self.finished.extend(self.book.drain_finished())
            self._admit_times.append(_time.perf_counter() - t_adm)

    def cancel(self, req_id: int) -> bool:
        res = self.book.cancel(req_id)
        if res is None:
            return False
        kind, info = res
        if kind == "waiting":
            info.done = True
            info.cancelled = True
            self.finished.append(info)
        else:
            self._lp_slots.pop(info, None)   # drop a stale logprobs sub
            if self.paged:
                self._release_slot_pages(info)
            for r in self.book.drain_finished():
                r.done = True
                if r.id == req_id:
                    r.cancelled = True
                self.finished.append(r)
        return True

    # ----------------------------------------------------------------- run
    @property
    def steps(self) -> int:
        return self.book.steps

    @property
    def stats(self) -> Dict[str, float]:
        import time
        wall = (time.perf_counter() - self._t_start) if self._t_start else 0.0
        st = {"tokens_generated": self.tokens_generated,
              "steps": int(self.steps), "wall_s": round(wall, 3),
              "tokens_per_s": round(self.tokens_generated / wall, 2)
              if wall else 0.0}
        if self.draft is not None and self.spec_drafted:
            st["spec_rounds"] = self.spec_rounds
            st["spec_acceptance"] = round(
                self.spec_accepted / self.spec_drafted, 4)
        return self._stats_common(st)

    def step(self):
        import time
        if self._t_start is None:
            self._t_start = time.perf_counter()
        self._admit()
        active = self.book.active_mask()
        if not active.any():
            return False
        if self.draft is not None and self.book.num_waiting == 0:
            return self._spec_step(active)
        n = (self.multi_step
             if self.multi_step > 1 and self.book.num_waiting == 0 else 1)
        if self.paged:
            # reservation at admission means this can only grow within the
            # committed worst case
            self._grow_active_slots(active, self.positions, ahead=n)
        self._key, sub = jax.random.split(self._key)
        try:
            if n > 1:
                toks, lps, self.caches = self._decode_multi(
                    self.model, self.cur_tokens, self.positions,
                    self.caches, self.enc_kvs, self.src_lens, sub,
                    self.temps, self.topps, self.topks, n=n)
            else:
                nxt, lps, self.caches = self._decode(
                    self.model, self.cur_tokens, self.positions,
                    self.caches, self.enc_kvs, self.src_lens, sub,
                    self.temps, self.topps, self.topks)
        except Exception as e:  # noqa: BLE001 — caches were DONATED: after
            # a fault they may point at deleted buffers. Same engine-level
            # recovery as the GPT engine: fail every in-flight request and
            # rebuild the cache state so later submissions still serve.
            self._recover_from_decode_fault(e)
            return True
        if n > 1:
            self.positions = self.positions \
                + jnp.asarray(active, jnp.int32) * n
            self.cur_tokens = toks[-1][:, None]
            toks_host = np.asarray(toks)
            lps_host = np.asarray(lps) if self._lp_slots else None
            for i in range(n):
                active_i = self.book.active_mask()
                if not active_i.any():
                    break
                if self._lp_slots:
                    for slot, r in self._lp_slots.items():
                        if active_i[slot]:
                            r.token_logprobs.append(
                                float(lps_host[i, slot]))
                self.book.record_step(toks_host[i])
                self.tokens_generated += int(active_i.sum())
        else:
            self.positions = self.positions + jnp.asarray(active, jnp.int32)
            self.cur_tokens = nxt[:, None]
            if self._lp_slots:
                lps_host = np.asarray(lps)
                for slot, r in self._lp_slots.items():
                    if active[slot]:
                        r.token_logprobs.append(float(lps_host[slot]))
            self.book.record_step(np.asarray(nxt))
            self.tokens_generated += int(active.sum())
        for slot in np.flatnonzero(active & ~self.book.active_mask()):
            self._lp_slots.pop(int(slot), None)
            if self.paged:
                self._release_slot_pages(int(slot))
        self.finished.extend(self.book.drain_finished())
        return True

    def _spec_step(self, active):
        """One speculative dispatch (queue empty): mirror of the GPT
        engine's _spec_step — with multi_step > 1, that many ROUNDS run
        as one device dispatch and the host replays them in order."""
        n = self.multi_step if self.multi_step > 1 else 1
        if self.paged:
            self._grow_active_slots(active, self.positions,
                                    ahead=n * self.spec_extra)
        self._key, sub = jax.random.split(self._key)
        try:
            if n > 1:
                (cands, produceds, lpss, cur_new, pos_new, self.caches,
                 self.draft_caches) = self._spec_multi(
                    self.model, self.draft, self.cur_tokens, self.positions,
                    self.caches, self.draft_caches, self.enc_kvs,
                    self.draft_enc_kvs, self.src_lens, sub, self.temps,
                    self.topps, self.topks, gamma=self.spec_gamma, n=n)
            else:
                (cand, produced, cur_new, lps, self.caches,
                 self.draft_caches) = self._spec_round(
                    self.model, self.draft, self.cur_tokens, self.positions,
                    self.caches, self.draft_caches, self.enc_kvs,
                    self.draft_enc_kvs, self.src_lens, sub, self.temps,
                    self.topps, self.topks, gamma=self.spec_gamma)
                cands, produceds = cand[None], produced[None]
                lpss = lps[None]
                pos_new = self.positions + produced
        except Exception as e:  # noqa: BLE001 — both cache sets donated
            self._recover_from_decode_fault(e)
            return True
        act = jnp.asarray(active)
        self.positions = jnp.where(act, pos_new, self.positions)
        self.cur_tokens = jnp.where(act[:, None], cur_new.reshape(-1, 1),
                                    self.cur_tokens)
        cands_host = np.asarray(cands)
        produceds_host = np.asarray(produceds)
        lps_host = np.asarray(lpss) if self._lp_slots else None
        # post-truncation acceptance accounting per replayed round — only
        # slots still active host-side count (r4 advisor finding; same
        # fix as ContinuousBatchingEngine._spec_step)
        for i in range(cands_host.shape[0]):
            act_i = self.book.active_mask()
            if not act_i.any():
                break
            accepted = self.book.record_block(cands_host[i],
                                              produceds_host[i])
            self.tokens_generated += int(accepted.sum())
            act_slots = np.flatnonzero(act_i)
            self.spec_rounds += 1
            self.spec_drafted += self.spec_gamma * len(act_slots)
            used = np.minimum(accepted[act_slots],
                              produceds_host[i, act_slots] - 1)
            self.spec_accepted += int(used.clip(min=0).sum())
            if lps_host is not None:
                for s, r in list(self._lp_slots.items()):
                    for j in range(int(accepted[s])):
                        r.token_logprobs.append(float(lps_host[i, s, j]))
        for slot in np.flatnonzero(active & ~self.book.active_mask()):
            self._lp_slots.pop(int(slot), None)
            if self.paged:
                self._release_slot_pages(int(slot))
        self.finished.extend(self.book.drain_finished())
        return True

    def _recover_from_decode_fault(self, e: Exception):
        msg = f"decode step failed: {type(e).__name__}: {e}"
        self._lp_slots.clear()
        for slot in np.flatnonzero(self.book.active_mask()):
            req = self.book.slot_req.get(int(slot))
            if req is not None:
                req.error = msg
                self.book.cancel(req.id)
            if self.paged:
                self._release_slot_pages(int(slot))
        self.finished.extend(self.book.drain_finished())
        if self.paged:
            # rebuild the pool arrays — the old ones were donated into the
            # failed step (page release above emptied the allocator)
            from qgemm_tpu.serving.paged_cache import init_paged_cache
            tmpl = self.caches[0]
            self.caches = [init_paged_cache(
                tmpl.kq.shape[1],
                tmpl.kq.shape[3] * (2 if tmpl.kv_bits == 4 else 1),
                tmpl.n_pages,
                self.max_slots, tmpl.page_table.shape[1])
                for _ in self.model.dec_blocks]
        else:
            self.caches = self.model.init_cache(
                self.max_slots, self.max_dec_len + self.spec_extra,
                quantized=self.quantized_cache)
        if self.draft is not None:
            # the draft caches were donated into the failed round too
            self.draft_caches = self.draft.init_cache(
                self.max_slots, self.max_dec_len + self.spec_extra)
            self.draft_enc_kvs = [tuple(jnp.zeros_like(a) for a in layer)
                                  for layer in self.draft_enc_kvs]
        # enc_kvs were NOT donated, but rebuild them too: their per-slot
        # rows belonged to the requests just failed
        self.enc_kvs = [tuple(jnp.ones_like(a)      # absmax scales -> 1
                              if a.dtype == jnp.float32 and a.shape[-1] == 1
                              else jnp.zeros_like(a)
                              for a in layer) for layer in self.enc_kvs]
        if self.mesh is not None:
            from qgemm_tpu.parallel.sharding import (shard_kv_caches,
                                                     shard_paged_caches)
            self.caches = (shard_paged_caches(self.caches, self.mesh)
                           if self.paged
                           else shard_kv_caches(self.caches, self.mesh))
            self.enc_kvs = shard_kv_caches(self.enc_kvs, self.mesh)
        self.positions = jnp.zeros((self.max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((self.max_slots, 1), jnp.int32)
        self.src_lens = jnp.zeros((self.max_slots,), jnp.int32)

    def run_to_completion(self, max_steps: int = 100000):
        while ((self.book.num_waiting or self.book.num_active)
               and self.steps < max_steps):
            self.step()
        self.finished.extend(self.book.drain_finished())
        return self.finished
