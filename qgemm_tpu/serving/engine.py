"""Continuous batching inference engine.

Greenfield capability (BASELINE north star: "continuous batching across
hosts"; the reference is a single fixed-shape demo). Design:

  * a fixed pool of ``max_slots`` batch slots, each with its own position
    in a shared static-shape KV cache (per-slot ``cache_index`` vector —
    GSPMD/jit-friendly: shapes never change, occupancy is data);
  * every engine ``step()`` runs ONE jitted decode step over all slots;
    inactive slots decode garbage that is masked out on the host;
  * new requests are admitted into free slots between steps; their prompt
    is prefilled into the slot's cache region by a jitted per-slot prefill
    (prompts padded to the slot's bucket length);
  * finished sequences (EOS or max_new_tokens) free their slot immediately —
    the batch never drains, which is the whole point of continuous batching;
  * ``paged=True`` swaps the slot-contiguous cache for the paged int8
    pool (serving/paged_cache.py): per-request worst-case page
    reservation, FIFO backpressure when the pool is oversubscribed, and
    the scalar-prefetch decode kernel.

The model can be fp32/bf16 or int8-quantized (``model.quantize()``); under a
mesh the same engine drives the tensor-sharded model (weights sharded over
``model`` axis; the slot dimension shards over ``data``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Request:
    prompt: List[int]
    max_new_tokens: int = 32
    eos_token: Optional[int] = None
    # sampling (ops/sampling.py): temperature 0 = greedy; top_p 1 = off;
    # top_k None = inherit the engine default, 0 = explicitly off, >0 = cut.
    # All three are per-request DATA (one jitted decode serves mixed
    # settings without recompiling).
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: Optional[int] = None
    # extra stop tokens: ANY generated token in this set finishes the
    # request (in addition to eos_token) — host-side finish rule, both
    # scheduler backends, all decode modes (plain/multi-step/speculative)
    stop_tokens: Optional[List[int]] = None
    # logprobs=True: token_logprobs collects ln p(token) of every generated
    # token under the raw softmax (pre-temperature/filtering — the standard
    # serving logprob), aligned with ``generated``
    logprobs: bool = False
    id: int = field(default_factory=itertools.count().__next__)
    generated: List[int] = field(default_factory=list)
    token_logprobs: List[float] = field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    error: Optional[str] = None


class _PyBookkeeper:
    """Pure-Python host-side serving state machine (queue, slots, positions,
    transcripts, finish rules). Interface-identical to the native C++
    scheduler (csrc/scheduler.cpp via serving/native.py) — tests assert the
    two produce identical transcripts."""

    def __init__(self, max_slots: int, max_seq_len: int):
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len
        self.active = np.zeros((max_slots,), bool)
        self.pos = np.zeros((max_slots,), np.int32)
        self.slot_req: Dict[int, Request] = {}
        self.waiting: List[Request] = []
        self.finished: List[Request] = []
        self.steps = 0

    def submit(self, req: Request, front: bool = False):
        if len(req.prompt) + req.max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"request {req.id}: prompt {len(req.prompt)} + "
                f"{req.max_new_tokens} exceeds max_seq_len {self.max_seq_len}")
        if front:
            self.waiting.insert(0, req)
        else:
            self.waiting.append(req)

    def next_admission(self):
        if not self.waiting or self.active.all():
            return None
        slot = int(np.flatnonzero(~self.active)[0])
        req = self.waiting.pop(0)
        self.pos[slot] = len(req.prompt)
        self.active[slot] = True
        self.slot_req[slot] = req
        return slot, req

    def admitted(self, slot: int, first_token: int):
        self.slot_req[slot].generated.append(int(first_token))
        self._maybe_finish(slot)

    def record_step(self, tokens: np.ndarray):
        for slot in np.flatnonzero(self.active):
            self.pos[slot] += 1
            self.slot_req[int(slot)].generated.append(int(tokens[slot]))
            self._maybe_finish(int(slot))
        self.steps += 1

    def _maybe_finish(self, slot: int):
        req = self.slot_req.get(slot)
        if req is None:
            return
        last = req.generated[-1] if req.generated else None
        if (len(req.generated) >= req.max_new_tokens
                or (req.eos_token is not None and last == req.eos_token)
                or (req.stop_tokens and last in req.stop_tokens)
                or int(self.pos[slot]) >= self.max_seq_len - 1):
            req.done = True
            self.finished.append(req)
            self.active[slot] = False
            del self.slot_req[slot]

    def active_mask(self) -> np.ndarray:
        return self.active.copy()

    def record_block(self, cands: np.ndarray, produced: np.ndarray):
        """Speculative round: append each active slot's own accepted
        candidate block (variable length per slot), honoring EOS /
        max_new truncation mid-block. One scheduler step. Returns the
        per-slot count actually appended (post-truncation)."""
        accepted = np.zeros(self.max_slots, np.int32)
        for slot in np.flatnonzero(self.active):
            req = self.slot_req.get(int(slot))
            for i in range(int(produced[slot])):
                if req is None or req.done:
                    break
                self.pos[slot] += 1
                req.generated.append(int(cands[slot, i]))
                accepted[slot] += 1
                self._maybe_finish(int(slot))
        self.steps += 1
        return accepted

    def suspend_slot(self, slot: int):
        """Drop ``slot`` from the active set without touching its request
        (overlapped-admission decode ticks must not advance or append to
        a slot that is mid-prefill). Pair with ``resume_slot``."""
        assert self.slot_req.get(slot) is not None
        self.active[slot] = False

    def resume_slot(self, slot: int):
        # tolerate a vanished request (decode-fault recovery mid-overlap
        # cancels the admitting slot before the finally-resume runs)
        if self.slot_req.get(slot) is not None:
            self.active[slot] = True

    def preempt(self, req_id: int):
        """Preempt an ACTIVE request: free its slot and REMOVE it (not
        into finished — the engine resubmits a continuation). -> (slot,
        generated-token list) or None when not active."""
        for slot, r in list(self.slot_req.items()):
            if r.id == req_id:
                self.active[slot] = False
                del self.slot_req[slot]
                return slot, list(r.generated)
        return None

    def cancel(self, req_id: int):
        """-> ("waiting", Request) | ("active", slot) | None. An active
        cancel frees the slot immediately and moves the partial transcript
        to finished."""
        for i, r in enumerate(self.waiting):
            if r.id == req_id:
                return "waiting", self.waiting.pop(i)
        for slot, r in list(self.slot_req.items()):
            if r.id == req_id:
                self.active[slot] = False
                del self.slot_req[slot]
                self.finished.append(r)
                return "active", slot
        return None

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_active(self) -> int:
        return int(self.active.sum())

    def drain_finished(self) -> List[Request]:
        out, self.finished = self.finished, []
        return out


class _NativeBookkeeper:
    """The same state machine, run by the C++ scheduler. Request objects
    are materialized back (transcript + done flag) when they finish."""

    def __init__(self, max_slots: int, max_seq_len: int):
        from qgemm_tpu.serving.native import NativeScheduler
        self._sched = NativeScheduler(max_slots, max_seq_len)
        self._by_id: Dict[int, Request] = {}

    def submit(self, req: Request, front: bool = False):
        self._sched.submit(req.id, req.prompt, req.max_new_tokens,
                           req.eos_token, front=front)
        if req.stop_tokens:
            self._sched.set_stops(req.id, req.stop_tokens)
        self._by_id[req.id] = req

    def next_admission(self):
        adm = self._sched.next_admission()
        if adm is None:
            return None
        slot, rid, _prompt = adm
        return slot, self._by_id[rid]

    def admitted(self, slot: int, first_token: int):
        self._sched.admitted(slot, int(first_token))

    def record_step(self, tokens: np.ndarray):
        self._sched.record_step(tokens)

    def record_block(self, cands: np.ndarray, produced: np.ndarray):
        return self._sched.record_block(cands, produced)

    def suspend_slot(self, slot: int):
        self._sched.suspend_slot(slot)

    def resume_slot(self, slot: int):
        self._sched.resume_slot(slot)

    def preempt(self, req_id: int):
        res = self._sched.preempt(req_id)
        if res is None:
            return None
        slot, gen = res
        self._by_id.pop(req_id, None)
        return slot, [int(t) for t in gen]

    def cancel(self, req_id: int):
        res = self._sched.cancel(req_id)
        if res is None:
            return None
        if res == -1:
            return "waiting", self._by_id.pop(req_id)
        return "active", res

    def active_mask(self) -> np.ndarray:
        return self._sched.active_mask()

    @property
    def num_waiting(self) -> int:
        return self._sched.num_waiting

    @property
    def num_active(self) -> int:
        return self._sched.num_active

    @property
    def steps(self) -> int:
        return self._sched.steps

    def drain_finished(self) -> List[Request]:
        out = []
        while True:
            fin = self._sched.pop_finished()
            if fin is None:
                return out
            rid, toks = fin
            req = self._by_id.pop(rid)
            req.generated = [int(t) for t in toks]
            req.done = True
            out.append(req)


def spec_accept(tlogits, d, qx, dlogits, temps, topps, topks, kacc, kextra,
                gamma):
    """Batched Leviathan rejection-sampling acceptance, shared by the GPT
    and seq2seq engines' speculative rounds. tlogits [B, gamma+1, V] (the
    target's verify-chunk logits), d [B, gamma] sampled draft proposals,
    qx [B, gamma] each proposal's probability under the draft's OWN warped
    distribution (captured in sorted space during its sampling pass —
    ops/sampling.sample_logits_with_prob), dlogits [B, gamma, V] the raw
    draft logits (for the one rejection-position leftover); per-slot
    sampling params. Returns (cand [B, gamma+1], produced [B],
    cur_new [B], lps [B, gamma+1]). temperature <= 1e-6 slots degenerate
    to exact greedy verification (both warps one-hot).

    r5 cost shape (verdict item 4): the acceptance ratio only needs the
    drafted token's probability under both warped distributions, so the
    target side evaluates p_i(x_i) as SCALARS in sorted space
    (``warped_token_probs`` — no [B, V] scatter per position), and the
    full warped distributions are materialized at exactly ONE
    data-dependent position per round (the first rejection, for the
    leftover norm(max(0, p - q))) instead of all 2*gamma+1 positions.
    The math is unchanged — exactness (TV-bound tests) is preserved."""
    from qgemm_tpu.ops.sampling import warped_probs, warped_token_probs
    px = jax.vmap(lambda lg, tok: warped_token_probs(lg, tok, temps,
                                                     topks, topps),
                  in_axes=(1, 1), out_axes=1)(tlogits[:, :gamma], d)
    u = jax.random.uniform(kacc, d.shape)
    acc = jnp.cumprod((u * qx < px).astype(jnp.int32), axis=1)
    n_acc = jnp.sum(acc, axis=1)                        # [B]

    # the extra token at the first rejection: leftover distribution
    # norm(max(0, p - q)); after full acceptance q is defined 0 at the
    # bonus position, making the leftover = p_gamma itself
    tl_at = jnp.take_along_axis(tlogits, n_acc[:, None, None],
                                axis=1)[:, 0]           # [B, V]
    p_at = warped_probs(tl_at, temps, topks, topps)
    dl_at = jnp.take_along_axis(
        dlogits, jnp.minimum(n_acc, gamma - 1)[:, None, None],
        axis=1)[:, 0]
    # the draft sampled from its UNFILTERED temperature distribution
    # (see the engines' dstep) — q here must be that same distribution
    q_at = warped_probs(dl_at, temps, 0, 1.0)
    q_at = jnp.where((n_acc < gamma)[:, None], q_at, 0.0)
    resid = jnp.maximum(p_at - q_at, 0.0)
    dist = jnp.where((jnp.sum(resid, axis=1) > 1e-9)[:, None], resid, p_at)
    extra = jax.random.categorical(kextra, jnp.log(dist),
                                   axis=-1).astype(jnp.int32)   # [B]

    idx = jnp.arange(gamma + 1)[None, :]
    dpad = jnp.concatenate([d, d[:, -1:]], axis=1)
    cand = jnp.where(idx < n_acc[:, None], dpad, extra[:, None])
    produced = n_acc + 1
    cur_new = jnp.take_along_axis(cand, (produced - 1)[:, None],
                                  axis=1)[:, 0]
    lps = jax.nn.log_softmax(tlogits.astype(jnp.float32), axis=-1)
    lps = jnp.take_along_axis(lps, cand[..., None], axis=2)[..., 0]
    return cand, produced, cur_new, lps


def _set_slot_state(state, slot, pos, tok, temp, topp, topk):
    """Fused per-slot admission-state write: (positions, cur_tokens,
    temps, topps, topks) updated in ONE dispatch (donated in-place)."""
    positions, cur_tokens, temps, topps, topks = state
    return (positions.at[slot].set(pos),
            cur_tokens.at[slot, 0].set(tok),
            temps.at[slot].set(temp),
            topps.at[slot].set(topp),
            topks.at[slot].set(topk))


def _slice_slot(caches, slot):
    """Per layer: the slot's [1, H, S, *] view of every cache leaf."""
    zero = jnp.zeros((), jnp.int32)
    sl = lambda c: jax.lax.dynamic_slice(
        c, (slot, zero, zero, zero), (1,) + c.shape[1:])
    return [jax.tree.map(sl, c) for c in caches]


def _scatter_slot(caches, sliced, slot):
    """Write the slot's filled cache slice back into the shared caches."""
    zero = jnp.zeros((), jnp.int32)
    put = lambda c, t: jax.lax.dynamic_update_slice(
        c, t, (slot, zero, zero, zero))
    return [jax.tree.map(put, c, t) for c, t in zip(caches, sliced)]


class _PagedPoolOps:
    """Host-side paged-pool plumbing shared by the GPT and seq2seq engines:
    device page-table/step-table sync, per-slot growth, release. Expects
    ``self.alloc`` (PageAllocator), ``self._pt_host`` [slots, pps] int32,
    ``self.caches`` (list of PagedKVCache), ``self._page_size``."""

    def _sync_page_tables(self):
        from dataclasses import replace as _rep

        from qgemm_tpu.serving.paged_cache import build_step_tables
        # ragged-grid step tables: rebuilt on the same event as the page
        # tables (allocation changes), so the decode grid tracks the pages
        # actually allocated instead of slots x pages_per_slot. The bucket
        # rounds T up so jit sees few distinct shapes.
        ss, sp = build_step_tables(
            [len(p) for p in self.alloc.slot_pages],
            self.caches[0].page_table.shape[1])
        # one DISTINCT device array per layer: the decode step donates the
        # cache pytree, and donating the same buffer L times makes XLA
        # demote the duplicates (warning + a copy per step). The tables are
        # tiny (slots x pages_per_slot int32) and sync only when they
        # change.
        self.caches = [_rep(c, page_table=jnp.asarray(self._pt_host),
                            step_slot=jnp.asarray(ss),
                            step_page=jnp.asarray(sp))
                       for c in self.caches]

    def _grow_slot(self, slot: int, n_tokens: int) -> bool:
        """Ensure pages for ``n_tokens``; True if the device tables need a
        sync. Raises only if the request could NEVER fit."""
        new = self.alloc.grow(slot, n_tokens, self._page_size)
        for j, p in new:
            self._pt_host[slot, j] = p
        return bool(new)

    def _release_slot_pages(self, slot: int):
        self.alloc.release(slot)
        self._pt_host[slot, :] = 0

    def _grow_active_slots(self, active, positions, ahead: int = 1):
        """Per decode step: ensure every active slot has pages for the
        next ``ahead`` positions — but NEVER beyond the slot's admission-
        time reservation (multi-step blocks may run past a finishing
        sequence's worst case; those junk writes map to table entries
        still holding 0, i.e. the null page). Syncs device tables if any
        slot grew.

        OVER-COMMIT mode (GPT engine, ``overcommit=True``): the clamp is
        the slot's WORST CASE (its reservation was only pages-needed-now),
        and pool exhaustion preempts the youngest-admitted other slot
        (freeing its pages; its continuation requeues at the front) and
        retries — forward progress is guaranteed because the growing slot
        advances at least one token per preemption cycle. With no victim
        left the growing slot preempts ITSELF (its continuation re-admits
        once pages free up)."""
        overcommit = bool(getattr(self, "overcommit", False))
        pos_host = np.asarray(positions)
        dirty = False
        for slot in np.flatnonzero(active):
            slot = int(slot)
            p = int(pos_host[slot])
            if overcommit:
                want = min(p + ahead, max(int(self._slot_worst[slot]),
                                          p + 1))
            else:
                reserved = len(self.alloc.slot_pages[slot]) \
                    * self._page_size
                want = min(p + ahead, max(reserved, p + 1))
            while True:
                try:
                    dirty |= self._grow_slot(slot, want)
                    break
                except RuntimeError:
                    if not overcommit or not self._preempt_for_pages(slot):
                        raise
                    dirty = True
                    if not self.book.active_mask()[slot]:
                        break            # the slot preempted itself
        if dirty:
            self._sync_page_tables()

    def _stats_common(self, st):
        """Admission-latency percentiles + page-pool occupancy, shared by
        both engines' ``stats``."""
        if self._admit_times:
            at = np.asarray(self._admit_times)
            st["admit_p50_ms"] = round(float(np.percentile(at, 50)) * 1e3, 2)
            st["admit_p95_ms"] = round(float(np.percentile(at, 95)) * 1e3, 2)
            st["admissions"] = len(at)
        if self.paged:
            total = self.caches[0].n_pages - 1      # page 0 reserved
            st["pages_in_use"] = total - self.alloc.n_free
            st["pages_total"] = total
        return st


class ContinuousBatchingEngine(_PagedPoolOps):
    def __init__(self, model, max_slots: int = 8,
                 max_seq_len: Optional[int] = None,
                 scheduler: str = "auto", quantized_cache: bool = False,
                 top_k: int = 0, seed: int = 0, mesh=None,
                 paged: bool = False, n_pages: Optional[int] = None,
                 chunked_prefill: Optional[int] = None,
                 prefix_cache: bool = True, multi_step: int = 0,
                 draft_model=None, spec_gamma: int = 4,
                 overcommit: bool = False,
                 page_size: Optional[int] = None,
                 overlap_admission: bool = False, kv_bits: int = 8):
        """``scheduler``: "python", "native" (C++ csrc/scheduler.cpp), or
        "auto" (native when the shared library is built).
        ``quantized_cache``: int8 KV cache (ops/kv_cache.py) — halves the
        cache's HBM footprint, so 2x the slots or context per chip.
        ``top_k``: engine-wide top-k sampling cutoff (0 = off); per-request
        temperature/top_p come from the Request.
        ``mesh``: tensor-parallel serving — pass the mesh the model was
        sharded over (``parallel.sharding.shard_quantized_model``); the KV
        cache is head-sharded over its ``model`` axis to match the
        column-sharded K/V projections.
        ``paged``: block-table KV cache (serving/paged_cache.py, int8):
        each admission reserves pages for its own worst case
        (prompt + max_new_tokens), so cache HBM scales with committed
        per-request maxima instead of slots x engine max_seq_len.
        ``n_pages`` sizes the pool (default: full provisioning; pass less
        to oversubscribe — admissions that don't fit wait in the queue
        until finishing requests release pages).
        ``prefix_cache`` (paged mode): automatic prefix caching — full
        128-token prompt pages whose token chunks match an earlier
        request's prefix SHARE physical pages (refcounted; idle published
        pages stay in an LRU cache until pool pressure evicts them), so
        repeated system prompts cost no pool pages. Transparent: page
        content is a pure function of the token chunk and its positions.
        ``chunked_prefill``: chunk size (e.g. 256). Prompts longer than one
        chunk are admitted chunk by chunk through ONE compiled fixed-shape
        program (reused across chunk positions, slots and prompt lengths),
        so admission compile cost is bounded by three programs total
        (slice slot cache / fill chunk / scatter back) instead of one
        compile per pow2 prompt bucket — and a 2048-token admission never
        triggers a large one-off compile. In PAGED mode the chunk size
        rounds up to whole pages and each chunk runs the same compiled
        suffix-chunk program as the prefix compute-skip (one executable
        for every paged prompt length; composes with prefix caching and
        TP).
        ``multi_step``: run K decode steps per dispatch (one lax.scan)
        whenever the waiting queue is empty — per-token host round trips
        (dispatch overhead locally; full RTTs over a remote runtime)
        amortize K-fold. Sequences that finish mid-block keep decoding
        junk into their own reserved region for the rest of the block;
        bookkeeping discards it (padded-decode contract). Greedy
        transcripts are identical to single-step; sampled ones draw from
        the same warped distributions through a different key sequence.
        Admissions are never delayed: any waiting request drops the
        engine back to single steps until admitted.
        ``draft_model``: CONTINUOUS-BATCHING SPECULATIVE DECODING — when
        nothing waits for a slot, each step drafts ``spec_gamma`` tokens
        per slot (batched draft decode scan) and verifies ALL slots in
        one batched multi-token target forward (``prefill_chunk`` at
        per-slot offsets); each slot advances by its own accepted-prefix
        length + 1. Verification is STOCHASTIC (Leviathan rejection
        sampling with each slot's own temperature/top-k/top-p), so
        speculation serves MIXED batches: sampled slots' token streams
        are distributed exactly as sequential warped-target sampling,
        and temperature-0 slots degenerate to exact greedy verification
        — their transcripts stay bit-equal to the plain engine's.
        ``overcommit`` (paged mode): admit on pages needed NOW (prompt
        + one decode page) instead of reserving every request's worst
        case (prompt + max_new_tokens) up front — an undersized pool
        holds MORE resident slots, since requests that stop early never
        strand reserved tail pages. When the pool runs dry mid-decode
        the YOUNGEST-admitted slot is preempted (vLLM-style recompute:
        its pages are freed and a continuation request — original
        prompt + tokens so far — requeues at the FRONT; re-admission
        recomputes via the prefix-cache compute-skip path, which makes
        the recompute nearly free for shared-prefix workloads). Greedy
        transcripts are preserved across preemption (the continuation's
        next token comes from the same logits, modulo bf16 chunk-vs-
        step near-tie rounding — the chunked-prefill caveat); sampled
        requests draw from the same warped distributions through a
        different key sequence. ``stats()`` reports ``preemptions`` and
        reserved-vs-used pages.
        ``kv_bits=4`` (paged mode): int4-packed KV pools (two nibbles
        per byte along the head dim, per-position absmax at range +-7 —
        ops/kv_cache.quantize_kv_int4). Halves the cache's HBM bytes and
        decode read stream again over int8 and composes with GQA's 1/g;
        the quality trade is pinned in RESULTS_QUALITY.md (int4-KV KL on
        the trained checkpoint). Composes with prefix caching (page
        content is still a pure function of the token chunk), chunked
        admission, speculation and TP.
        ``overlap_admission`` (paged + chunked_prefill): interleave ONE
        decode dispatch between admission prefill chunks, so resident
        slots keep generating through a long admission instead of
        stalling for the whole chunked prefill (Sarathi-style, host-
        sequenced). The admitting slot is parked on a never-allocated
        page-table column so its junk writes hit the null page. Greedy
        transcripts are unchanged; sampled slots draw through a
        different key sequence. ``stats()``'s itl_p50_ms/itl_p95_ms pin
        the inter-token-latency effect.
        Works over BOTH cache tiers: dense, and paged (the verify
        chunk scatters candidate rows through the page tables and
        context-attends each slot at its own offset; per-slot reservations
        grow by spec_extra so rejected-candidate junk rows land in the
        slot's own pages). The draft keeps a dense cache either way — it
        is the small model. Works with both scheduler backends (the C++
        scheduler replays accepted blocks natively). Slots decoded
        without the draft (admission pressure
        forces plain steps) leave holes in the draft's cache —
        acceptance drops but exactness is untouched (the verifier is
        the target)."""
        self.model = model
        self.max_slots = max_slots
        self.max_seq_len = max_seq_len or model.cfg.max_seq_len
        self.quantized_cache = quantized_cache
        self.top_k = top_k
        self.mesh = mesh
        self._key = jax.random.PRNGKey(seed)

        self.draft = draft_model
        self.spec_gamma = int(spec_gamma)
        # a spec round writes candidate K/V up to gamma+1 positions past a
        # slot's current one; every cache extent/reservation must cover it
        self.spec_extra = (self.spec_gamma + 2) if draft_model is not None \
            else 0
        # speculative mode works with BOTH scheduler backends: the C++
        # scheduler's qg_sched_record_block replays per-slot variable-
        # length accepted blocks with the same truncation rules
        if scheduler == "auto":
            from qgemm_tpu.serving import native
            scheduler = "native" if native.available() else "python"
        book_cls = (_NativeBookkeeper if scheduler == "native"
                    else _PyBookkeeper)
        self.book = book_cls(max_slots, self.max_seq_len)
        self.scheduler = scheduler

        self.paged = paged
        self.overcommit = overcommit and paged
        self.preemptions = 0
        # preempted-request continuity: id -> {"req": original Request,
        # "gen": tokens produced before (the latest) preemption, "lps":
        # their logprobs}; merged back at finalization
        self._preempted: Dict[int, dict] = {}
        self._admit_seq: Dict[int, int] = {}   # slot -> admission counter
        self._admit_counter = 0
        self._slot_worst = np.zeros((max_slots,), np.int64)
        self.prefix_cache = prefix_cache and paged
        if self.prefix_cache and mesh is not None:
            # the compute-skip suffix prefill runs the paged chunk program
            # under shard_map with head-sharded pools — possible only when
            # both head counts divide the model axis; otherwise disable
            # prefix caching up front (serving stays correct, just without
            # sharing) instead of failing every matched-prefix admission
            cfg_ = model.cfg
            p_ = dict(mesh.shape).get("model", 1)
            hkv_ = getattr(cfg_, "n_kv_heads", 0) or cfg_.n_heads
            if cfg_.n_heads % p_ or hkv_ % p_:
                import warnings
                warnings.warn(
                    f"prefix_cache disabled: head counts ({cfg_.n_heads}, "
                    f"{hkv_}) must divide the model axis ({p_}) for the "
                    "TP suffix prefill", stacklevel=2)
                self.prefix_cache = False
        if paged:
            from qgemm_tpu.serving.paged_cache import (PAGE_SIZE,
                                                       PageAllocator,
                                                       init_paged_cache)
            # ``page_size`` (default 128, the lane-tile row count) trades
            # per-page kernel-step efficiency against allocator
            # granularity — scripts/bench_page_size.py measures the sweep;
            # TPU pools need a multiple of 32 (int8 sublane tiling)
            ps = page_size or PAGE_SIZE
            cfg = model.cfg
            pps = -(-self.max_seq_len // ps)
            self.max_seq_len = pps * ps
            # speculative mode: the verify chunk writes up to spec_extra
            # rows past a slot's final position — widen the per-slot table
            # (and reservations below) so those junk rows land in the
            # slot's own extra page, never clamp-scatter onto a valid one
            pps += -(-self.spec_extra // ps)
            npg = n_pages or (1 + max_slots * pps)
            dh = cfg.d_model // cfg.n_heads
            # GQA: pools hold n_kv_heads — 1/g the page bytes of MHA
            hkv = getattr(cfg, "n_kv_heads", 0) or cfg.n_heads
            # +1 PARKING column: one page-table entry per slot that is
            # never allocated (always the null page). Overlapped-admission
            # decode ticks park the admitting slot's position there, so
            # its junk K/V writes land on page 0 instead of corrupting
            # the prompt pages the admission chunks are filling.
            assert kv_bits in (8, 4), kv_bits
            self._pt_host = np.zeros((max_slots, pps + 1), np.int32)
            self.caches = [init_paged_cache(hkv, dh, npg,
                                            max_slots, pps + 1,
                                            page_size=ps, kv_bits=kv_bits)
                           for _ in model.blocks]
            self.alloc = PageAllocator(npg, max_slots, pps)
            self._page_size = ps
            self._park_pos = pps * ps
        else:
            # speculative mode verifies gamma+1 candidate positions past a
            # slot's current position — the extent must cover them or the
            # clamped chunk write would smear junk over VALID rows
            self.caches = model.init_cache(max_slots,
                                           self.max_seq_len + self.spec_extra,
                                           quantized=quantized_cache)
        if draft_model is not None:
            # the draft's own cache stays DENSE in both modes (it is the
            # small model; paging the target's pool is the capacity win)
            self.draft_caches = draft_model.init_cache(
                max_slots, self.max_seq_len + self.spec_extra)
        if mesh is not None:
            if paged:
                from qgemm_tpu.parallel.sharding import shard_paged_caches
                self.caches = shard_paged_caches(self.caches, mesh)
            else:
                from qgemm_tpu.parallel.sharding import shard_kv_caches
                self.caches = shard_kv_caches(self.caches, mesh)
        self.positions = jnp.zeros((max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((max_slots, 1), jnp.int32)
        self.temps = jnp.zeros((max_slots,), jnp.float32)   # 0 = greedy
        self.topps = jnp.ones((max_slots,), jnp.float32)
        self.topks = jnp.zeros((max_slots,), jnp.int32)     # 0 = off
        self.finished: List[Request] = []
        self.tokens_generated = 0
        self.spec_rounds = 0          # speculative observability: rounds,
        self.spec_drafted = 0         # draft tokens proposed, and draft
        self.spec_accepted = 0        # tokens the verifier accepted
        self.overlap_admission = overlap_admission and paged
        # inter-token latency observability: wall-clock gap between
        # consecutive decode dispatches while slots are resident — the
        # ITL every in-flight request experiences, INCLUDING admission
        # stalls (r4 verdict item 7). Bounded ring of recent samples.
        self._itl: List[float] = []
        self._last_tick_t: Optional[float] = None
        self._t_start: Optional[float] = None

        # donate the caches into the decode step: without donation XLA must
        # COPY every cache buffer per step (the input can't be updated in
        # place), which for a GB-scale cache dwarfs the attention itself.
        # The engine always replaces self.caches with the returned pytree,
        # so the donated input is never reused. Prefill is NOT donated: its
        # error-isolation path keeps using the old caches on failure.
        self._decode = jax.jit(self._decode_impl, donate_argnums=(3,))
        self.multi_step = int(multi_step)
        self._decode_multi = jax.jit(self._decode_multi_impl,
                                     donate_argnums=(3,),
                                     static_argnames=("n",))
        if draft_model is not None:
            self._spec_round = jax.jit(self._spec_round_impl,
                                       donate_argnums=(4, 5),
                                       static_argnames=("gamma",))
            self._spec_multi = jax.jit(self._spec_multi_impl,
                                       donate_argnums=(4, 5),
                                       static_argnames=("gamma", "n"))
            self._draft_prefill = jax.jit(self._draft_prefill_impl,
                                          static_argnames=("plen",))
        # ONE dispatch for the five per-slot state writes at admission
        # (five separate .at[].set calls each pay a full dispatch — over a
        # remote tunnel that is 5 RTTs per admission, the measured
        # admission-latency floor; r4)
        self._set_slot = jax.jit(_set_slot_state, donate_argnums=(0,))
        self._prefill = jax.jit(self._prefill_impl, static_argnames=("plen",))
        self._prefill_paged = jax.jit(self._prefill_paged_impl,
                                      static_argnames=("plen",))
        self._prefill_paged_suffix = jax.jit(
            self._prefill_paged_suffix_impl, static_argnames=("plen",))
        self.chunked_prefill = chunked_prefill
        self._paged_chunk: Optional[int] = None
        self._admit_times: List[float] = []
        self._lp_slots: Dict[int, Request] = {}
        self.prefill_tokens_skipped = 0
        if chunked_prefill and paged:
            # paged chunked admission: prompts are fed chunk-by-chunk
            # through the SAME compiled suffix-chunk program the prefix
            # compute-skip uses (each chunk writes its pages and
            # context-attends everything <= its own positions), so a long
            # uncached prompt never triggers a per-pow2-bucket compile
            # (13-20 s per new bucket by the repo's own measurement).
            # Chunks are page-granular: writes land on whole pages.
            self._paged_chunk = \
                -(-chunked_prefill // self._page_size) * self._page_size
        elif chunked_prefill:
            self._slice_slot = jax.jit(_slice_slot)
            # the sliced caches are DONATED chunk to chunk (in-place fill);
            # self.caches is never donated here, so a failing chunk leaves
            # the engine intact (per-request error isolation preserved)
            self._chunk_fill = jax.jit(
                lambda model, tok, off, sliced: model.prefill_chunk(
                    tok, off, sliced), donate_argnums=(3,))
            self._scatter_slot = jax.jit(_scatter_slot)
            from qgemm_tpu.ops.sampling import sample_logits as _sl
            from qgemm_tpu.ops.sampling import token_logprob as _tlp

            def _sample_at_impl(logits, idx, key, t, p, k):
                last = jnp.take(logits[0], idx, axis=0)[None]
                tok = _sl(last, key, temperature=t, top_k=k, top_p=p)
                return tok[0], _tlp(last, tok)[0]
            self._sample_at = jax.jit(_sample_at_impl)

    # ------------------------------------------------------------- jit fns
    def _decode_impl(self, model, tok, pos, caches, key, temps, topps, topks):
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        logits, caches = model.decode_step(tok, pos, caches)
        nxt = sample_logits(logits, key, temperature=temps,
                            top_k=topks, top_p=topps)
        return nxt, token_logprob(logits, nxt), caches

    def _draft_prefill_impl(self, draft, prompt, caches, slot, plen):
        """Write the draft model's prompt K/V into its own slot cache
        (no sampling — the draft only proposes during spec rounds)."""
        tmp = draft.init_cache(1, plen)
        _, tmp = draft.prefill(prompt, tmp)
        zero = jnp.zeros((), jnp.int32)
        scatter = lambda c, t: jax.lax.dynamic_update_slice(
            c, t, (slot, zero, zero, zero))
        return [jax.tree.map(scatter, c, t) for c, t in zip(caches, tmp)]

    def _spec_round_impl(self, model, draft, cur, pos, caches, dcaches,
                         key, temps, topps, topks, gamma):
        """One batched speculative round over ALL slots, STOCHASTIC
        (Leviathan rejection sampling, per-slot sampling params): the
        draft scans gamma+1 decode steps sampling each proposal from its
        own warped distribution q (the extra step closes the
        full-acceptance cache hole), the target verifies every slot's
        candidate block in ONE multi-token forward at per-slot offsets
        and warps each position with the slot's temperature/top-k/top-p;
        proposal x_i accepts with prob min(1, p_i(x_i)/q_i(x_i)), the
        first rejection resamples from the leftover norm(max(0, p-q)),
        full acceptance samples a bonus token from p_gamma — each slot's
        token stream is distributed EXACTLY as sequential warped-target
        sampling. temperature <= 1e-6 slots degenerate to exact greedy
        speculation (both warps become one-hots: acceptance == argmax
        agreement, the leftover is the target's argmax), so greedy
        transcripts stay bit-equal to the plain engine. cur [B,1];
        pos/temps/topps/topks [B]. Returns (cand [B,gamma+1],
        produced [B], cur_new [B], lps [B,gamma+1], caches, dcaches)."""
        from qgemm_tpu.ops.sampling import sample_logits_with_prob
        kd, kacc, kextra = jax.random.split(key, 3)

        def dstep(carry, j):
            tok, dc, k = carry
            k, ks = jax.random.split(k)
            logits, dc = draft.decode_step(tok, pos + j, dc)
            # the draft proposes from its UNFILTERED temperature
            # distribution (sort-free fast path — top-k/top-p literals
            # engage it regardless of per-slot params): Leviathan
            # exactness holds for ANY draft distribution, so the slot's
            # filters live only in the verifier's p; proposals outside
            # the nucleus simply reject (acceptance cost ~1-top_p).
            # A full-vocab argsort per draft step (the exact-nucleus
            # sampling price) measured 4.8x greedy at V=50k — this path
            # is what makes stochastic speculation affordable.
            nxt, qx = sample_logits_with_prob(logits, ks, temps, 0, 1.0)
            return (nxt[:, None], dc, k), (nxt, qx, logits)

        (_, dcaches, _), (props, qxs, dlogits) = jax.lax.scan(
            dstep, (cur, dcaches, kd), jnp.arange(gamma + 1))
        d = props[:gamma].T                                  # [B, gamma]
        qx = qxs[:gamma].T                                   # [B, gamma]
        dlog = dlogits[:gamma].transpose(1, 0, 2)            # [B, gamma, V]
        seq = jnp.concatenate([cur, d], axis=1)              # [B, gamma+1]
        tlogits, caches = model.prefill_chunk(seq, pos, caches)
        cand, produced, cur_new, lps = spec_accept(
            tlogits, d, qx, dlog, temps, topps, topks, kacc, kextra, gamma)
        return cand, produced, cur_new, lps, caches, dcaches

    def _spec_multi_impl(self, model, draft, cur, pos, caches, dcaches,
                         key, temps, topps, topks, gamma, n):
        """``n`` speculative rounds in ONE dispatch (lax.scan over
        ``_spec_round_impl``) — the multi_step treatment applied to
        speculation: per-round host round trips amortize n-fold ON TOP of
        each round's (accepted+1)-tokens-per-target-pass. Positions chain
        through the scan (each round starts where the previous one's
        accepted block ended — per-slot, data-dependent); slots finishing
        mid-scan junk-decode into their own reserved region (the
        padded-decode contract: clamped/dropped writes land in the slot's
        own pages or extent tail, never another slot's — host bookkeeping
        replays the rounds in order and discards post-finish junk).
        Returns stacked per-round (cands [n,B,gamma+1], produceds [n,B],
        lps [n,B,gamma+1]) + final (cur, pos, caches, dcaches)."""
        def sub(carry, k):
            cur, pos, caches, dcaches = carry
            cand, produced, cur_new, lps, caches, dcaches = \
                self._spec_round_impl(model, draft, cur, pos, caches,
                                      dcaches, k, temps, topps, topks,
                                      gamma)
            return (cur_new[:, None], pos + produced, caches, dcaches), \
                (cand, produced, lps)

        (cur, pos, caches, dcaches), (cands, produceds, lpss) = \
            jax.lax.scan(sub, (cur, pos, caches, dcaches),
                         jax.random.split(key, n))
        return cands, produceds, lpss, cur, pos, caches, dcaches

    def _decode_multi_impl(self, model, tok, pos, caches, key, temps,
                           topps, topks, n):
        """``n`` decode steps in ONE dispatch (lax.scan): per-token host
        round trips — dispatch overhead locally, full RTTs on a remote
        tunnel — amortize n-fold. Returns tokens/logprobs for every
        sub-step [n, slots]; host bookkeeping replays them and discards
        anything a slot produced after its own finish (the padded-decode
        contract: junk positions are never attended and the slot's next
        occupant prefills over them)."""
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob

        def sub(carry, k):
            tok, pos, caches = carry
            logits, caches = model.decode_step(tok, pos, caches)
            nxt = sample_logits(logits, k, temperature=temps,
                                top_k=topks, top_p=topps)
            return (nxt[:, None], pos + 1, caches), \
                (nxt, token_logprob(logits, nxt))

        (tok, pos, caches), (toks, lps) = jax.lax.scan(
            sub, (tok, pos, caches), jax.random.split(key, n))
        return toks, lps, caches

    def _prefill_impl(self, model, prompt, plen_true, caches, slot,
                      key, temp, topp, topk, plen):
        """Prefill one slot: run the (bucket-padded) prompt [1, plen] through
        the model with a fresh cache region, then write the slot's K/V rows
        into the shared cache with ONE ``dynamic_update_slice`` per leaf at
        the slot index — admission HBM traffic is O(prompt x layers x d), not
        a rewrite of the whole [slots, H, S, D] cache (the jnp.where scatter
        this replaces moved GBs per admission at 6.7B/16 slots). ``plen`` is
        the static bucket length (one compile per bucket); ``plen_true`` is
        the traced true prompt length (junk K/V beyond it — including stale
        rows from the slot's previous occupant — is never attended: decode
        masks strictly by per-slot position)."""
        tmp_caches = model.init_cache(1, plen,
                                      quantized=self.quantized_cache)
        logits, tmp_caches = model.prefill(prompt, tmp_caches)

        def scatter(c_full, c_tmp):
            # every cache leaf (K/V values or scales, float or int8) is
            # [B, H, S, *] with positions on axis 2; write the [1, H, plen, *]
            # block in place at (slot, 0, 0, 0)
            zero = jnp.zeros((), jnp.int32)
            return jax.lax.dynamic_update_slice(
                c_full, c_tmp, (slot, zero, zero, zero))

        new_caches = [jax.tree.map(scatter, c, t)
                      for c, t in zip(caches, tmp_caches)]
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        last_logits = jnp.take(logits[0], plen_true - 1, axis=0)
        first_tok = sample_logits(last_logits[None], key, temperature=temp,
                                  top_k=topk, top_p=topp)[0]
        first_lp = token_logprob(last_logits[None], first_tok[None])[0]
        return first_tok, first_lp, new_caches

    def _prefill_paged_impl(self, model, prompt, plen_true, caches, slot,
                            key, temp, topp, topk, plen):
        """Paged prefill: run the bucket-padded prompt through the model
        with a throwaway dense cache (batch 1), then write its K/V into the
        slot's pages. ``plen`` is a multiple of the page size; logical
        pages beyond the allocation point at the null page (reserved,
        never read)."""
        from qgemm_tpu.serving.paged_cache import paged_write_prompt
        tmp = model.init_cache(1, plen)
        logits, tmp = model.prefill(prompt, tmp)
        new_caches = [paged_write_prompt(pc, slot, t[0][0], t[1][0])
                      for pc, t in zip(caches, tmp)]
        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        last_logits = jnp.take(logits[0], plen_true - 1, axis=0)
        first_tok = sample_logits(last_logits[None], key, temperature=temp,
                                  top_k=topk, top_p=topp)[0]
        first_lp = token_logprob(last_logits[None], first_tok[None])[0]
        return first_tok, first_lp, new_caches

    def _prefill_paged_suffix_impl(self, model, suffix, last_idx, caches,
                                   slot, skip_pages, key, temp, topp, topk,
                                   plen):
        """Prefix-cache COMPUTE SKIP: the prompt's first ``skip_pages``
        pages were acquired shared from the prefix cache, so only the
        (page-aligned, bucket-padded) SUFFIX runs through the model —
        each layer writes the suffix chunk's K/V into the slot's pages and
        context-attends the shared prefix pages plus itself (causal). The
        model never touches the matched prefix: admission compute drops to
        suffix/prompt of the full prefill."""
        from dataclasses import replace as _rep

        from qgemm_tpu.ops.sampling import sample_logits, token_logprob
        views = [_rep(c, page_table=jax.lax.dynamic_slice_in_dim(
            c.page_table, slot, 1, axis=0), step_slot=None, step_page=None)
            for c in caches]
        offset = skip_pages * self._page_size
        logits, views2 = model.prefill_chunk(suffix, offset, views)
        new_caches = [_rep(c, kq=v.kq, kc=v.kc, vq=v.vq, vc=v.vc)
                      for c, v in zip(caches, views2)]
        last_logits = jnp.take(logits[0], last_idx, axis=0)
        first_tok = sample_logits(last_logits[None], key, temperature=temp,
                                  top_k=topk, top_p=topp)[0]
        first_lp = token_logprob(last_logits[None], first_tok[None])[0]
        return first_tok, first_lp, new_caches

    # ---------------------------------------------------------------- admin
    def submit(self, req: Request):
        self.book.submit(req)

    def _admit(self):
        while True:
            adm = self.book.next_admission()
            if adm is None:
                return
            slot, req = adm
            plen = len(req.prompt)
            # bucket prompt length (pow2, clamped to the cache extent so the
            # dynamic_update_slice block always fits) to bound recompilation;
            # paged mode buckets in whole pages
            floor = self._page_size if self.paged else 8
            bucket = min(max(floor, 1 << (plen - 1).bit_length()),
                         self.max_seq_len)
            prompt = jnp.asarray(
                np.pad(np.asarray(req.prompt, np.int32), (0, bucket - plen))[None, :])
            eff_topk = self.top_k if req.top_k is None else req.top_k
            if self.paged:
                def _unadmit():
                    """Undo this admission: free the slot, keep any OTHER
                    requests the bookkeeper finished in the meantime."""
                    self.book.cancel(req.id)
                    for r in self.book.drain_finished():
                        if r.id != req.id:
                            self.finished.append(self._finalize(r))

                # reserve the request's WORST CASE (prompt + max_new) at
                # admission by allocating it eagerly: mid-decode growth can
                # then never exhaust the pool. HBM scales with committed
                # per-request maxima rather than slots x engine max_seq_len
                # (requests that finish early on EOS release the tail).
                # spec mode: the verify chunk writes spec_extra junk rows
                # past the worst-case final position — reserve them too
                worst = min(plen + req.max_new_tokens, self.max_seq_len) \
                    + self.spec_extra
                need = self.alloc.pages_needed(worst, self._page_size)
                if self.overcommit:
                    # over-commit: reserve only what the admission needs
                    # NOW (prompt + the first decode page + the spec junk
                    # margin); decode growth allocates the rest on demand
                    # and preempts the youngest slot when the pool runs
                    # dry. headroom (1 page per active slot) damps
                    # admit/preempt thrash.
                    now_tokens = min(plen + 1 + self.spec_extra, worst)
                    need_res = self.alloc.pages_needed(now_tokens,
                                                       self._page_size)
                    headroom = self.book.num_active
                else:
                    now_tokens, need_res, headroom = worst, need, 0
                # prefix cache: hash-chain the FULL prompt pages and PEEK
                # (no acquisition yet — the checks below may reject or
                # requeue this admission) for the longest published prefix;
                # matched pages are shared, shrinking the pool demand
                ps = self._page_size
                hashes = []
                if self.prefix_cache:
                    import hashlib
                    h = b""
                    for j in range(plen // ps):
                        chunk = np.asarray(req.prompt[j * ps:(j + 1) * ps],
                                           np.int64).tobytes()
                        h = hashlib.sha1(h + chunk).digest()
                        hashes.append(h)
                n_match = self.alloc.peek_prefix(hashes)
                # compute skip: always recompute at least the final prompt
                # token (its logits seed generation). Acquire shared ONLY
                # the pages the admission will NOT recompute: the suffix
                # prefill rewrites pages >= skip_pages, and rewriting a
                # refcounted shared page (possibly held by a live request,
                # published in the prefix map) with K/V recomputed by a
                # different program would silently change shared content
                # under a concurrent reader (r3 advisor finding).
                skip_pages = min(n_match, (plen - 1) // ps)
                pool_cap = self.caches[0].n_pages - 1     # page 0 reserved
                if need > self.alloc.pages_per_slot or need_res > pool_cap:
                    # could NEVER fit (even with the pool empty) — finish
                    # with an error instead of backpressuring forever.
                    # (over-commit only needs the pool to hold need_res;
                    # the table must still hold the worst case.)
                    req.error = (f"request needs {need} pages > "
                                 f"{min(self.alloc.pages_per_slot, pool_cap)}"
                                 " available per request")
                    req.done = True
                    _unadmit()
                    self.finished.append(self._finalize(req))
                    continue
                # matched pages that are idle in the LRU count toward
                # n_free but will be CONSUMED by acquisition — subtract
                # them or the grow below could exhaust the pool mid-admit
                resurrect = self.alloc.peek_prefix_cached(hashes, skip_pages)
                if need_res - skip_pages > self.alloc.n_free - resurrect \
                        - headroom:
                    # backpressure: not enough free pages NOW — requeue at
                    # the FRONT (FIFO preserved, no starvation) and stop
                    # admitting until finishing requests release pages
                    _unadmit()
                    req.done = False
                    self.book.submit(req, front=True)
                    return
                try:
                    for j in range(skip_pages):
                        p = self.alloc.acquire_shared(slot, hashes[j])
                        self._pt_host[slot, j] = p
                    grew = self._grow_slot(slot, now_tokens)
                except RuntimeError:
                    # accounting drift must never kill the batch: release
                    # whatever this admission took and requeue it
                    self._release_slot_pages(slot)
                    _unadmit()
                    req.done = False
                    self.book.submit(req, front=True)
                    return
                if grew or skip_pages:
                    self._sync_page_tables()
                self._slot_worst[slot] = worst
                self._admit_counter += 1
                self._admit_seq[slot] = self._admit_counter
            import time as _time
            t_adm = _time.perf_counter()
            try:
                # split the key only once the admission is COMMITTED (after
                # the paged backpressure/never-fit checks above): a requeued
                # or rejected admission must not advance the RNG stream, or
                # sampled outputs would depend on pool-pressure timing
                self._key, sub = jax.random.split(self._key)
                if (self.chunked_prefill and not self.paged
                        and plen > self.chunked_prefill):
                    first_tok, first_lp, self.caches = self._admit_chunked(
                        req, slot, plen, sub, eff_topk)
                else:
                    # skip_pages is 0 whenever prefix_cache is off/missed.
                    # The fixed-size tail padding must also FIT the slot's
                    # page table (review r4: a padded extent one page past
                    # the table width would clamp-gather onto the LAST
                    # logical page and overwrite real prompt K/V with
                    # padding junk) — otherwise fall through to the
                    # non-chunked paths, whose page-aligned buckets never
                    # overflow.
                    chunk_fits = False
                    if self.paged and self._paged_chunk:
                        rem = plen - skip_pages * ps
                        n_ch = -(-rem // self._paged_chunk)
                        chunk_fits = (skip_pages * ps
                                      + n_ch * self._paged_chunk
                                      <= self.alloc.pages_per_slot * ps)
                    if (self.paged and self._paged_chunk and chunk_fits
                            and plen - skip_pages * ps > self._paged_chunk):
                        first_tok, first_lp, self.caches = \
                            self._admit_paged_chunked(
                                req, slot, plen, skip_pages, sub, eff_topk)
                        self.prefill_tokens_skipped += skip_pages * ps
                    elif self.paged and self.prefix_cache and skip_pages > 0:
                        suffix_len = plen - skip_pages * ps
                        sbucket = -(-suffix_len // ps) * ps
                        suffix = jnp.asarray(np.pad(
                            np.asarray(req.prompt[skip_pages * ps:],
                                       np.int32),
                            (0, sbucket - suffix_len))[None, :])
                        first_tok, first_lp, self.caches = \
                            self._prefill_paged_suffix(
                                self.model, suffix,
                                jnp.int32(suffix_len - 1), self.caches,
                                jnp.int32(slot), jnp.int32(skip_pages),
                                sub, jnp.float32(req.temperature),
                                jnp.float32(req.top_p), jnp.int32(eff_topk),
                                plen=sbucket)
                        self.prefill_tokens_skipped += skip_pages * ps
                    else:
                        prefill_fn = (self._prefill_paged if self.paged
                                      else self._prefill)
                        first_tok, first_lp, self.caches = prefill_fn(
                            self.model, prompt, jnp.int32(plen), self.caches,
                            jnp.int32(slot), sub, jnp.float32(req.temperature),
                            jnp.float32(req.top_p), jnp.int32(eff_topk),
                            plen=bucket)
                if self.draft is not None:
                    # the draft model prefills the same prompt into ITS
                    # slot cache so spec rounds propose with full context
                    self.draft_caches = self._draft_prefill(
                        self.draft, prompt, self.draft_caches,
                        jnp.int32(slot), plen=bucket)
            except Exception as e:  # noqa: BLE001 — per-request isolation:
                # a failing prefill (bad values, compile error for a new
                # bucket, transient backend fault) must not kill the batch
                req.error = f"{type(e).__name__}: {e}"
                req.done = True
                self.book.cancel(req.id)       # frees the slot
                if self.paged:
                    self._release_slot_pages(slot)
                for r in self.book.drain_finished():
                    if r.id != req.id:
                        self.finished.append(self._finalize(r))
                self.finished.append(self._finalize(req))
                continue
            if self.paged and self.prefix_cache:
                # publish this prompt's full pages for future admissions
                # (no-op for ones that were themselves acquired shared)
                for j, hh in enumerate(hashes):
                    self.alloc.publish(slot, j, hh)
            # position = true prompt length (next write goes there)
            (self.positions, self.cur_tokens, self.temps, self.topps,
             self.topks) = self._set_slot(
                (self.positions, self.cur_tokens, self.temps, self.topps,
                 self.topks), jnp.int32(slot), jnp.int32(plen), first_tok,
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
                self.finished.extend(self._drain_finished())
            self._admit_times.append(_time.perf_counter() - t_adm)

    def _admit_chunked(self, req, slot, plen, key, eff_topk):
        """Admit a long prompt in fixed-size chunks: slice the slot's cache
        region out once, run ONE compiled chunk program per chunk (the
        offset is traced data, so every chunk position / slot / prompt
        length reuses the same executable), scatter the filled region
        back. Falls back to the bucketed path if the padded prompt would
        overrun the cache extent."""
        chunk = self.chunked_prefill
        n_chunks = -(-plen // chunk)
        padded = n_chunks * chunk
        extent = jax.tree_util.tree_leaves(self.caches[0])[0].shape[2]
        if padded > extent:
            bucket = min(max(8, 1 << (plen - 1).bit_length()),
                         self.max_seq_len)
            prompt = jnp.asarray(np.pad(
                np.asarray(req.prompt, np.int32),
                (0, bucket - plen))[None, :])
            return self._prefill(
                self.model, prompt, jnp.int32(plen), self.caches,
                jnp.int32(slot), key, jnp.float32(req.temperature),
                jnp.float32(req.top_p), jnp.int32(eff_topk), plen=bucket)
        prompt = np.pad(np.asarray(req.prompt, np.int32),
                        (0, padded - plen))
        sliced = self._slice_slot(self.caches, jnp.int32(slot))
        logits = None
        for c in range(n_chunks):
            tok = jnp.asarray(prompt[None, c * chunk:(c + 1) * chunk])
            logits, sliced = self._chunk_fill(
                self.model, tok, jnp.int32(c * chunk), sliced)
        new_caches = self._scatter_slot(self.caches, sliced, jnp.int32(slot))
        idx = (plen - 1) - (n_chunks - 1) * chunk
        first_tok, first_lp = self._sample_at(
            logits, jnp.int32(idx), key, jnp.float32(req.temperature),
            jnp.float32(req.top_p), jnp.int32(eff_topk))
        return first_tok, first_lp, new_caches

    def _record_itl(self):
        """One decode dispatch completed with slots resident: record the
        gap since the previous one (admission stalls between them are the
        point of the measurement)."""
        import time
        now = time.perf_counter()
        if self._last_tick_t is not None:
            if len(self._itl) >= 4096:
                del self._itl[:2048]
            self._itl.append(now - self._last_tick_t)
        self._last_tick_t = now

    def _decode_tick(self):
        """One plain decode dispatch over the currently-active slots —
        used to OVERLAP admission prefill chunks with decode
        (``overlap_admission=True``): between a long admission's chunks,
        resident slots keep generating instead of stalling for the whole
        chunked prefill. The admitting slot must be PARKED (its position
        pointed at the null-page table column) before calling. Spec-mode
        drafting is skipped for these ticks (plain decode; draft-cache
        holes only lower later acceptance, never correctness). A decode
        fault here poisons the donated caches: recover at engine level
        and re-raise so the in-flight admission errors too."""
        active = self.book.active_mask()
        if not active.any():
            return
        self._grow_active_slots(active, self.positions, ahead=1)
        if self.overcommit:
            active = active & self.book.active_mask()
            if not active.any():
                return
        self._key, sub = jax.random.split(self._key)
        try:
            nxt, lps, self.caches = self._decode(
                self.model, self.cur_tokens, self.positions, self.caches,
                sub, self.temps, self.topps, self.topks)
        except Exception as e:  # noqa: BLE001 — donated caches died
            self._recover_from_decode_fault(e)
            raise RuntimeError(
                f"decode fault during overlapped admission: {e}") from e
        self.positions = self.positions + jnp.asarray(active, jnp.int32)
        self.cur_tokens = jnp.where(jnp.asarray(active)[:, None],
                                    nxt[:, None], self.cur_tokens)
        if self._lp_slots:
            lps_host = np.asarray(lps)
            for s, r in self._lp_slots.items():
                if active[s]:
                    r.token_logprobs.append(float(lps_host[s]))
        self.book.record_step(np.asarray(nxt))
        self.tokens_generated += int(active.sum())
        for s in np.flatnonzero(active & ~self.book.active_mask()):
            self._lp_slots.pop(int(s), None)
            self._release_slot_pages(int(s))
        self.finished.extend(self._drain_finished())
        self._record_itl()

    def _admit_paged_chunked(self, req, slot, plen, skip_pages, key,
                             eff_topk):
        """Admit a long prompt into the PAGED cache chunk by chunk: every
        chunk (page-granular, tail padded to the fixed chunk size) runs the
        same compiled suffix-chunk program — write the chunk's K/V into the
        slot's pages, context-attend everything <= its own positions — so
        ONE executable serves every paged prompt length, chunk position and
        slot. Composes with the prefix compute-skip: the loop starts after
        the ``skip_pages`` shared pages. Sampling params only matter on the
        final chunk (its call yields the first generated token at the true
        last-prompt-token logits); earlier chunks' sampled tokens are
        discarded."""
        ps = self._page_size
        chunk = self._paged_chunk
        start = skip_pages * ps
        total = plen - start
        n_chunks = -(-total // chunk)
        padded = np.pad(np.asarray(req.prompt[start:], np.int32),
                        (0, n_chunks * chunk - total))
        first_tok = first_lp = None
        overlap = self.overlap_admission and n_chunks > 1
        if overlap:
            # park the admitting slot: until admission completes, its
            # stale position/token would make interleaved decode ticks
            # write junk K/V INTO the prompt pages being filled; pointed
            # at the never-allocated parking column they hit page 0.
            # Also SUSPEND it in the bookkeeper so the ticks' record_step
            # neither appends junk tokens nor advances its position.
            self.positions = self.positions.at[slot].set(
                jnp.int32(self._park_pos))
            self.book.suspend_slot(slot)
        try:
            first_tok, first_lp = self._run_admission_chunks(
                req, slot, skip_pages, key, eff_topk, padded, n_chunks,
                total, chunk, ps, overlap)
        finally:
            if overlap:
                self.book.resume_slot(slot)
        return first_tok, first_lp, self.caches

    def _run_admission_chunks(self, req, slot, skip_pages, key, eff_topk,
                              padded, n_chunks, total, chunk, ps, overlap):
        first_tok = first_lp = None
        for c in range(n_chunks):
            toks = jnp.asarray(padded[None, c * chunk:(c + 1) * chunk])
            off_pages = skip_pages + (c * chunk) // ps
            last = c == n_chunks - 1
            last_idx = (total - 1 - c * chunk) if last else chunk - 1
            first_tok, first_lp, self.caches = self._prefill_paged_suffix(
                self.model, toks, jnp.int32(last_idx), self.caches,
                jnp.int32(slot), jnp.int32(off_pages), key,
                jnp.float32(req.temperature), jnp.float32(req.top_p),
                jnp.int32(eff_topk), plen=chunk)
            if overlap and not last:
                # resident slots advance one token per admission chunk
                # instead of stalling for the whole chunked prefill
                self._decode_tick()
        return first_tok, first_lp

    def cancel(self, req_id: int) -> bool:
        """Cancel a request by id: a waiting request is dropped; an active
        one frees its slot immediately (its partial transcript is kept).
        Returns False when the id is unknown or already finished."""
        res = self.book.cancel(req_id)
        if res is None:
            return False
        kind, info = res
        if kind == "waiting":
            req = info
            req.done = True
            req.cancelled = True
            self.finished.append(self._finalize(req))
        else:
            self._lp_slots.pop(info, None)
            if self.paged:
                self._release_slot_pages(info)
            for r in self.book.drain_finished():
                r.done = True
                if r.id == req_id:
                    r.cancelled = True
                self.finished.append(self._finalize(r))
        return True

    # ----------------------------------------------------------------- run
    @property
    def steps(self) -> int:
        return self.book.steps

    @property
    def stats(self) -> Dict[str, float]:
        """Engine-level throughput counters (BASELINE north star metric)."""
        import time
        wall = (time.perf_counter() - self._t_start) if self._t_start else 0.0
        st = {"tokens_generated": self.tokens_generated,
              "steps": int(self.steps), "wall_s": round(wall, 3),
              "tokens_per_s": round(self.tokens_generated / wall, 2)
              if wall else 0.0}
        self._stats_common(st)
        if self.paged:
            st["prefix_hits"] = self.alloc.prefix_hits
            st["prefix_cached_pages"] = len(self.alloc.cached)
            st["prefill_tokens_skipped"] = self.prefill_tokens_skipped
            # reservation waste observability: pages held by slots vs
            # pages their current positions actually occupy (worst-case
            # reservation strands the difference; overcommit reclaims it)
            ps = self._page_size
            pos_host = np.asarray(self.positions)
            act = self.book.active_mask()
            st["pages_reserved"] = sum(len(p)
                                       for p in self.alloc.slot_pages)
            st["pages_used"] = int(sum(
                -(-(int(pos_host[s]) + 1) // ps)
                for s in np.flatnonzero(act)))
            st["preemptions"] = self.preemptions
        if self._itl:
            it = np.asarray(self._itl)
            st["itl_p50_ms"] = round(float(np.percentile(it, 50)) * 1e3, 2)
            st["itl_p95_ms"] = round(float(np.percentile(it, 95)) * 1e3, 2)
        if self.draft is not None and self.spec_drafted:
            st["spec_rounds"] = self.spec_rounds
            st["spec_acceptance"] = round(
                self.spec_accepted / self.spec_drafted, 4)
        return st

    def step(self):
        """Admit waiting requests, run one decode step for all slots."""
        import time
        if self._t_start is None:
            self._t_start = time.perf_counter()
        self._admit()
        active = self.book.active_mask()
        if not active.any():
            return False
        if self.draft is not None and self.book.num_waiting == 0:
            return self._spec_step(active)
        # multi-step block only when nothing waits for a slot (admissions
        # are never delayed by an in-flight block)
        n = (self.multi_step
             if self.multi_step > 1 and self.book.num_waiting == 0 else 1)
        if self.paged:
            # pool exhaustion here raises (overcommit=False — size the
            # pool for the expected resident tokens, or lower max_slots;
            # the admission path already applies queue backpressure) or
            # preempts the youngest slot (overcommit=True)
            self._grow_active_slots(active, self.positions, ahead=n)
            if self.overcommit:
                # growth may have preempted slots out of the batch
                active = active & self.book.active_mask()
                if not active.any():
                    return True
        self._key, sub = jax.random.split(self._key)
        try:
            if n > 1:
                toks, lps, self.caches = self._decode_multi(
                    self.model, self.cur_tokens, self.positions,
                    self.caches, sub, self.temps, self.topps, self.topks,
                    n=n)
            else:
                nxt, lps, self.caches = self._decode(
                    self.model, self.cur_tokens, self.positions,
                    self.caches, sub, self.temps, self.topps, self.topks)
        except Exception as e:  # noqa: BLE001 — the caches were DONATED into
            # the step, so after a fault (transient backend error, OOM) they
            # may point at deleted buffers: request-level isolation is
            # impossible here (unlike prefill). Recover at ENGINE level —
            # fail every in-flight request with the error and rebuild fresh
            # caches so subsequent submissions still serve.
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
                            r.token_logprobs.append(float(lps_host[i, slot]))
                self.book.record_step(toks_host[i])
                self.tokens_generated += int(active_i.sum())
            freed = active & ~self.book.active_mask()
            for slot in np.flatnonzero(freed):
                self._lp_slots.pop(int(slot), None)
                if self.paged:
                    self._release_slot_pages(int(slot))
            self.finished.extend(self._drain_finished())
            self._record_itl()
            return True
        self.positions = self.positions + jnp.asarray(active, jnp.int32)
        self.cur_tokens = nxt[:, None]
        if self._lp_slots:
            lps_host = np.asarray(lps)
            for slot, r in self._lp_slots.items():
                if active[slot]:
                    r.token_logprobs.append(float(lps_host[slot]))
        self.book.record_step(np.asarray(nxt))
        self.tokens_generated += int(active.sum())
        freed = active & ~self.book.active_mask()
        for slot in np.flatnonzero(freed):
            self._lp_slots.pop(int(slot), None)
            if self.paged:
                self._release_slot_pages(int(slot))
        self.finished.extend(self._drain_finished())
        self._record_itl()
        return True

    def _spec_step(self, active):
        """One engine speculative dispatch (queue empty): draft gamma per
        slot, verify batched, advance each slot by its own accepted
        block. With ``multi_step`` > 1, ``multi_step`` ROUNDS run as one
        device dispatch (``_spec_multi_impl``) and the host replays them
        in order — RTT amortization stacked on top of speculation's
        (accepted+1) tokens per target pass."""
        n = self.multi_step if self.multi_step > 1 else 1
        if self.paged:
            # ensure pages for the whole dispatch's candidate blocks
            # (admission already reserved the worst case incl. spec_extra,
            # so this only maps reserved logical pages in; grow clamps at
            # the reservation — junk writes past it drop to the null page)
            self._grow_active_slots(active, self.positions,
                                    ahead=n * self.spec_extra)
            if self.overcommit:
                active = active & self.book.active_mask()
                if not active.any():
                    return True
        self._key, sub = jax.random.split(self._key)
        try:
            if n > 1:
                (cands, produceds, lpss, cur_new, pos_new, self.caches,
                 self.draft_caches) = self._spec_multi(
                    self.model, self.draft, self.cur_tokens, self.positions,
                    self.caches, self.draft_caches, sub, self.temps,
                    self.topps, self.topks, gamma=self.spec_gamma, n=n)
            else:
                (cand, produced, cur_new, lps, self.caches,
                 self.draft_caches) = self._spec_round(
                    self.model, self.draft, self.cur_tokens, self.positions,
                    self.caches, self.draft_caches, sub, self.temps,
                    self.topps, self.topks, gamma=self.spec_gamma)
                cands, produceds = cand[None], produced[None]
                lpss = lps[None]
                pos_new = self.positions + produced
        except Exception as e:  # noqa: BLE001 — both cache sets were
            # donated; engine-level recovery (same as decode)
            self._recover_from_decode_fault(e)
            return True
        act = jnp.asarray(active)
        self.positions = jnp.where(act, pos_new, self.positions)
        self.cur_tokens = jnp.where(act[:, None], cur_new.reshape(-1, 1),
                                    self.cur_tokens)
        cands_host = np.asarray(cands)                  # [n, B, gamma+1]
        produceds_host = np.asarray(produceds)          # [n, B]
        lps_host = np.asarray(lpss) if self._lp_slots else None
        # replay rounds in order; the bookkeeper truncates each slot at
        # EOS/max_new and ignores post-finish junk rounds, returning the
        # per-slot counts actually appended (both backends). Acceptance
        # stats accumulate POST-truncation, per replayed round, only for
        # slots still active host-side when that round replays — so rounds
        # a slot host-finished before (EOS/stop/max_new mid-dispatch)
        # never skew the reported acceptance rate (r4 advisor finding)
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
            # draft tokens the transcript actually used this round: the
            # appended count minus the non-draft extra token (only when
            # the block ran to its extra, i.e. appended == produced)
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
        self.finished.extend(self._drain_finished())
        self._record_itl()
        return True

    def _recover_from_decode_fault(self, e: Exception):
        """A failed (donated-cache) decode step poisons every in-flight
        sequence: mark them all errored, release their slots/pages, and
        re-allocate the caches so the engine keeps serving new requests."""
        msg = f"decode step failed: {type(e).__name__}: {e}"
        self._lp_slots.clear()
        for slot in np.flatnonzero(self.book.active_mask()):
            self._cancel_slot(int(slot), msg)
        self.finished.extend(self._drain_finished())
        if self.paged:
            # per-slot page release above emptied the allocator; rebuild the
            # pool arrays (the old ones were donated into the failed step)
            # and drop the prefix cache — its content died with them
            self.alloc.reset_prefix_cache()
            from qgemm_tpu.serving.paged_cache import init_paged_cache
            tmpl = self.caches[0]
            dh_ = tmpl.kq.shape[3] * (2 if tmpl.kv_bits == 4 else 1)
            self.caches = [init_paged_cache(
                tmpl.kq.shape[1], dh_, tmpl.n_pages,
                self.max_slots, tmpl.page_table.shape[1],
                page_size=tmpl.page_size, kv_bits=tmpl.kv_bits)
                for _ in self.model.blocks]
        else:
            self.caches = self.model.init_cache(
                self.max_slots, self.max_seq_len + self.spec_extra,
                quantized=self.quantized_cache)
        if self.draft is not None:
            # the draft caches were donated into the failed round too
            self.draft_caches = self.draft.init_cache(
                self.max_slots, self.max_seq_len + self.spec_extra)
        if self.mesh is not None:
            if self.paged:
                from qgemm_tpu.parallel.sharding import shard_paged_caches
                self.caches = shard_paged_caches(self.caches, self.mesh)
            else:
                from qgemm_tpu.parallel.sharding import shard_kv_caches
                self.caches = shard_kv_caches(self.caches, self.mesh)
        self.positions = jnp.zeros((self.max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((self.max_slots, 1), jnp.int32)

    def _slot_request(self, slot: int) -> Optional[Request]:
        """The Request object occupying ``slot`` (both backends)."""
        if hasattr(self.book, "slot_req"):            # python bookkeeper
            return self.book.slot_req.get(slot)
        rid = self.book._sched.request_in_slot(slot)  # native scheduler
        return None if rid is None else self.book._by_id.get(rid)

    def _finalize(self, r: Request) -> Request:
        """Merge a finished (possibly continuation) request back into the
        ORIGINAL user-submitted Request: preempted requests finish as
        continuations whose transcript covers only post-preemption tokens;
        the pre-preemption prefix lives in ``self._preempted``."""
        info = self._preempted.pop(r.id, None)
        if info is None:
            return r
        orig = info["req"]
        orig.generated = info["gen"] + list(r.generated)
        orig.token_logprobs = info["lps"] + list(r.token_logprobs)
        orig.done, orig.error = r.done, r.error
        orig.cancelled = r.cancelled
        return orig

    def _drain_finished(self):
        return [self._finalize(r) for r in self.book.drain_finished()]

    def _preempt_for_pages(self, needy_slot: int) -> bool:
        """Over-commit pool pressure: preempt the YOUNGEST-admitted active
        slot (other than ``needy_slot`` if possible — least work lost,
        FIFO fairness preserved since its continuation requeues at the
        front), free its pages, and resubmit its continuation (original
        prompt + tokens so far, max_new reduced). Returns False when
        nothing is active to preempt."""
        act = [int(s) for s in np.flatnonzero(self.book.active_mask())]
        cands = [s for s in act if s != needy_slot] or \
            ([needy_slot] if needy_slot in act else [])
        if not cands:
            return False
        victim = max(cands, key=lambda s: self._admit_seq.get(s, -1))
        req = self._slot_request(victim)
        if req is None:
            return False
        res = self.book.preempt(req.id)
        if res is None:
            return False
        _, gen = res
        prev = self._preempted.get(req.id)
        orig = prev["req"] if prev else req
        pre_gen = (prev["gen"] if prev else []) + [int(t) for t in gen]
        pre_lps = list(prev["lps"] if prev else []) \
            + list(req.token_logprobs)
        cont = Request(prompt=list(req.prompt) + [int(t) for t in gen],
                       max_new_tokens=req.max_new_tokens - len(gen),
                       eos_token=req.eos_token,
                       temperature=req.temperature, top_p=req.top_p,
                       top_k=req.top_k, stop_tokens=req.stop_tokens,
                       logprobs=req.logprobs)
        cont.id = req.id
        self._preempted[req.id] = {"req": orig, "gen": pre_gen,
                                   "lps": pre_lps}
        self._lp_slots.pop(victim, None)
        self._release_slot_pages(victim)
        self.book.submit(cont, front=True)
        self.preemptions += 1
        return True

    def _cancel_slot(self, slot: int, error_msg: str):
        """Cancel whatever request occupies ``slot`` (if any), tagging it
        with ``error_msg``."""
        req = self._slot_request(slot)
        if req is None:
            return
        req.error = error_msg
        self.book.cancel(req.id)
        if self.paged:
            self._release_slot_pages(slot)

    def run_to_completion(self, max_steps: int = 100000):
        while ((self.book.num_waiting or self.book.num_active)
               and self.steps < max_steps):
            self.step()
        self.finished.extend(self._drain_finished())
        return self.finished
