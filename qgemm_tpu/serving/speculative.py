"""Speculative decoding: a cheap DRAFT model proposes gamma tokens, the
TARGET verifies them in one multi-token forward, and the longest agreeing
prefix is accepted — exact greedy-target transcripts with (accepted+1)
tokens per target pass instead of 1.

TPU-native design points:

  * everything is ONE jitted lax.while_loop with static shapes: the
    output buffer is padded by gamma+1 so a round can always write its
    full candidate block; per-round acceptance is data (cumprod of the
    match mask), not shape;
  * both models share the framework's position-masked static KV caches,
    which make speculation natural: the draft's and target's caches are
    simply written at the positions each token WOULD occupy, and rejected
    positions hold garbage that is never attended (decode masks strictly
    by position) and is overwritten by the next round;
  * the draft runs gamma+1 decode steps (the extra step only writes the
    last proposal's K/V so a fully-accepted round leaves no cache hole);
    the target verifies with one ``prefill_chunk`` at the round's offset
    (the same traced-offset program chunked prefill uses).

The natural DRAFT here is quantization self-speculation: a W4A8 copy of
the target (``target.quantize(bits=4)``) steps ~1.8x faster and agrees
with the int8/bf16 target on most greedy tokens, so no second model needs
training — see scripts/bench_speculative.py for measured acceptance and
tokens/s. No reference counterpart (the reference generates nothing).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpecResult(NamedTuple):
    tokens: jax.Array   # [max_new_tokens] int32 — the greedy transcript
    rounds: jax.Array   # scalar int32 — target forwards taken
    drafted: jax.Array  # scalar int32 — draft tokens proposed
    accepted: jax.Array  # scalar int32 — draft tokens accepted


@functools.partial(jax.jit, static_argnames=("max_new_tokens", "gamma",
                                             "quantized_cache", "eos_token"))
def speculative_generate(target, draft, prompt, max_new_tokens: int,
                         gamma: int = 4, quantized_cache: bool = False,
                         eos_token=None) -> SpecResult:
    """Greedy speculative decoding, batch 1. prompt [1, S_p] int32.

    Produces the target's greedy transcript (acceptance compares the
    draft's greedy choices against the target's own; any disagreement
    truncates to the target's token), in ``rounds`` target forwards
    instead of max_new_tokens. Exactness caveat: the verifier scores
    gamma+1 positions in one chunk forward while sequential decode scores
    one at a time — in f32 the transcripts match exactly (tested); in
    bf16 the two program shapes can round near-tied logits differently
    and flip an occasional argmax, the same divergence any two decode
    implementations of the same bf16 model exhibit."""
    b, s_p = prompt.shape
    assert b == 1, "speculative decoding is per-sequence (batch 1)"
    ext = s_p + max_new_tokens + gamma + 2
    for name, m in (("target", target), ("draft", draft)):
        limit = getattr(getattr(m, "cfg", None), "max_seq_len", None)
        assert limit is None or ext <= limit, (
            f"{name}: prompt + max_new_tokens + gamma + 2 = {ext} exceeds "
            f"max_seq_len {limit} (the verify chunk may run past the "
            "position table)")

    tc = target.init_cache(1, ext, quantized=quantized_cache)
    dc = draft.init_cache(1, ext, quantized=quantized_cache)
    tl, tc = target.prefill(prompt, tc)
    _, dc = draft.prefill(prompt, dc)
    tok0 = jnp.argmax(tl[0, s_p - 1]).astype(jnp.int32)

    buf = jnp.zeros((max_new_tokens + gamma + 1,), jnp.int32)
    buf = buf.at[0].set(tok0)

    def cond(st):
        buf, count, cur, pos, tc, dc, rounds, acc_total = st
        stop = count >= max_new_tokens
        if eos_token is not None:
            stop = jnp.logical_or(stop, cur == eos_token)
        return jnp.logical_not(stop)

    def body(st):
        buf, count, cur, pos, tc, dc, rounds, acc_total = st

        # draft: gamma proposals + one extra step that only writes the
        # last proposal's K/V (closes the full-acceptance cache hole)
        def dstep(carry, j):
            tok, dc = carry
            logits, dc = draft.decode_step(tok[None, None], pos + j, dc)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            return (nxt, dc), nxt

        (_, dc), props = jax.lax.scan(dstep, (cur, dc),
                                      jnp.arange(gamma + 1))
        d = props[:gamma]                                   # d_1..d_gamma

        # target verifies [cur, d_1..d_gamma] in one chunk forward at pos
        seq = jnp.concatenate([cur[None], d])[None, :]      # [1, gamma+1]
        tlogits, tc = target.prefill_chunk(seq, pos, tc)
        g = jnp.argmax(tlogits[0], axis=-1).astype(jnp.int32)  # [gamma+1]

        match = (d == g[:gamma]).astype(jnp.int32)
        acc = jnp.cumprod(match)
        n_acc = jnp.sum(acc)                                # 0..gamma
        # candidate block: accepted draft tokens then the target's token
        # at the first disagreement (or its gamma+1'th token if all agree)
        idx = jnp.arange(gamma + 1)
        cand = jnp.where(idx < n_acc, jnp.concatenate([d, d[-1:]]),
                         g[jnp.minimum(n_acc, gamma)])
        produced = n_acc + 1
        if eos_token is not None:
            # truncate the accepted block at the first EOS: cur becomes the
            # EOS itself, which stops the loop (cond)
            is_eos = jnp.logical_and(cand == eos_token, idx < produced)
            produced = jnp.where(jnp.any(is_eos),
                                 jnp.argmax(is_eos) + 1, produced)
        buf = jax.lax.dynamic_update_slice(buf, cand, (count,))
        cur_new = cand[produced - 1]
        return (buf, count + produced, cur_new, pos + produced, tc, dc,
                rounds + 1, acc_total + n_acc)

    st = (buf, jnp.int32(1), tok0, jnp.int32(s_p), tc, dc, jnp.int32(1),
          jnp.int32(0))
    buf, count, cur, pos, tc, dc, rounds, acc_total = \
        jax.lax.while_loop(cond, body, st)
    if eos_token is not None:
        # pin everything from the first EOS on (padded-decode contract,
        # same as Transformer.generate)
        buf = jnp.where(jnp.arange(buf.shape[0]) < count, buf, eos_token)
    return SpecResult(tokens=buf[:max_new_tokens], rounds=rounds,
                      drafted=(rounds - 1) * gamma, accepted=acc_total)


@functools.partial(jax.jit, static_argnames=("max_new_tokens", "gamma",
                                             "quantized_cache", "eos_token",
                                             "top_k", "top_p"))
def speculative_sample(target, draft, prompt, key, max_new_tokens: int,
                       gamma: int = 4, temperature=1.0, top_k=0, top_p=1.0,
                       quantized_cache: bool = False,
                       eos_token=None) -> SpecResult:
    """STOCHASTIC speculative decoding (Leviathan-style rejection
    sampling), batch 1 — composes speculation with the engine's
    temperature / top-k / top-p sampling semantics (ops/sampling.py).
    The output is distributed EXACTLY as sequential warped-target
    sampling:

      * the draft proposes x_i ~ q_i = its UNFILTERED temperature
        distribution (r5: exactness holds for ANY draft distribution,
        and sampling from the exact nucleus costs a full-vocab argsort
        per step — ~0.7 ms at V=50k; out-of-nucleus proposals simply
        reject, costing ~(1-top_p) acceptance instead);
      * the target scores all gamma+1 positions in one chunk forward;
        p_i is the slot's EXACT warped (top-k/temperature/top-p)
        distribution — the filters live here;
      * x_i is accepted with prob min(1, p_i(x_i)/q_i(x_i)); the first
        rejection resamples from the leftover norm(max(0, p_i - q_i));
        full acceptance samples a bonus token from p_gamma.

    temperature <= 1e-6 degenerates to exact greedy speculation (the
    warped distributions become one-hots, so acceptance == agreement and
    the leftover is the target's argmax) — same transcript as
    ``speculative_generate``."""
    from qgemm_tpu.ops.sampling import warped_probs
    b, s_p = prompt.shape
    assert b == 1, "speculative decoding is per-sequence (batch 1)"
    ext = s_p + max_new_tokens + gamma + 2
    for name, m in (("target", target), ("draft", draft)):
        limit = getattr(getattr(m, "cfg", None), "max_seq_len", None)
        assert limit is None or ext <= limit, (
            f"{name}: prompt + max_new_tokens + gamma + 2 = {ext} exceeds "
            f"max_seq_len {limit}")
    warp = lambda lg: warped_probs(lg, temperature, top_k, top_p)

    tc = target.init_cache(1, ext, quantized=quantized_cache)
    dc = draft.init_cache(1, ext, quantized=quantized_cache)
    tl, tc = target.prefill(prompt, tc)
    _, dc = draft.prefill(prompt, dc)
    v = tl.shape[-1]
    key, k0 = jax.random.split(key)
    p0 = warp(tl[:, s_p - 1, :])[0]
    tok0 = jax.random.categorical(k0, jnp.log(p0)).astype(jnp.int32)

    buf = jnp.zeros((max_new_tokens + gamma + 1,), jnp.int32)
    buf = buf.at[0].set(tok0)

    def cond(st):
        buf, count, cur, pos, tc, dc, key, rounds, acc_total = st
        stop = count >= max_new_tokens
        if eos_token is not None:
            stop = jnp.logical_or(stop, cur == eos_token)
        return jnp.logical_not(stop)

    def body(st):
        buf, count, cur, pos, tc, dc, key, rounds, acc_total = st
        # kd seeds the draft scan's own stream — it must be distinct from
        # the carried-forward key or next round's splits would collide
        # with this round's draft samples
        key, kd, kacc, kextra = jax.random.split(key, 4)

        # draft: gamma sampled proposals (+1 step closing the cache hole),
        # drawn in SORTED space so each step yields the proposal AND its
        # own warped probability q(x) without a full-V scatter (r5 —
        # engine.spec_accept cost shape; raw logits are kept for the one
        # rejection-position leftover)
        from qgemm_tpu.ops.sampling import (sample_logits_with_prob,
                                            warped_probs,
                                            warped_token_probs)

        def dstep(carry, j):
            tok, dc, k = carry
            k, ks = jax.random.split(k)
            logits, dc = draft.decode_step(tok[None, None], pos + j, dc)
            # unfiltered-temperature proposals: sort-free (the verifier
            # owns the top-k/top-p filters; out-of-nucleus proposals
            # reject, costing ~1-top_p acceptance, not a 50k-sort/step)
            nxt, qx = sample_logits_with_prob(logits, ks, temperature)
            return (nxt[0], dc, k), (nxt[0], qx[0], logits[0])

        (_, dc, _), (props, qxs, dlogits) = jax.lax.scan(
            dstep, (cur, dc, kd), jnp.arange(gamma + 1))
        d = props[:gamma]                                   # [gamma]
        qx = qxs[:gamma]                                    # [gamma]
        dlog = dlogits[:gamma]                              # [gamma, V]

        # target scores [cur, d_1..d_gamma] in one chunk forward at pos
        seq = jnp.concatenate([cur[None], d])[None, :]
        tlogits, tc = target.prefill_chunk(seq, pos, tc)
        # p_i(x_i) as sorted-space scalars (positions act as the batch)
        px = warped_token_probs(tlogits[0, :gamma], d, temperature,
                                top_k, top_p)

        # accept x_i with prob min(1, p_i(x_i)/q_i(x_i)): u*q(x) < p(x)
        u = jax.random.uniform(kacc, (gamma,))
        accept = (u * qx < px).astype(jnp.int32)
        acc = jnp.cumprod(accept)
        n_acc = jnp.sum(acc)                                # 0..gamma

        # the extra token: leftover distribution at the first rejection,
        # or the target's own distribution after full acceptance (q at
        # the bonus position is defined 0, making the leftover = p there)
        # — the only full warped distributions materialized per round
        p_at = warp(tlogits[0, n_acc][None])[0]             # [V]
        q_at = warped_probs(dlog[jnp.minimum(n_acc, gamma - 1)][None],
                            temperature)[0]         # draft is temp-only
        q_at = jnp.where(n_acc < gamma, q_at, jnp.zeros((v,)))
        resid = jnp.maximum(p_at - q_at, 0.0)
        dist = jnp.where(jnp.sum(resid) > 1e-9, resid, p_at)
        extra = jax.random.categorical(kextra,
                                       jnp.log(dist)).astype(jnp.int32)

        idx = jnp.arange(gamma + 1)
        cand = jnp.where(idx < n_acc, jnp.concatenate([d, d[-1:]]), extra)
        produced = n_acc + 1
        if eos_token is not None:
            is_eos = jnp.logical_and(cand == eos_token, idx < produced)
            produced = jnp.where(jnp.any(is_eos),
                                 jnp.argmax(is_eos) + 1, produced)
        buf = jax.lax.dynamic_update_slice(buf, cand, (count,))
        cur_new = cand[produced - 1]
        return (buf, count + produced, cur_new, pos + produced, tc, dc,
                key, rounds + 1, acc_total + n_acc)

    st = (buf, jnp.int32(1), tok0, jnp.int32(s_p), tc, dc, key,
          jnp.int32(1), jnp.int32(0))
    buf, count, cur, pos, tc, dc, key, rounds, acc_total = \
        jax.lax.while_loop(cond, body, st)
    if eos_token is not None:
        buf = jnp.where(jnp.arange(buf.shape[0]) < count, buf, eos_token)
    return SpecResult(tokens=buf[:max_new_tokens], rounds=rounds,
                      drafted=(rounds - 1) * gamma, accepted=acc_total)
