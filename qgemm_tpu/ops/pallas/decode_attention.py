"""Fused decode-step attention over the (optionally int8) KV cache.

Decode attention (Sq=1) is pure HBM bandwidth: the entire cost is streaming
the cache once per step. The XLA path is at the mercy of fusion heuristics —
whether the int8->bf16 convert fuses into the dot (and the cache is read as
int8) turns out to depend on the sequence length, and when it doesn't fuse
XLA materializes the converted cache, *doubling* traffic. This kernel makes
the contract explicit: K/V blocks are DMA'd as int8, converted and scaled in
VMEM, and reduced with an online softmax — one int8 read of the cache per
step, always.

Layout: grid (H, S/BS); each step loads K/V blocks [B, BS, D] for one head,
computes all B batch rows at once (batched over the sublane axis), updates
per-(b) online-softmax state in VMEM scratch, and writes the [B, D] head
output on the last block. Per-slot lengths (continuous batching) mask
positions >= length_b.

No reference counterpart (the reference has no KV cache at all,
SURVEY.md §2 C12); the float-cache variant of the same kernel serves the
bf16 cache path.
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(q_ref, k_ref, kc_ref, v_ref, vc_ref, len_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, bs: int, n_s: int, scale: float,
                   quantized: bool, groups: int = 1):
    """``groups`` > 1 is GQA: the q block holds B*groups rows (batch-major,
    then group) against a B-batch KV block — row r uses K/V of batch
    r // groups; scales/lengths repeat per group inside VMEM (tiny)."""
    ss = pl.program_id(1)

    @pl.when(ss == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bq = q_ref.shape[1]                                 # B * groups rows
    b = bq // groups
    cd = jnp.bfloat16 if quantized else k_ref.dtype
    q = q_ref[0].astype(cd)                             # [B*G, D]
    # A/B'd on v5e (B=8, S=2048): per-batch unrolled MXU dots run ~10%
    # faster than one batched dot_general (93-98 vs 104-111 us), so small
    # B — the hot serving case — unrolls; large B switches to the batched
    # form to keep program size and compile time bounded. (A lane-axis VPU
    # reduction measured 4x slower than either.) GQA always unrolls (each
    # row's KV batch is r // groups — a static index).
    batched = bq > 16 and groups == 1
    if batched:
        kb = k_ref[:, 0].astype(cd)                     # [B, BS, D]
        s = jax.lax.dot_general(
            q[:, None, :], kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0] * scale  # [B, BS]
    else:
        srows = []
        for bi in range(b):
            kb = k_ref[bi, 0].astype(cd)                # [BS, D]
            srows.append(jax.lax.dot_general(
                q[bi * groups:(bi + 1) * groups], kb,   # [G, D] rows share
                (((1,), (1,)), ((), ())),               # this batch's KV
                preferred_element_type=jnp.float32))    # [G, BS]
        s = jnp.concatenate(srows, axis=0) * scale      # [B*G, BS]

    def rep(x):                                         # [B, X] -> [B*G, X]
        return x if groups == 1 else jnp.repeat(x, groups, axis=0)

    if quantized:
        s = s * (rep(kc_ref[0]) * (1.0 / QRANGE))       # per-position absmax

    pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ss * bs
    valid = pos < rep(len_ref[:])                       # [B*G, BS] vs [B*G, 1]
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scr[:]                                   # [B*G, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    p = jnp.where(valid, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new

    if quantized:
        p = p * (rep(vc_ref[0]) * (1.0 / QRANGE))
    if batched:
        vb = v_ref[:, 0].astype(cd)                     # [B, BS, D]
        o = jax.lax.dot_general(
            p[:, None, :].astype(cd), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0]   # [B, D]
    else:
        orows = []
        for bi in range(b):
            vb = v_ref[bi, 0].astype(cd)                # [BS, D]
            orows.append(jax.lax.dot_general(
                p[bi * groups:(bi + 1) * groups].astype(cd), vb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))    # [G, D]
        o = jnp.concatenate(orows, axis=0)              # [B*G, D]
    acc_scr[:] = acc_scr[:] * alpha + o

    @pl.when(ss == n_s - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] /
                    jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s",))
def decode_attention(q, k_cache, v_cache, lengths, kc=None, vc=None,
                     block_s: int = 512):
    """q [B, Hq, 1, D]; k_cache/v_cache [B, Hkv, S, D] (int8 when kc/vc
    given, else any float dtype) with Hq a multiple of Hkv (GQA: query
    heads i*g..(i+1)*g-1 share KV head i); kc/vc [B, Hkv, S, 1]
    per-position absmax scales; lengths [B] int32 — position j of slot b
    attends iff j < lengths[b].

    Returns [B, Hq, 1, D] in q's dtype.
    """
    from qgemm_tpu.ops.validation import check, check_rank
    for name, a in (("q", q), ("k_cache", k_cache), ("v_cache", v_cache)):
        check_rank(name, a, 4)
    check(q.shape[2] == 1, f"q: decode step expects Sq == 1, got {q.shape}")
    check(k_cache.shape == v_cache.shape,
          f"k_cache {k_cache.shape} != v_cache {v_cache.shape}")
    check(q.shape[0] == k_cache.shape[0]
          and q.shape[1] % k_cache.shape[1] == 0
          and q.shape[3] == k_cache.shape[3],
          f"q {q.shape} incompatible with cache {k_cache.shape}")
    check(lengths.shape == (q.shape[0],),
          f"lengths: expected shape ({q.shape[0]},), got {lengths.shape}")
    check((kc is None) == (vc is None), "pass both kc and vc or neither")
    b, hq, _, d = q.shape
    h = k_cache.shape[1]
    groups = hq // h
    s = k_cache.shape[2]
    quantized = kc is not None
    bs = min(block_s, _round_up(s, 128))
    sp = _round_up(s, bs)
    if sp != s:
        pad4 = ((0, 0), (0, 0), (0, sp - s), (0, 0))
        k_cache = jnp.pad(k_cache, pad4)
        v_cache = jnp.pad(v_cache, pad4)
        if quantized:
            kc = jnp.pad(kc, pad4[:3] + ((0, 0),))
            vc = jnp.pad(vc, pad4[:3] + ((0, 0),))
    n_s = sp // bs
    scale = 1.0 / (d ** 0.5)

    # sublane-axis rule: block last-two dims must be multiples of (8, 128)
    # or the full array dims — put B on the sublane axis for q/out/scales
    if quantized:
        kc3 = kc[..., 0].transpose(1, 0, 2)             # [H, B, S]
        vc3 = vc[..., 0].transpose(1, 0, 2)
    else:  # dummies with a valid (tiny) shape; the kernel never reads them
        kc3 = jnp.zeros((h, b, sp), jnp.float32)
        vc3 = jnp.zeros((h, b, sp), jnp.float32)
    len2 = lengths.reshape(b, 1).astype(jnp.int32)

    bq = b * groups
    # [B, Hq, D] -> [Hkv, B*G, D], rows batch-major then group (row
    # r = b*G + j -> KV batch r // G, matching the kernel's static map)
    q3 = q[:, :, 0].reshape(b, h, groups, d).transpose(1, 0, 2, 3) \
        .reshape(h, bq, d)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, n_s=n_s, scale=scale,
                          quantized=quantized, groups=groups),
        grid=(h, n_s),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda hh, ss: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, bs, d), lambda hh, ss: (0, hh, ss, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, bs), lambda hh, ss: (hh, 0, ss),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, bs, d), lambda hh, ss: (0, hh, ss, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, bs), lambda hh, ss: (hh, 0, ss),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda hh, ss: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda hh, ss: (hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, bq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "arbitrary")),
        interpret=_interpret(),
    )(q3, k_cache, kc3, v_cache, vc3, len2)
    return out.reshape(h, b, groups, d).transpose(1, 0, 2, 3) \
        .reshape(b, hq, d)[:, :, None, :]


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)
