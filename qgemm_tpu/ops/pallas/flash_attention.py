"""Blockwise (flash-style) attention Pallas kernel.

The reference materializes the full S x S score matrix in HBM and runs a
one-thread-per-row softmax (src/modules/attention.cuh:58-68 +
op_softmax.cuh) — O(S^2) HBM and the exact long-context wall SURVEY.md §5
flags. This kernel computes softmax(QK^T/sqrt(d)) V with the online
max/sum recurrence: K/V are streamed through VMEM in blocks, scores never
touch HBM, memory is O(S * d). The backward is blockwise too
(FlashAttention-2): the forward saves O + per-row logsumexp, and two
kernels recompute P per block to produce dQ and dK/dV — measured 4.8x
faster than the naive jnp backward at S=4k bf16 on v5e, with ZERO temp HBM
vs 269 MB (jit memory_analysis).

Grid: (batch*heads, Sq/BQ, Sk/BK), K innermost so the accumulator scratch
carries across K steps. Causal masking skips fully-masked K blocks'
contribution via predication (the mask is applied in-block; Pallas still
visits the block — acceptable at these sizes; a future optimization is a
lower-triangular grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, causal: bool, n_k: int, bq: int, bk: int,
                  sq_valid: int, sk_valid: int):
    kk = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _block(apply_mask: bool):
        # dot in the INPUT dtype (bf16 runs the MXU at full rate; an f32
        # upcast here would quarter it), accumulate f32.
        q = q_ref[0]                                 # [BQ, D]
        k = k_ref[0]                                 # [BK, D]
        v = v_ref[0]                                 # [BK, Dv]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        if apply_mask:
            qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * bq
            kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * bk
            mask = kj < sk_valid
            if causal:
                mask = jnp.logical_and(mask, kj <= qi)
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:]                            # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows (all -inf): keep exp argument finite
        p = jnp.exp(s - m_new)
        if apply_mask:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)

        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_new
        # P in the V dtype for the second matmul (f32 P would quarter the
        # MXU rate); P in [0,1] and f32->bf16 rounding is ~1e-3 relative —
        # the same tradeoff every production flash kernel makes.
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # the VPU is the flash bottleneck at d=128 (exp + mask ops rival the
    # MXU time), so INTERIOR blocks skip the iota/compare/where entirely:
    # masking only runs on blocks that touch the causal diagonal or the
    # padded K tail. Fully-masked causal blocks skip everything.
    on_diag = kk * bk + bk - 1 > iq * bq if causal else False
    in_tail = (kk + 1) * bk > sk_valid
    needs_mask = jnp.logical_or(on_diag, in_tail)
    visit = kk * bk <= iq * bq + bq - 1 if causal else True
    pl.when(jnp.logical_and(visit, needs_mask))(
        functools.partial(_block, True))
    pl.when(jnp.logical_and(visit, jnp.logical_not(needs_mask)))(
        functools.partial(_block, False))

    @pl.when(kk == n_k - 1)
    def _finish():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # per-row logsumexp of the scaled scores — the only forward
        # residual the blockwise backward needs beyond q/k/v/o
        # (one [BQ,1] write per final K step: negligible)
        lse_ref[0] = m_scr[:] + jnp.log(l)


def _reference_attention(q, k, v, causal: bool):
    """jnp oracle for tests (materializes S x S — never in the hot path)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where(kj <= qi, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkv->bhqv", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, causal: bool = False):
    """q [B, H, Sq, D], k/v [B, H, Sk, D/Dv] -> [B, H, Sq, Dv].

    Numerically equivalent to softmax(QK^T/sqrt(D)) V with padding-safe
    masking; q/k/v may be f32 or bf16 (compute is f32). Differentiable with
    a blockwise Pallas backward (FlashAttention-2 style): the forward saves
    only O and the per-row logsumexp; the backward recomputes P block by
    block, so neither pass ever materializes the S x S score matrix in HBM
    — memory stays O(S*d) for long-context TRAINING too (SURVEY §7 M4).
    """
    from qgemm_tpu.ops.validation import check_attention_4d
    check_attention_4d(q, k, v)
    out, _ = _flash_attention_fwd_impl(q, k, v, causal)
    return out


def _flash_fwd(q, k, v, causal):
    out, lse = _flash_attention_fwd_impl(q, k, v, causal)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, res, g):
    q, k, v, out, lse = res
    return _flash_attention_bwd_impl(q, k, v, out, lse, g, causal)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _tiles(sq, sk, d, dv):
    # 1024x1024 blocks are the r3 sweep optimum at S=4k d=128 (fwd 0.282 ->
    # 0.184 ms, fwd+bwd 0.751 -> 0.638: fewer grid steps amortize the
    # per-block online-softmax VPU work and fixed step cost); 2048-wide
    # blocks exhaust VMEM (the [BQ, BK] f32 probability block dominates).
    bq = min(1024, _round_up(sq, 8))
    bk = min(1024, _round_up(sk, 128))
    return (bq, bk, _round_up(sq, bq), _round_up(sk, bk),
            _round_up(d, 128), _round_up(dv, 128))


@functools.partial(jax.jit, static_argnames=("causal",))
def _flash_attention_fwd_impl(q, k, v, causal: bool = False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dv = v.shape[3]
    scale = 1.0 / (d ** 0.5)

    bq, bk, sqp, skp, dp, dvp = _tiles(sq, sk, d, dv)

    qp = jnp.pad(q.reshape(b * h, sq, d), ((0, 0), (0, sqp - sq), (0, dp - d)))
    kp = jnp.pad(k.reshape(b * h, sk, d), ((0, 0), (0, skp - sk), (0, dp - d)))
    vp = jnp.pad(v.reshape(b * h, sk, dv), ((0, 0), (0, skp - sk), (0, dvp - dv)))

    n_k = skp // bk
    grid = (b * h, sqp // bq, n_k)

    if causal:
        # fully-masked K blocks (above the diagonal) contribute nothing;
        # mapping their block index to the diagonal block makes consecutive
        # indices identical, so Pallas skips the redundant DMA — the
        # skipped steps cost neither compute (pl.when) nor HBM traffic
        kv_ix = lambda bh, iq, kk: (bh, jnp.minimum(kk, (iq * bq + bq - 1)
                                                    // bk), 0)
    else:
        kv_ix = lambda bh, iq, kk: (bh, kk, 0)

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal, n_k=n_k,
                          bq=bq, bk=bk, sq_valid=sq, sk_valid=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), kv_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dvp), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sqp, dvp), q.dtype),
            jax.ShapeDtypeStruct((b * h, sqp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),    # running max
            pltpu.VMEM((bq, 1), jnp.float32),    # running sum
            pltpu.VMEM((bq, dvp), jnp.float32),  # output accumulator
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=(2 if causal else 4) * b * h * sq * sk * (d + dv) // 2,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize
            + b * h * sqp * dvp * qp.dtype.itemsize,
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out[:, :sq, :dv].reshape(b, h, sq, dv), lse.reshape(b, h, sqp)[..., :sq]


# ---------------------------------------------------------------------------
# blockwise backward (FlashAttention-2): P recomputed from q/k + saved lse
# ---------------------------------------------------------------------------

def _mask_and_p(q, k, lse, iq, kk, *, scale, causal, bq, bk, sq_valid,
                sk_valid, apply_mask=True):
    """Recompute the probability block P = exp(S*scale - lse) with the same
    padding/causal mask as the forward. Padded Q rows must be masked here
    too: their lse is ZERO-padded (jnp.pad default), so an unmasked padded
    row gives p = exp(0 - 0) = 1 and contributes full-weight junk terms to
    dK/dV through P^T dO — silently wrong gradients, no NaN to catch.
    ``apply_mask=False`` on interior blocks skips the iota/where VPU work
    entirely (same predication as the forward kernel)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if not apply_mask:
        return jnp.exp(s - lse)
    qi = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + iq * bq
    kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * bk
    mask = jnp.logical_and(kj < sk_valid, qi < sq_valid)
    if causal:
        mask = jnp.logical_and(mask, kj <= qi)
    p = jnp.exp(jnp.where(mask, s - lse, _NEG_INF))  # lse [BQ, 1]
    return jnp.where(mask, p, 0.0)


def _bwd_predicates(iq, kk, *, causal, bq, bk, sq_valid, sk_valid):
    """(visit, needs_mask) scalars for a backward block: interior blocks
    (no causal diagonal, no padded-Q/K tail) run unmasked."""
    on_diag = kk * bk + bk - 1 > iq * bq if causal else False
    in_k_tail = (kk + 1) * bk > sk_valid
    in_q_tail = (iq + 1) * bq > sq_valid
    needs_mask = jnp.logical_or(jnp.logical_or(on_diag, in_k_tail), in_q_tail)
    visit = kk * bk <= iq * bq + bq - 1 if causal else True
    return visit, needs_mask


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                         dq_ref, acc_scr, *, scale, causal, n_k, bq, bk,
                         sq_valid, sk_valid):
    kk = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    def _block(apply_mask: bool):
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        p = _mask_and_p(q, k, lse_ref[0], iq, kk, scale=scale, causal=causal,
                        bq=bq, bk=bk, sq_valid=sq_valid, sk_valid=sk_valid,
                        apply_mask=apply_mask)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dlt_ref[0]) * scale       # delta [BQ, 1]
        acc_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    visit, needs_mask = _bwd_predicates(
        iq, kk, causal=causal, bq=bq, bk=bk,
        sq_valid=sq_valid, sk_valid=sk_valid)
    pl.when(jnp.logical_and(visit, needs_mask))(
        functools.partial(_block, True))
    pl.when(jnp.logical_and(visit, jnp.logical_not(needs_mask)))(
        functools.partial(_block, False))

    @pl.when(kk == n_k - 1)
    def _finish():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                          dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal,
                          n_q, bq, bk, sq_valid, sk_valid):
    iq = pl.program_id(2)
    kk = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    def _block(apply_mask: bool):
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        p = _mask_and_p(q, k, lse_ref[0], iq, kk, scale=scale, causal=causal,
                        bq=bq, bk=bk, sq_valid=sq_valid, sk_valid=sk_valid,
                        apply_mask=apply_mask)
        pt = p.astype(do.dtype)
        dv_scr[:] += jax.lax.dot_general(
            pt, do, (((0,), (0,)), ((), ())),    # P^T dO  [BK, Dv]
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - dlt_ref[0]) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),  # dS^T Q [BK, D]
            preferred_element_type=jnp.float32)

    visit, needs_mask = _bwd_predicates(
        iq, kk, causal=causal, bq=bq, bk=bk,
        sq_valid=sq_valid, sk_valid=sk_valid)
    pl.when(jnp.logical_and(visit, needs_mask))(
        functools.partial(_block, True))
    pl.when(jnp.logical_and(visit, jnp.logical_not(needs_mask)))(
        functools.partial(_block, False))

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def _flash_attention_bwd_impl(q, k, v, out, lse, g, causal: bool):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dv = v.shape[3]
    scale = 1.0 / (d ** 0.5)
    bq, bk, sqp, skp, dp, dvp = _tiles(sq, sk, d, dv)

    qp = jnp.pad(q.reshape(b * h, sq, d), ((0, 0), (0, sqp - sq), (0, dp - d)))
    kp = jnp.pad(k.reshape(b * h, sk, d), ((0, 0), (0, skp - sk), (0, dp - d)))
    vp = jnp.pad(v.reshape(b * h, sk, dv), ((0, 0), (0, skp - sk), (0, dvp - dv)))
    dop = jnp.pad(g.reshape(b * h, sq, dv), ((0, 0), (0, sqp - sq), (0, dvp - dv)))
    # delta_i = rowsum(dO_i * O_i) — O(S*d) elementwise pass, XLA-fused
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dltp = jnp.pad(delta.reshape(b * h, sq, 1), ((0, 0), (0, sqp - sq), (0, 0)))
    lsep = jnp.pad(lse.reshape(b * h, sq, 1), ((0, 0), (0, sqp - sq), (0, 0)))

    n_q, n_k = sqp // bq, skp // bk
    common_in = [qp, kp, vp, dop, lsep, dltp]

    def spec(bs, ix):
        return pl.BlockSpec(bs, ix, memory_space=pltpu.VMEM)

    if causal:
        # dedupe the DMA of skipped above-diagonal K/V blocks (see fwd)
        kv_ix = lambda bh, iq, kk: (bh, jnp.minimum(kk, (iq * bq + bq - 1)
                                                    // bk), 0)
    else:
        kv_ix = lambda bh, iq, kk: (bh, kk, 0)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          n_k=n_k, bq=bq, bk=bk, sq_valid=sq, sk_valid=sk),
        grid=(b * h, n_q, n_k),
        in_specs=[
            spec((1, bq, dp), lambda bh, iq, kk: (bh, iq, 0)),
            spec((1, bk, dp), kv_ix),
            spec((1, bk, dvp), kv_ix),
            spec((1, bq, dvp), lambda bh, iq, kk: (bh, iq, 0)),
            spec((1, bq, 1), lambda bh, iq, kk: (bh, iq, 0)),
            spec((1, bq, 1), lambda bh, iq, kk: (bh, iq, 0)),
        ],
        out_specs=spec((1, bq, dp), lambda bh, iq, kk: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dp), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(*common_in)

    if causal:
        # skipped steps here are at the START of the iq walk (q blocks
        # strictly above the K diagonal) — clamp up to the first
        # contributing block so their fetches dedupe
        q_ix = lambda bh, kk, iq: (
            bh, jnp.minimum(jnp.maximum(iq, (kk * bk) // bq), n_q - 1), 0)
    else:
        q_ix = lambda bh, kk, iq: (bh, iq, 0)
    dk, dvv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, causal=causal,
                          n_q=n_q, bq=bq, bk=bk, sq_valid=sq, sk_valid=sk),
        grid=(b * h, n_k, n_q),
        in_specs=[
            spec((1, bq, dp), q_ix),
            spec((1, bk, dp), lambda bh, kk, iq: (bh, kk, 0)),
            spec((1, bk, dvp), lambda bh, kk, iq: (bh, kk, 0)),
            spec((1, bq, dvp), q_ix),
            spec((1, bq, 1), q_ix),
            spec((1, bq, 1), q_ix),
        ],
        out_specs=[
            spec((1, bk, dp), lambda bh, kk, iq: (bh, kk, 0)),
            spec((1, bk, dvp), lambda bh, kk, iq: (bh, kk, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skp, dp), k.dtype),
            jax.ShapeDtypeStruct((b * h, skp, dvp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dp), jnp.float32),
            pltpu.VMEM((bk, dvp), jnp.float32),
        ],
        compiler_params=_compiler_params(("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(*common_in)

    return (dq[:, :sq, :d].reshape(b, h, sq, d),
            dk[:, :sk, :d].reshape(b, h, sk, d),
            dvv[:, :sk, :dv].reshape(b, h, sk, dv))


def _compiler_params(dimension_semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except TypeError:
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)
