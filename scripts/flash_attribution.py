#!/usr/bin/env python
"""Attribute the flash-attention roofline residual (r3 verdict #6).

SOL.md r3 argued the ~53% gap between the flash kernel and the analytic
MXU roofline is VPU online-softmax time. A device trace cannot split VPU
vs MXU inside one fused Mosaic kernel, so this measures it by ABLATION:
the same kernel (same grid, same DMAs, same two MXU dots per block, same
causal block skipping) with the online-softmax recurrence stripped —
p = s (no max/exp/renorm, no mask where). The ablated kernel's time is
what the memory system + MXU alone cost; full - ablated is the VPU share.

  * ablated ~= analytic roofline  -> residual IS the online softmax
    (attribution closed — beating it needs less VPU work per block, e.g.
    wider blocks, bf16 exp, or hardware with a faster VPU);
  * ablated >> analytic roofline  -> the MXU sits idle for another
    reason (DMA, grid overhead) — that becomes the next target.

Usage: python scripts/flash_attribution.py [--s 4096] [--d 128]
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.flash_attention import (_compiler_params, _tiles,
                                                  flash_attention)
from qgemm_tpu.utils.profiling import bench_ms


def _ablated_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, n_k, bq, bk):
    kk = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(kk == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # same causal block visit predicate as the real kernel
    visit = kk * bk <= iq * bq + bq - 1

    @pl.when(visit)
    def _block():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # NO max/exp/alpha/mask — straight accumulate (numerically garbage,
        # structurally identical MXU + DMA work)
        acc_scr[:] += jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def _ablated(q, k, v):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk, sqp, skp, dp, dvp = _tiles(sq, sk, d, d)
    qp = q.reshape(b * h, sq, d)
    kp = k.reshape(b * h, sk, d)
    vp = v.reshape(b * h, sk, d)
    n_k = skp // bk
    kv_ix = lambda bh, iq, kk: (bh, jnp.minimum(kk, (iq * bq + bq - 1)
                                                // bk), 0)
    out = pl.pallas_call(
        functools.partial(_ablated_kernel, n_k=n_k, bq=bq, bk=bk),
        grid=(b * h, sqp // bq, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda bh, iq, kk: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), kv_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), kv_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvp), lambda bh, iq, kk: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dvp), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, dvp), jnp.float32)],
        compiler_params=_compiler_params(("parallel", "parallel",
                                          "arbitrary")),
    )(qp, kp, vp)
    return out[:, :sq, :d].reshape(b, h, sq, d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=16)
    args = ap.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (args.b, args.h, args.s, args.d)
    q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

    t_full = bench_ms(lambda q, k, v: flash_attention(q, k, v, True),
                      q, k, v)
    t_abl = bench_ms(_ablated, q, k, v)

    # analytic MXU roofline: causal flash does 2 dots per visited block,
    # ~half the blocks visited -> 2 * S^2 * D flops per (b, h)
    flops = 2 * args.b * args.h * args.s * args.s * args.d
    peak_bf16 = 197e12
    t_roof = flops / peak_bf16 * 1e3
    vpu_ms = t_full - t_abl
    print(f"full flash      : {t_full:.3f} ms "
          f"({t_roof / t_full * 100:.0f}% of roofline)", file=sys.stderr)
    print(f"softmax ablated : {t_abl:.3f} ms "
          f"({t_roof / t_abl * 100:.0f}% of roofline)", file=sys.stderr)
    print(f"analytic roof   : {t_roof:.3f} ms", file=sys.stderr)
    print(f"VPU share       : {vpu_ms:.3f} ms "
          f"({vpu_ms / t_full * 100:.0f}% of full)", file=sys.stderr)

    print(json.dumps({
        "metric": "flash_vpu_share_pct", "s": args.s, "d": args.d,
        "value": round(vpu_ms / t_full * 100, 1),
        "full_ms": round(t_full, 4), "ablated_ms": round(t_abl, 4),
        "analytic_roof_ms": round(t_roof, 4),
        "ablated_pct_of_roof": round(t_roof / t_abl * 100, 1),
    }))


if __name__ == "__main__":
    main()
