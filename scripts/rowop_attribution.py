#!/usr/bin/env python
"""Ablation-grade attribution for the row-op kernels (softmax, fused
LN+residual) — r4 verdict item 5: SOL.md asserted their 56-64% of the
HBM roofline was "exp/rsqrt VPU time" without the ablation flash got
(scripts/flash_attribution.py). Same method here: re-measure the SAME
kernel (identical grid, block shapes, HBM traffic) with the VPU
recurrence stripped, in stages, so the runtime decomposes into

    stream time (copy through the kernel's own grid)
  + reduction time (row max/sum passes, no transcendentals)
  + transcendental time (exp / the normalize divide; rsqrt is per-row)

and any residual between the copy stage and the measured XLA stream
ceiling is genuine kernel/grid overhead — the part that would be a WIN to
remove. The XLA fused equivalents are measured alongside (carry-chained,
so XLA cannot collapse the op — see sol_report's stream-row note).

Usage: python scripts/rowop_attribution.py [--rows 8192 --cols 4096]
"""

import argparse
import functools
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qgemm_tpu.ops.pallas.quantized_matmul import _compiler_params
from qgemm_tpu.utils.profiling import bench_ms

HBM_GBPS = 819e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def _round_up(x, m):
    return -(-x // m) * m


# ---- variant kernels: identical grid/blocks to the production ones ------

def _softmax_variant_kernel(x_ref, o_ref, *, stage: str):
    x = x_ref[:].astype(jnp.float32)
    if stage == "copy":
        o_ref[:] = (x * 1.0000001).astype(o_ref.dtype)
        return
    m = jnp.max(x, axis=-1, keepdims=True)
    if stage == "reduce":                 # max + sum + divide, NO exp
        e = x - m
        s = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[:] = (e / s).astype(o_ref.dtype)
        return
    e = jnp.exp(x - m)                    # full
    s = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = (e / s).astype(o_ref.dtype)


def softmax_variant(x, stage):
    n = x.shape[-1]
    x2 = x.reshape(-1, n)
    m = x2.shape[0]
    npad = _round_up(n, 128)
    bm = max(8, min(512, (1 << 20) // npad // 8 * 8))   # production heuristic
    mpad = _round_up(m, bm)
    return pl.pallas_call(
        functools.partial(_softmax_variant_kernel, stage=stage),
        grid=(mpad // bm,),
        in_specs=[pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mpad, npad), x.dtype),
        compiler_params=_compiler_params(("parallel",)),
    )(x2)


def _ln_variant_kernel(x_ref, r_ref, o_ref, *, stage: str):
    x = x_ref[:].astype(jnp.float32)
    r = r_ref[:].astype(jnp.float32)
    if stage == "copy":
        o_ref[:] = ((x + r) * 1.0000001).astype(o_ref.dtype)
        return
    x = x + r
    inv_n = 1.0 / x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) * inv_n
    cx = x - mean
    if stage == "reduce":                 # mean-subtract only
        o_ref[:] = cx.astype(o_ref.dtype)
        return
    var = jnp.sum(cx * cx, axis=-1, keepdims=True) * inv_n
    y = cx * jax.lax.rsqrt(var + 1e-5)
    o_ref[:] = y.astype(o_ref.dtype)      # full (minus the affine: gamma/
    # beta are [1, N] VMEM-resident multiplies, included in "full+affine")


def ln_variant(x, r, stage):
    n = x.shape[-1]
    m = x.shape[0]
    npad = _round_up(n, 128)
    bm = max(8, min(256, (1 << 20) // npad // 8 * 8))
    mpad = _round_up(m, bm)
    return pl.pallas_call(
        functools.partial(_ln_variant_kernel, stage=stage),
        grid=(mpad // bm,),
        in_specs=[pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((bm, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mpad, npad), x.dtype),
        compiler_params=_compiler_params(("parallel",)),
    )(x, r)


def _carry_chained_ms(fn, x, iters, repeats=4):
    """Carry-chained timing for pure-XLA ops (sol_report stream-row rule:
    bench_ms's scalar-dependency harness lets XLA collapse elementwise
    chains; chaining the full output through the carry does not)."""
    @jax.jit
    def run(c):
        def step(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(step, c, None, length=iters)
        return jnp.sum(c[..., :1].astype(jnp.float32))
    float(run(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best


def chained_ms(fn, x, iters=400):
    hi = _carry_chained_ms(fn, x, iters)
    lo = _carry_chained_ms(fn, x, max(1, iters // 15))
    return max(hi - lo, 1e-9) / (iters - max(1, iters // 15)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)
    ap.add_argument("--cols", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (args.rows, args.cols), jnp.float32)
    r = jax.random.normal(k2, (args.rows, args.cols), jnp.float32)
    nbytes = x.size * 4
    bench = lambda f, *a: bench_ms(f, *a, iters=args.iters,
                                   base=max(1, args.iters // 15))

    out = {}
    # ---- softmax: 2-stream pattern (read + write) -----------------------
    sol_sm = 2 * nbytes / HBM_GBPS * 1e3
    rows_sm = {}
    for stage in ("copy", "reduce", "full"):
        f = jax.jit(functools.partial(softmax_variant, stage=stage))
        rows_sm[stage] = chained_ms(f, x, args.iters)
        log(f"softmax/{stage:6s}: {rows_sm[stage]:.4f} ms "
            f"({100*sol_sm/rows_sm[stage]:.1f}% of 2-stream SOL "
            f"{sol_sm:.4f} ms)")
    from qgemm_tpu.ops.pallas.softmax import softmax_pallas
    rows_sm["production"] = chained_ms(jax.jit(softmax_pallas), x,
                                       args.iters)
    rows_sm["xla_fused"] = chained_ms(
        jax.jit(lambda a: jax.nn.softmax(a, axis=-1)), x, args.iters)
    log(f"softmax/production: {rows_sm['production']:.4f} ms; "
        f"XLA fused: {rows_sm['xla_fused']:.4f} ms")
    out["softmax"] = {k: round(v, 4) for k, v in rows_sm.items()}
    out["softmax_sol_ms"] = round(sol_sm, 4)

    # ---- LN + residual: 3-stream pattern (2 reads + write) --------------
    sol_ln = 3 * nbytes / HBM_GBPS * 1e3
    rows_ln = {}
    for stage in ("copy", "reduce", "full"):
        f = jax.jit(functools.partial(ln_variant, stage=stage))
        rows_ln[stage] = chained_ms(lambda a, r=r, f=f: f(a, r), x,
                                    args.iters)
        log(f"ln+res/{stage:6s}: {rows_ln[stage]:.4f} ms "
            f"({100*sol_ln/rows_ln[stage]:.1f}% of 3-stream SOL "
            f"{sol_ln:.4f} ms)")
    from qgemm_tpu.ops.pallas.layernorm import layernorm_residual_pallas
    rows_ln["production"] = chained_ms(
        jax.jit(lambda a: layernorm_residual_pallas(a, r)), x, args.iters)

    def xla_ln(a):
        s = a + r
        mu = jnp.mean(s, axis=-1, keepdims=True)
        c = s - mu
        v = jnp.mean(c * c, axis=-1, keepdims=True)
        return c * jax.lax.rsqrt(v + 1e-5)
    rows_ln["xla_fused"] = chained_ms(jax.jit(xla_ln), x, args.iters)
    log(f"ln+res/production: {rows_ln['production']:.4f} ms; "
        f"XLA fused: {rows_ln['xla_fused']:.4f} ms")
    out["ln_residual"] = {k: round(v, 4) for k, v in rows_ln.items()}
    out["ln_residual_sol_ms"] = round(sol_ln, 4)

    # decomposition summary
    for name, rows, sol in (("softmax", rows_sm, sol_sm),
                            ("ln_residual", rows_ln, sol_ln)):
        stream = rows["copy"]
        reduce_t = rows["reduce"] - rows["copy"]
        trans = rows["full"] - rows["reduce"]
        overhead = rows["production"] - rows["full"]
        log(f"{name}: stream {stream:.3f} (grid vs analytic "
            f"{100*sol/stream:.0f}%), +reductions {reduce_t:.3f}, "
            f"+transcendentals {trans:.3f}, +prod-vs-full "
            f"{overhead:+.3f} ms")
        out[name + "_decomposition_ms"] = {
            "stream": round(stream, 4), "reductions": round(reduce_t, 4),
            "transcendentals": round(trans, 4),
            "production_minus_full": round(overhead, 4)}

    print(json.dumps({"metric": "rowop_attribution",
                      "value": round(rows_sm["production"], 4),
                      "unit": "ms", **out}))


if __name__ == "__main__":
    main()
