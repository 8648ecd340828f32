#!/usr/bin/env python
"""Headline benchmark — int8 quantized GEMM vs fp32 GEMM at the reference's
problem size (2048x2048x2048, 50-iteration mean; src/timing_quantize.cu
protocol).

Reference baseline (BASELINE.md): the CUDA pipeline was 4.18x SLOWER than
fp32 (0.31954 ms fp32 vs 1.33682 ms quantized), i.e. a speedup of 0.239x.
Target: int8 FASTER than fp32 per chip. ``vs_baseline`` is our speedup
divided by the reference's 0.239x.

Prints ONE JSON line on stdout; detail goes to stderr.
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops.pallas.quantized_matmul import (
    quantized_matmul_pallas,
    quantized_matmul_prequant_pallas,
)
from qgemm_tpu.ops.quantize import quantize_weights, quantized_matmul_xla
from qgemm_tpu.utils.profiling import bench_ms

M = N = K = 2048
REFERENCE_SPEEDUP = 0.31954 / 1.33682  # 0.239x — reference int8 vs its fp32


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("-m", type=int, default=M)
    ap.add_argument("-n", type=int, default=N)
    ap.add_argument("-k", type=int, default=K)
    ap.add_argument("--iters", type=int, default=0, help="0 = auto")
    args = ap.parse_args()
    m, n, k = args.m, args.n, args.k

    on_tpu = jax.default_backend() not in ("cpu",)
    iters, base = (1500, 100) if on_tpu else (5, 1)
    if args.iters:
        iters, base = args.iters, max(1, args.iters // 15)

    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    # reference protocol: uniform(-1,1) operands (timing_quantize.cu:17-20)
    x = jax.random.uniform(k1, (m, k), jnp.float32, minval=-1, maxval=1)
    w = jax.random.uniform(k2, (k, n), jnp.float32, minval=-1, maxval=1)
    wq = quantize_weights(w)
    gflop = 2 * m * n * k / 1e9

    # --- accuracy at the reference's metric ------------------------------
    exact = np.asarray(jnp.dot(x, w, preferred_element_type=jnp.float32))
    quant = np.asarray(quantized_matmul_xla(x, w))
    signed_err = float(np.mean(quant - exact))   # the reference's metric:
    # op_subtract + .mean() (test_quantize.cu:82-86) is the SIGNED mean —
    # its README's 4.58078e-05 is residual truncation bias, not |error|
    abs_err = float(np.mean(np.abs(quant - exact)))
    log(f"quant error    : signed mean {signed_err:+.3e} "
        f"(reference metric; theirs 4.58e-5), mean|err| {abs_err:.3e}")

    # Three explicit baselines (VERDICT r1 weak #6): the reference's fp32
    # GEMM is TRUE fp32, so the headline pins precision=HIGHEST (six-pass
    # bf16 emulation on the MXU — the only way XLA:TPU does full f32
    # matmuls); the bf16 row is the realistic "fast float" baseline and is
    # reported so the headline can't be challenged either way.
    def f32_mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    def bf16_mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    t_fp32 = bench_ms(f32_mm, x, w, iters=iters, base=base)
    log(f"f32 (HIGHEST)  : {t_fp32:.4f} ms  ({gflop / t_fp32:.1f} TFLOP/s)")
    t_bf16 = bench_ms(bf16_mm, x, w, iters=iters, base=base)
    log(f"bf16 GEMM      : {t_bf16:.4f} ms  ({gflop / t_bf16:.1f} TFLOP/s)")

    if on_tpu:
        t_dyn = bench_ms(quantized_matmul_pallas, x, w, iters=iters, base=base)
        t_pre = bench_ms(
            lambda a: quantized_matmul_prequant_pallas(a, wq.q, wq.c),
            x, iters=iters, base=base)
        from qgemm_tpu.ops.pallas.w4a8_matmul import w4a8_matmul_pallas
        from qgemm_tpu.ops.quantize import quantize_weights_int4
        wq4 = quantize_weights_int4(w)
        t_w4 = bench_ms(lambda a: w4a8_matmul_pallas(a, wq4.qp, wq4.c),
                        x, iters=iters, base=base)
        log(f"w4a8 (int4 W)  : {t_w4:.4f} ms  ({gflop / t_w4:.1f} TFLOP/s)  "
            f"[int4 group-128 weights, beyond-reference]")
    else:  # CPU smoke mode: interpret-mode pallas is too slow, use XLA path
        t_dyn = bench_ms(quantized_matmul_xla, x, w, iters=iters, base=base)
        t_pre = t_dyn
        t_w4 = None
    log(f"int8 dynamic   : {t_dyn:.4f} ms  ({gflop / t_dyn:.1f} TFLOP/s)  "
        f"[quantize X+W, mm, dequant — reference pipeline parity]")
    log(f"int8 prequant  : {t_pre:.4f} ms  ({gflop / t_pre:.1f} TFLOP/s)  "
        f"[serving path: weights quantized offline]")

    speedup = t_fp32 / t_dyn
    log(f"speedup (dynamic int8 vs true-f32): {speedup:.2f}x "
        f"(reference was {REFERENCE_SPEEDUP:.3f}x, i.e. 4.18x slower)")
    log(f"speedup (dynamic int8 vs bf16)    : {t_bf16 / t_dyn:.2f}x; "
        f"prequant int8 vs bf16: {t_bf16 / t_pre:.2f}x")

    print(json.dumps({
        "metric": "int8_quantized_gemm_speedup_vs_fp32_2048cubed",
        "value": round(speedup, 4),
        "unit": "x",
        "vs_baseline": round(speedup / REFERENCE_SPEEDUP, 4),
        "detail": {
            "f32_highest_ms": round(t_fp32, 4),
            "bf16_ms": round(t_bf16, 4),
            "int8_dynamic_ms": round(t_dyn, 4),
            "int8_prequant_ms": round(t_pre, 4),
            "int8_vs_bf16": round(t_bf16 / t_dyn, 4),
            **({"w4a8_ms": round(t_w4, 4)} if t_w4 else {}),
        },
    }))


if __name__ == "__main__":
    main()
