#!/usr/bin/env python
"""Quantized GEMM correctness demo — CLI parity with the reference's
src/test_quantize.cu (flags -s/-c/-m/-n/-k, :94-117).

With no dims: the reference's hand-written 3x3 @ 3x2 case (:38-69).
With -m/-n/-k: random uniform matrices at that size. Prints the unquantized
result, the quantized result, and the mean quantization error (:71-86).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("-c", "--cpu", action="store_true", help="CPU backend")
    ap.add_argument("-m", type=int, default=0)
    ap.add_argument("-n", type=int, default=0)
    ap.add_argument("-k", type=int, default=0)
    ap.add_argument("--rounding", choices=["nearest", "truncate"],
                    default="nearest")
    ap.add_argument("--outlier-threshold", type=float, default=0.0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qgemm_tpu.ops.quantize import quantized_matmul, quantized_matmul_outlier

    if args.m and args.n and args.k:
        k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
        x = jax.random.uniform(k1, (args.m, args.k), minval=-1, maxval=1)
        w = jax.random.uniform(k2, (args.k, args.n), minval=-1, maxval=1)
    else:
        # the reference's hand-written matrices (test_quantize.cu:38-69)
        x = jnp.asarray([[2.0, -1.0, -1.0], [0.0, 3.0, 2.0], [-1.0, -1.0, 0.0]])
        w = jnp.asarray([[-1.0, 0.0], [0.0, -2.0], [-1.0, 2.0]])

    exact = x @ w
    if args.outlier_threshold > 0:
        q = quantized_matmul_outlier(x, w, threshold=args.outlier_threshold)
    else:
        q = quantized_matmul(x, w, rounding=args.rounding)

    small = exact.size <= 64
    print("Unquantized result:")
    print(exact if small else f"  [{exact.shape[0]}x{exact.shape[1]}] "
          f"mean={float(jnp.mean(exact)):.6f}")
    print("Quantized result:")
    print(q if small else f"  [{q.shape[0]}x{q.shape[1]}] "
          f"mean={float(jnp.mean(q)):.6f}")
    print("Mean quantization error:")
    print(float(jnp.mean(jnp.abs(exact - q))))


if __name__ == "__main__":
    main()
