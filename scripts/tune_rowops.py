#!/usr/bin/env python
"""Sweep the row-block size of the softmax / layernorm+residual kernels on
the real chip (they sit at 56% / 74% of the HBM roofline in SOL.md — the
row block sets the DMA pipelining depth). Prints a JSON line with the best
block per kernel; bake winners into the kernels' heuristics.
"""

import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from qgemm_tpu.ops.pallas.layernorm import layernorm_residual_pallas
from qgemm_tpu.ops.pallas.softmax import softmax_pallas
from qgemm_tpu.utils.profiling import bench_ms


def main():
    assert jax.default_backend() != "cpu"
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (8192, 4096), jnp.float32)
    r = jax.random.normal(k2, (8192, 4096), jnp.float32)
    best = {}
    for name, fn in (
        ("softmax", lambda bm: bench_ms(
            lambda a: softmax_pallas(a, block_rows=bm), x,
            iters=400, base=25)),
        ("layernorm_residual", lambda bm: bench_ms(
            lambda a, b: layernorm_residual_pallas(a, b, block_rows=bm),
            x, r, iters=400, base=25)),
    ):
        rows = {}
        for bm in (64, 128, 256, 512, 1024):
            try:
                rows[bm] = round(fn(bm), 4)
            except Exception as e:  # noqa: BLE001 (vmem OOM at big blocks)
                rows[bm] = f"fail: {type(e).__name__}"
            print(f"{name} bm={bm}: {rows[bm]}", file=sys.stderr)
        ok = {k: v for k, v in rows.items() if isinstance(v, float)}
        if ok:
            bm_best = min(ok, key=ok.get)
            best[name] = {"best_bm": bm_best, "ms": ok[bm_best], "all": rows}
        else:
            best[name] = {"best_bm": None, "all": rows}
    print(json.dumps(best))


if __name__ == "__main__":
    main()
