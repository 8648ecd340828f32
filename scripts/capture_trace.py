#!/usr/bin/env python
"""Capture a jax.profiler device trace of the hot kernels and summarize it.

SURVEY §5 tracing / VERDICT r1 missing #4: profile-based verification with a
real artifact, not a hand-derived claim. Captures the 2048^3 quantized GEMM
and a KV-cached decode step, then parses the trace's /device:TPU events and
prints per-kernel device durations (these are the on-chip times XLA's
profiler measured — independent of the bench_ms marginal-cost harness, so
the two cross-check each other).

Writes the raw trace under --out (tensorboard-compatible) and prints one
JSON line with the parsed per-kernel device microseconds.

Usage: python scripts/capture_trace.py [--out /tmp/qgemm_trace]
"""

import argparse
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def device_durations(trace_dir):
    """Parse the newest trace.json.gz: {kernel name: [durations us]} for
    events on the /device:TPU process."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(
            f"no trace.json.gz under {trace_dir}/plugins/profile — the "
            "profiler wrote nothing (interrupted run or unsupported layout)")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    evs = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in evs
                if e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    out = {}
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            out.setdefault(e["name"], []).append(e["dur"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/qgemm_trace")
    args = ap.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.ops.pallas.quantized_matmul import (
        quantized_matmul_prequant_pallas)
    from qgemm_tpu.ops.quantize import quantize_weights

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (2048, 2048), jnp.float32, minval=-1, maxval=1)
    wq = quantize_weights(jax.random.uniform(k2, (2048, 2048), jnp.float32,
                                             minval=-1, maxval=1))

    cfg = GPTConfig(vocab_size=1024, d_model=1024, n_heads=8, d_ff=4096,
                    n_layers=4, max_seq_len=1024)
    model = GPT.init(cfg, key=k1).quantize()
    caches = model.init_cache(8, 1024, quantized=True)
    tok = jnp.ones((8, 1), jnp.int32)
    pos = jnp.full((8,), 900, jnp.int32)
    decode = jax.jit(lambda m, t, p, c: m.decode_step(t, p, c))

    # warm up compiles OUTSIDE the trace
    quantized_matmul_prequant_pallas(x, wq.q, wq.c).block_until_ready()
    jax.block_until_ready(decode(model, tok, pos, caches))

    with jax.profiler.trace(args.out):
        for _ in range(5):
            quantized_matmul_prequant_pallas(x, wq.q, wq.c).block_until_ready()
        for _ in range(5):
            logits, _ = decode(model, tok, pos, caches)
            logits.block_until_ready()

    durs = device_durations(args.out)
    summary = {}
    for name, ds in sorted(durs.items(), key=lambda kv: -sum(kv[1])):
        if len(ds) < 2:
            continue
        summary[name] = {"count": len(ds),
                         "mean_us": round(sum(ds) / len(ds), 1)}
        print(f"{name[:60]:62s} x{len(ds):<3d} mean "
              f"{sum(ds)/len(ds):8.1f} us", file=sys.stderr)
    print(json.dumps({"trace_dir": args.out, "device_kernels": summary}))


if __name__ == "__main__":
    main()
