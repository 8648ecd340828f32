#!/usr/bin/env python
"""Admission (prefill) cost: bucketed vs chunked, dense or paged engine.

The bucketed path compiles one program per pow2 prompt bucket (a fresh
13-20 s jit each time a new length class arrives, by the r3 dense
measurement); chunked admission reuses ONE fixed-shape chunk program for
every prompt length. This script measures both on the real chip through
the engine itself (per-admission wall time = engine admit timing), for
the dense (--mode dense) or paged (--mode paged) cache.

Usage: python scripts/bench_chunked_admission.py --mode paged
"""

import argparse
import json
import sys
import time

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(model, lengths, chunked, mode, vocab):
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    kw = {"paged": mode == "paged"}
    if chunked:
        kw["chunked_prefill"] = 256
    eng = ContinuousBatchingEngine(model, max_slots=4,
                                   quantized_cache=mode == "dense", **kw)
    rng = np.random.default_rng(7)
    times = []
    for ln in lengths:
        t0 = time.perf_counter()
        eng.submit(Request(
            prompt=[int(t) for t in rng.integers(0, vocab, ln)],
            max_new_tokens=2))
        eng.step()                          # admission happens here
        times.append(time.perf_counter() - t0)
        eng.run_to_completion(max_steps=20)
    return times


def bench_prefix(model, vocab, log):
    """Steady-state admission latency of a REPEATED 2048-token prompt:
    prefix compute-skip (suffix-only prefill) vs full prefill."""
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    rng = np.random.default_rng(11)
    system = [int(t) for t in rng.integers(0, vocab, 2047)]

    def run(prefix_cache):
        eng = ContinuousBatchingEngine(model, max_slots=2, paged=True,
                                       prefix_cache=prefix_cache)
        times = []
        for i in range(6):                  # first publishes + compiles
            t0 = time.perf_counter()
            eng.submit(Request(prompt=system + [i], max_new_tokens=2))
            eng.step()
            times.append(time.perf_counter() - t0)
            eng.run_to_completion(max_steps=10)
        skipped = eng.stats.get("prefill_tokens_skipped", 0)
        return times, skipped

    on, skipped = run(True)
    off, _ = run(False)
    # steady state = the last three admissions (compiles amortized)
    on_ms = sum(on[-3:]) / 3 * 1e3
    off_ms = sum(off[-3:]) / 3 * 1e3
    log(f"repeated 2048-token prompt admission: prefix-skip {on_ms:.0f} ms"
        f" vs full prefill {off_ms:.0f} ms ({off_ms/on_ms:.1f}x; "
        f"{skipped} prompt tokens skipped)")
    return {"prefix_skip_ms": round(on_ms, 1),
            "full_prefill_ms": round(off_ms, 1),
            "speedup": round(off_ms / on_ms, 2),
            "tokens_skipped": int(skipped)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("dense", "paged"), default="paged")
    ap.add_argument("--prefix", action="store_true",
                    help="also measure repeated-prompt prefix-skip "
                         "admission latency (paged)")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--vocab", type=int, default=32000)
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.d_model // 128, d_ff=4 * args.d_model,
                    n_layers=args.layers, max_seq_len=2560,
                    dtype="bfloat16")
    model = GPT.init(cfg, key=jax.random.PRNGKey(0)).quantize()
    if args.prefix:
        out = bench_prefix(model, args.vocab, log)
        print(json.dumps({"metric": "prefix_skip_admission_speedup",
                          "value": out["speedup"], "unit": "x", **out}))
        return
    # five distinct pow2 length classes -> five bucketed compiles
    lengths = (600, 900, 1300, 1800, 2048)

    bt = run(model, lengths, False, args.mode, args.vocab)
    log(f"bucketed admissions ({args.mode}): "
        + " ".join(f"{t:.2f}s" for t in bt))
    ct = run(model, lengths, True, args.mode, args.vocab)
    log(f"chunked admissions  ({args.mode}): "
        + " ".join(f"{t:.2f}s" for t in ct))
    # steady state: re-admit the same lengths on the SAME chunked engine
    # programs — a second engine shares the jit cache within the process,
    # so re-run lengths through a fresh engine and take the per-admission
    # times (all compiles amortized)
    st = run(model, lengths, True, args.mode, args.vocab)
    log(f"chunked steady-state: " + " ".join(f"{t*1e3:.0f}ms" for t in st))

    print(json.dumps({
        "metric": f"{args.mode}_chunked_admission_total_s",
        "value": round(sum(ct), 2), "unit": "s",
        "bucketed_total_s": round(sum(bt), 2),
        "bucketed_per_admission_s": [round(t, 2) for t in bt],
        "chunked_per_admission_s": [round(t, 2) for t in ct],
        "chunked_steady_ms": [round(t * 1e3) for t in st],
    }))


if __name__ == "__main__":
    main()
