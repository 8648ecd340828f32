#!/usr/bin/env python
"""Inter-token latency under loaded admissions: overlap_admission on/off.

r4 verdict item 7: the loaded-regime path serialized a whole chunked
admission prefill against every active decoder. This measures the actual
ITL impact with the engine's own stats (itl_p50_ms / itl_p95_ms — the
wall-clock gap between consecutive decode dispatches, which is exactly
the stall every resident request experiences), on a workload where long
prompts keep arriving while short requests decode.

NB on absolute numbers over the remote tunnel: every dispatch pays ~30 ms
RTT, so the floor is the tunnel, not the chip. The COMPARISON stands —
a k-chunk admission inserts k serialized chunk dispatches between decode
dispatches either way; overlap interleaves a decode after each chunk so
the p95 gap drops from (k chunks) to (1 chunk + 1 decode).

Usage: python scripts/bench_overlap.py [--layers 8 --d-model 1024]
"""

import argparse
import json
import sys

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_trace(model, overlap: bool, n_long: int, prompt_len: int,
              chunk: int, seed: int = 0):
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request
    rng = np.random.default_rng(seed)
    eng = ContinuousBatchingEngine(model, max_slots=4, paged=True,
                                   chunked_prefill=chunk,
                                   overlap_admission=overlap)
    # resident short-decode stream occupying the batch
    residents = [Request(prompt=[1 + int(t) for t in rng.integers(0, 50, 4)],
                         max_new_tokens=160) for _ in range(3)]
    for r in residents:
        eng.submit(r)
    for _ in range(8):
        eng.step()                       # warm: residents decoding
    # drop warmup ITL samples (compiles)
    eng._itl.clear()
    longs = []
    for i in range(n_long):
        # a long admission arrives every ~12 decode steps
        for _ in range(12):
            eng.step()
        lp = [1 + int(t) for t in rng.integers(0, 50, prompt_len)]
        lr = Request(prompt=lp, max_new_tokens=4)
        longs.append(lr)
        eng.submit(lr)
    eng.run_to_completion(max_steps=3000)
    st = eng.stats
    ok = all(r.error is None for r in residents + longs)
    return st, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--d-ff", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--prompt-len", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--n-long", type=int, default=6)
    args = ap.parse_args()

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                    n_heads=args.heads, d_ff=args.d_ff,
                    n_layers=args.layers,
                    max_seq_len=args.prompt_len + 256, dtype="bfloat16")
    model = GPT.init_quantized(cfg, key=jax.random.PRNGKey(0))
    log(f"model: {model.num_params()/1e9:.2f}B params; "
        f"{args.prompt_len}-token admissions in {args.chunk}-chunks")

    out = {}
    for overlap in (False, True):
        st, ok = run_trace(model, overlap, args.n_long, args.prompt_len,
                           args.chunk)
        assert ok, "errors in trace"
        tag = "overlap" if overlap else "serialized"
        out[tag] = {k: st[k] for k in ("itl_p50_ms", "itl_p95_ms",
                                       "tokens_per_s") if k in st}
        log(f"{tag:>10}: ITL p50 {st.get('itl_p50_ms')} ms, "
            f"p95 {st.get('itl_p95_ms')} ms, "
            f"{st.get('tokens_per_s')} tok/s engine-wide")

    print(json.dumps({
        "metric": "overlap_admission_itl_p95_ms",
        "value": out["overlap"].get("itl_p95_ms"),
        "unit": "ms",
        "serialized_itl_p95_ms": out["serialized"].get("itl_p95_ms"),
        "detail": out,
    }))


if __name__ == "__main__":
    main()
