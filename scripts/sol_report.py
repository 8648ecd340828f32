#!/usr/bin/env python
"""Per-kernel speed-of-light report on the real chip (SURVEY §5 tracing /
§7 hard-part 6: profile-based performance verification, not hope).

For every hot kernel: measure (utils/profiling.bench_ms — in-jit scan,
marginal cost, safe on the tunnel), compute the analytic roofline from the
chip's MXU rate and HBM bandwidth, and report achieved/SOL. Writes SOL.md
(checked in) and prints one JSON line.

Roofline model (TPU v5e / "lite" per public specs):
  MXU: 394 TOPS int8, 197 TFLOP/s bf16 (f32 = bf16/6, six-pass emulation)
  HBM: 819 GB/s
SOL time for a kernel = max(flops/mxu_rate, bytes/hbm_bw).

Usage: python scripts/sol_report.py [--trace /tmp/trace]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from qgemm_tpu.utils.profiling import bench_ms  # noqa: E402

# TPU v5e public specs
INT8_TOPS = 394e12
BF16_FLOPS = 197e12
F32_FLOPS = BF16_FLOPS / 6          # HIGHEST = six bf16 passes
HBM_GBPS = 819e9


def sol_ms(flops, bytes_, mxu=BF16_FLOPS):
    return max(flops / mxu, bytes_ / HBM_GBPS) * 1e3


_NOTES = """
Standing analysis (r3; regenerated with every run — measured values above
move a few percent run to run through the remote-TPU tunnel, ~±10%, and
the short decode-shaped rows up to ~±25%):

- **qmm byte model reconciled (r2's anomaly).** The scan harness holds W
  loop-invariant, so XLA hoists the fused col-quantize of W out of the
  loop and the in-loop traffic equals the prequant row's — hence those
  two rows measure identically (~82%). The cold-weights row chains W
  through the carry so the quantize cannot hoist; it matches its model
  at ~100%, making the three rows mutually consistent.
- **Row ops are calibrated against the MEASURED stream ceiling** (the
  pure read+write row: ~81% of the 819 GB/s paper figure, i.e. ~660 GB/s
  achievable for this pattern); their byte models count the harness's
  own consumption read (see the r5 close-out bullet below — the r3
  "residual is exp/rsqrt VPU time" claim was an accounting artifact; the
  VPU work is fully hidden). The stream row must be carry-chained —
  under the normal harness XLA collapses sum(a*k) to k*sum(a) and drops
  the write.
- **Paged decode: ragged grid ~68% vs rectangular ~47%** (one grid step
  per two ALLOCATED pages from host-built scalar-prefetch step tables;
  beyond-resident DMA clamps to the slot's last page, so idle steps move
  zero bytes; 53.5 us by device trace). The residual is per-page compute
  (small per-KV-head MXU dots vs a 0.64 us page DMA); a 4-page unroll
  measured the same, so the floor is the serial per-page dot chain, not
  grid-step overhead. **r5: the "wider pages" lever was MEASURED
  end-to-end and refuted** (`scripts/bench_page_size.py`, 6.86B int8 at
  1024-token context, batch 8): 64-token pages 301.8 tok/s, 128 pages
  301.6 (tied), 256 pages 277.3 (-8% — the wider page's partial-tail
  positions still DMA and the per-step dot grows without more overlap).
  128 stays the default (64 ties on speed but doubles page-table and
  prefix-hash work); page size is now an engine parameter, with kernel
  parity pinned at 64/128/256.
- **Flash attention ~47% of the MXU roofline** (1024x1024 block sweep;
  was 30% in r2). The A/B on the identical shape: the public JAX TPU
  flash kernel runs 1.046 ms and splash attention 1.026 ms vs 0.186 ms
  here — 5.6x faster than both; the lead grows with context (6.5x at
  S=8k, 56% of roofline; 7.3x at S=16k, 63%) as the VPU share amortizes.
- **r4 CLOSE-OUT — the 53% residual, attributed by ABLATION**
  (`scripts/flash_attribution.py`; a device trace cannot split VPU/MXU
  inside one fused Mosaic kernel, so the same kernel was re-run with the
  online-softmax recurrence stripped — identical grid, DMAs and MXU
  dots). At S=4k d=128 causal B1 H16: full 0.734 ms, ablated 0.518 ms,
  triangle-flops roofline 0.349 ms. Decomposition:
    * **online-softmax VPU work: 0.216 ms (29% of runtime)** — the part
      r3 claimed; real but NOT the whole residual;
    * **block-granular causality: +25% extra MXU flops** — 1024-wide
      blocks visit 10/16 of the S x S plane, not the 1/2 triangle, so
      the true work is 85.9 GF (ideal 0.436 ms), against which the
      ablated kernel runs at **84% of peak**; XLA on the identical
      batched dot chain (incl. the f32->bf16 convert of S) reaches 96%
      (0.456 ms) — the Pallas grid/DMA overhead vs XLA's ceiling is
      only ~0.06 ms;
    * the old "47% of roofline" framing divided by the unreachable
      triangle number. Verdict: softmax VPU ~2/3 of the addressable
      residual, wasted over-diagonal flops ~1/4.
  **r4 follow-up: the "finer K-granularity on diagonal blocks" lever was
  TAKEN, measured NEGATIVE, and reverted.** Sub-blocking the diagonal
  block's K axis (db=512 and db=256, static row-sliced dots so sub-block
  j computes only rows >= j*db — 25-37.5% fewer diagonal MXU flops AND
  proportionally less exp/reduce VPU work) ran consistently SLOWER than
  the single-update 1024-wide diagonal: min-of-5 in-process (spread <1%),
  repeated across processes — S=2k 0.266 vs 0.244 ms, S=4k 0.769 vs
  0.734, S=8k 2.521 vs 2.441 (db=256 worse still: 0.854 at S=4k). The
  extra online-softmax update rounds (one per sub-block: fresh
  max/alpha/acc-rescale over the remaining rows) cost more than the
  saved flops — the same economics that made 1024 blocks beat 512 in the
  r3 sweep, now confirmed INSIDE the diagonal block. The 25%
  over-diagonal flop waste is therefore priced in as cheaper than any
  finer-granularity recovery on v5e; the residual item is closed.
- **INT8 flash attention: measured NEGATIVE on v5e, kernel kept as a
  tested option** (`ops/pallas/int8_flash_attention.py`, r4). The
  SageAttention direction — K mean-smoothing (softmax-invariant), per-row
  Q/K int8, int8 MXU dots at 2x bf16 peak — was implemented two ways and
  both LOSE to the bf16 flash kernel at S=4k d=128 causal: full int8
  (both dots + P->int8) 0.961 ms, QK^T-only int8 0.840 ms, vs bf16
  0.734 ms. The attribution above explains why: the kernel is
  VPU-bound, and int8 ADDS VPU work (the s32->f32 convert + two scale
  multiplies on every [1024,1024] score block outweigh halving a dot
  that is only ~0.2 ms of the 0.73). Accuracy is fine (max err 0.02-0.03
  vs f32, ~2-3x the bf16 kernel's 0.011). Kept exported + parity-tested
  (CPU interpret + TPU) for hardware where the MXU:VPU ratio differs;
  NOT wired into the serving path — on v5e the quantization win lives in
  the GEMMs and the KV cache, not the attention dots.
- **W4A8 decode-shaped row: best measured 44.5 us (99.7% of its HBM
  roofline)**; the short duration makes it the noisiest row through the
  tunnel (typical 45-59 us, 76-100%). r5 diagnostic at the 6.86B decode
  GEMM shapes (m=1 and m=8; K/N 4096/12288, 4096/16384, 16384/4096,
  4096/4096): the kernel sits at ~62-75% of its roofline vs int8's
  66-84% on the same shapes — batch-1 is NOT the penalty (m=1 == m=8);
  the per-128-group serial sub-dot chain is. A bn/bk tile sweep moved
  individual cells +-10% but run-to-run tunnel variance on these
  50-60 us rows is the same size (the production config itself measured
  72% and 83% in different processes), so the default tiles stand; the
  honest summary is ~25% headroom on 4096-deep W4A8 decode shapes,
  which is also why the 6.86B W4A8 self-spec draft runs at 0.62x the
  target instead of the ~0.5x byte ratio (RESULTS_SPECULATIVE r5).
- The softmax/layernorm 256-row block heuristic remains the sweep
  optimum (scripts/tune_rowops.py); the fused layernorm+residual kernel
  beats the XLA composition by 22% — that fusion is why it exists.
- **Paged CONTEXT attention (prefix-skip suffix prefill) intentionally
  ships as XLA gather+einsum, not a Pallas kernel** — measured, not
  assumed: the blocked scalar-prefetch kernel
  (`paged_context_attention`: online softmax over the page walk,
  128-row VMEM tiles, per-block causal page skip + DMA clamp, 2-page
  unroll) ran 105 us vs the oracle's 41 us at an engine-realistic
  suffix (Hkv=16, D=64, C=256 on a 2176-token prompt, 17/18 pages
  resident). Multi-row chunk attention is COMPUTE-bound, and one fused
  einsum with N = the whole resident context feeds the MXU far better
  than per-page 128-wide score tiles; page unrolling didn't close the
  per-dot-width gap. The kernel wins only when resident length is
  under ~1/3 of the reserved table width (1.27x at 4/18 pages — the
  oracle always gathers the full width) and stays exported +
  parity-tested (tpu_checks 5c) for that regime. Kernel-engineering
  footnote: the first cut OOMed scoped vmem at 28.6 MB — the 3D
  [H, R, page] int32 iota/compare mask temps, not the data tiles, were
  most of the footprint; masks built [R, page] and broadcast plus
  128-row tiles brought it under budget.
- **r5 CLOSE-OUT — softmax/LN rows attributed by ABLATION and
  reconciled** (`scripts/rowop_attribution.py`, the flash_attribution
  method applied to the row ops). Stage variants of the SAME kernels
  (identical grid/blocks) — pure copy, reductions-without-
  transcendentals, full — measure IDENTICAL (softmax 0.8176 / 0.8186 /
  0.8177 ms chained; LN+res 0.9934 / 0.9959 / 0.9882): the exp/rsqrt
  VPU work the r3 note blamed is FULLY HIDDEN under the DMA stream; the
  runtime is pure stream time. The old 55.7% / 64.1% figures were a
  HARNESS accounting error: bench_ms consumes the output through a full
  reduce (one extra read stream) and the chained harness adds a
  scan-carry copy; counting the harness bytes, the kernels move
  ~680-700 GB/s — 83-85% of paper HBM, i.e. AT the measured ~81% stream
  ceiling. The byte models above now include the harness read, and the
  rows report accordingly. (Chained-harness footnote: XLA's fused
  softmax "wins" 0.58 vs 0.81 ms there ONLY because XLA fuses the
  softmax into the scan-carry copy a pallas_call cannot elide — a
  harness artifact, not a serving-path gap; in real programs both fuse
  into their consumers or run at the same stream ceiling.)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="", help="also capture a profiler trace here")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--out", default="SOL.md")
    args = ap.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"

    rows = []

    def row(name, t_ms, flops, bytes_, mxu, note=""):
        sol = sol_ms(flops, bytes_, mxu)
        bound = "MXU" if flops / mxu > bytes_ / HBM_GBPS else "HBM"
        rows.append({
            "kernel": name, "measured_ms": round(t_ms, 4),
            "sol_ms": round(sol, 4), "pct_sol": round(100 * sol / t_ms, 1),
            "bound": bound, "note": note,
        })
        print(f"{name:42s} {t_ms:8.4f} ms  SOL {sol:7.4f} ms "
              f"({100 * sol / t_ms:5.1f}% of {bound} roofline) {note}",
              file=sys.stderr)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    bench = lambda f, *a: bench_ms(f, *a, iters=args.iters,
                                   base=max(1, args.iters // 15))

    # ---- quantized GEMM 2048^3 (the headline) -----------------------------
    from qgemm_tpu.ops.pallas.quantized_matmul import (
        quantized_matmul_pallas, quantized_matmul_prequant_pallas)
    from qgemm_tpu.ops.quantize import quantize_weights
    m = n = k = 2048
    x = jax.random.uniform(k1, (m, k), jnp.float32, minval=-1, maxval=1)
    w = jax.random.uniform(k2, (k, n), jnp.float32, minval=-1, maxval=1)
    wq = quantize_weights(w)
    flops = 2 * m * n * k
    # prequant: read X f32 once, W int8 once, write O f32 once
    row("int8 prequant qmm 2048^3",
        bench(lambda a: quantized_matmul_prequant_pallas(a, wq.q, wq.c), x),
        flops, m * k * 4 + k * n + m * n * 4, INT8_TOPS)
    # dynamic, WEIGHTS RESIDENT (the serving steady state, and what the
    # scan harness actually measures: W is loop-invariant, so XLA hoists
    # the fused col-quantize of W out of the loop — in-loop traffic equals
    # the prequant row's; r2's k*n*5 model double-counted it and read >100%)
    row("int8 dynamic qmm 2048^3 (W-quant hoisted)",
        bench(quantized_matmul_pallas, x, w),
        flops, m * k * 4 + k * n + m * n * 4, INT8_TOPS)
    # dynamic, COLD WEIGHTS (reference-parity protocol: W quantized in line
    # every call) — W chained through the carry so the quantize can't hoist:
    # reads X f32 + W f32, writes+reads W int8, writes O f32
    row("int8 dynamic qmm 2048^3 (W quantized in line)",
        bench(lambda a, b: quantized_matmul_pallas(a, b + a * 1e-30), x, w),
        flops, m * k * 4 + k * n * 5 + m * n * 4, INT8_TOPS)
    row("bf16 dot 2048^3 (baseline)",
        bench(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
              x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)),
        flops, m * k * 2 + k * n * 2 + m * n * 4, BF16_FLOPS)

    # ---- W4A8 (int4 group-quantized weights), decode-shaped ---------------
    from qgemm_tpu.ops.pallas.w4a8_matmul import w4a8_matmul_pallas
    from qgemm_tpu.ops.quantize import quantize_weights_int4
    m4, k4, n4 = 8, 16384, 4096
    x4 = jax.random.uniform(k1, (m4, k4), jnp.float32, minval=-1, maxval=1)
    w4_ = jax.random.uniform(k2, (k4, n4), jnp.float32, minval=-1, maxval=1)
    wq4 = quantize_weights_int4(w4_)
    row("w4a8 qmm 8x16384x4096 (decode-shaped)",
        bench(lambda a: w4a8_matmul_pallas(a, wq4.qp, wq4.c), x4),
        2 * m4 * n4 * k4,
        m4 * k4 * 4 + k4 * n4 // 2 + (k4 // 128) * n4 * 4 + m4 * n4 * 4,
        INT8_TOPS)

    # ---- MoE expert FFN, decode-shaped (weight-stream-bound) --------------
    # engine-realistic decode shapes: batch 8 top-2 over 8 experts routes
    # T=8 tokens into [E=8, C=8, d] expert slabs; the einsum streams EVERY
    # expert's weights per step regardless of C, so SOL = weight bytes/HBM.
    from qgemm_tpu.models.moe import (quantize_expert_weights,
                                      quantized_expert_ffn)
    me, mc, md, mf = 8, 8, 2048, 4096
    xin = jax.random.normal(k1, (me, mc, md), jnp.float32)
    wu = quantize_expert_weights(
        jax.random.uniform(k1, (me, md, mf), jnp.float32, minval=-1,
                           maxval=1))
    wd_ = quantize_expert_weights(
        jax.random.uniform(k2, (me, mf, md), jnp.float32, minval=-1,
                           maxval=1))
    moe_bytes = me * (md * mf + mf * md) \
        + me * (mf + md) * 4 + 2 * me * mc * md * 4
    row("int8 expert FFN 8Ex8Cx2048dx4096f (decode)",
        bench(lambda a: quantized_expert_ffn(a, wu, wd_), xin),
        2 * 2 * me * mc * md * mf, moe_bytes, INT8_TOPS,
        note="jnp einsum path (models/moe.py)")

    # ---- decode attention over int8 KV cache (HBM-bound) ------------------
    from qgemm_tpu.ops.kv_cache import quantize_kv
    from qgemm_tpu.ops.pallas.decode_attention import decode_attention
    b, h, s, d = 8, 16, 2048, 128
    kc_ = jax.random.normal(k1, (b, h, s, d), jnp.float32)
    vc_ = jax.random.normal(k2, (b, h, s, d), jnp.float32)
    kq, kcs = quantize_kv(kc_)
    vq, vcs = quantize_kv(vc_)
    q1 = jax.random.normal(k1, (b, h, 1, d), jnp.float32)
    lengths = jnp.full((b,), s, jnp.int32)
    cache_bytes = 2 * b * h * s * d + 2 * b * h * s * 4  # int8 K/V + f32 scales
    row("decode attention int8 cache 8x16x2048x128",
        bench(lambda q: decode_attention(q, kq, vq, lengths, kc=kcs, vc=vcs), q1),
        4 * b * h * s * d, cache_bytes, BF16_FLOPS)

    # ---- paged decode attention (block-table int8 cache) ------------------
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                               PagedKVCache, init_paged_cache,
                                               paged_write_prompt)
    import numpy as _np
    pb, ph, pd, pps = 8, 16, 128, 16
    npg = 1 + pb * pps
    pcache = init_paged_cache(ph, pd, n_pages=npg, batch=pb,
                              pages_per_slot=pps)
    palloc = PageAllocator(npg, pb, pps)
    plens = [2048, 700, 129, 40, 1024, 333, 2000, 512]
    ppt = _np.zeros((pb, pps), _np.int32)
    for slot, ln in enumerate(plens):
        for j, p in palloc.grow(slot, ln):
            ppt[slot, j] = p
    pcache = PagedKVCache(kq=pcache.kq, kc=pcache.kc, vq=pcache.vq,
                          vc=pcache.vc, page_table=jnp.asarray(ppt),
                          page_size=PAGE_SIZE)
    wp = jax.jit(paged_write_prompt)
    for slot, ln in enumerate(plens):
        kp = jax.random.normal(k1, (ph, 2048, pd), jnp.float32)
        pcache = wp(pcache, slot, kp, kp)
    from qgemm_tpu.ops.pallas.paged_attention import paged_decode_attention
    pjl = jnp.asarray(plens, jnp.int32)
    pq = jax.random.normal(k2, (pb, ph, 1, pd), jnp.float32)
    resident = sum(len(p) for p in palloc.slot_pages) * PAGE_SIZE
    pbytes = resident * ph * (2 * pd + 2 * 4)   # int8 K+V + f32 scales
    row("paged decode attention (mixed 40-2048 resident)",
        bench(lambda q: paged_decode_attention(q, pcache, pjl), pq),
        4 * ph * resident * pd, pbytes, BF16_FLOPS,
        note="reads resident pages only")
    from dataclasses import replace as _rep

    from qgemm_tpu.ops.pallas.paged_attention import \
        paged_decode_attention_ragged
    from qgemm_tpu.serving.paged_cache import build_step_tables
    pss, psp = build_step_tables([len(p) for p in palloc.slot_pages], pps,
                                 bucket=16)
    prcache = _rep(pcache, step_slot=jnp.asarray(pss),
                   step_page=jnp.asarray(psp))
    row("paged decode RAGGED grid (same workload)",
        bench(lambda q: paged_decode_attention_ragged(q, prcache, pjl), pq),
        4 * ph * resident * pd, pbytes, BF16_FLOPS,
        note=f"{len(pss)} steps vs {pb * pps} rectangular")

    # ---- flash attention fwd + bwd at S=4k (training path) ----------------
    from qgemm_tpu.ops.pallas.flash_attention import flash_attention
    B, H, S, D = 1, 4, 4096, 128
    qf = jax.random.normal(k1, (B, H, S, D), jnp.bfloat16)
    kf = jax.random.normal(k2, (B, H, S, D), jnp.bfloat16)
    vf = jax.random.normal(k1, (B, H, S, D), jnp.bfloat16)
    fl_flops = 4 * B * H * S * S * D / 2          # causal halves the work
    io = 4 * B * H * S * D * 2
    row("flash attention fwd S=4k causal",
        bench(lambda q, k_, v: flash_attention(q, k_, v, True), qf, kf, vf),
        fl_flops, io, BF16_FLOPS)
    grad = jax.jit(jax.grad(
        lambda q, k_, v: jnp.sum(flash_attention(q, k_, v, True)
                                 .astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    # bwd ~ 2.5x fwd flops (dq, dkv kernels re-do S@K plus three more dots)
    row("flash attention fwd+bwd S=4k causal",
        bench(lambda q, k_, v: grad(q, k_, v), qf, kf, vf),
        3.5 * fl_flops, 3 * io, BF16_FLOPS)

    # ---- fused layernorm+residual / softmax (HBM-bound elementwise) -------
    from qgemm_tpu.ops.pallas.layernorm import layernorm_residual_pallas
    from qgemm_tpu.ops.pallas.softmax import softmax_pallas
    xs = jax.random.normal(k1, (8192, 4096), jnp.float32)
    rs = jax.random.normal(k2, (8192, 4096), jnp.float32)
    nbytes = xs.size * 4
    # calibration: a pure stream (1 read + 1 write) pins the ACHIEVABLE HBM
    # rate for this access pattern — the row-op %s below should be read
    # against this row, not the paper bandwidth (r2 left them looking like
    # "half of light" when XLA's own fused softmax measures within 10%).
    # NB: must be carry-chained (c' = c * k per scan step), NOT bench_ms —
    # there only a scalar reduction of the output is consumed and XLA
    # algebraically collapses sum(a*k) to k*sum(a), dropping the write.
    import time as _time

    def _stream_total(n, repeats=4):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (c * 1.0000001, None), c,
                                None, length=n)
            return jnp.sum(c[..., :1].astype(jnp.float32))
        float(run(xs))
        best = float("inf")
        for _ in range(repeats):
            t0 = _time.perf_counter()
            float(run(xs))
            best = min(best, _time.perf_counter() - t0)
        return best

    t_stream = max(_stream_total(args.iters)
                   - _stream_total(max(1, args.iters // 15)), 1e-9) \
        / (args.iters - max(1, args.iters // 15)) * 1e3
    row("elementwise stream 8192x4096 (HBM ceiling)", t_stream,
        2 * xs.size, 2 * nbytes, BF16_FLOPS)
    # byte models INCLUDE the harness's own consumption read (bench_ms
    # reduces the full output to a scalar — one extra stream the r2-r4
    # rows undercounted, making the kernels look like "half of light";
    # the r5 ablation (scripts/rowop_attribution.py) showed copy ==
    # no-transcendentals == full inside the kernel, i.e. the runtime is
    # pure stream time and the kernels sit at the measured ceiling)
    row("fused layernorm+residual 8192x4096",
        bench(layernorm_residual_pallas, xs, rs), 10 * xs.size, 4 * nbytes,
        BF16_FLOPS, note="2 reads + write + harness read")
    row("softmax 8192x4096", bench(softmax_pallas, xs),
        8 * xs.size, 3 * nbytes, BF16_FLOPS,
        note="read + write + harness read")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                quantized_matmul_prequant_pallas(x, wq.q, wq.c).block_until_ready()
        print(f"trace written to {args.trace}", file=sys.stderr)

    with open(args.out, "w") as f:
        f.write("# Speed-of-light report (TPU v5e, one chip)\n\n"
                "Generated by `python scripts/sol_report.py` — measured with "
                "the in-jit marginal-cost harness (`utils/profiling.bench_ms`)"
                " against the analytic roofline `max(flops/MXU, bytes/HBM)` "
                "(v5e: 394 int8 TOPS, 197 bf16 TFLOP/s, 819 GB/s HBM).\n\n"
                "| Kernel | measured | SOL | % of SOL | bound |\n"
                "|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['kernel']} | {r['measured_ms']} ms | "
                    f"{r['sol_ms']} ms | {r['pct_sol']}% | {r['bound']} |\n")
        f.write("\n`% of SOL` above 100 means the analytic byte/flop model "
                "is conservative for that kernel (e.g. epilogue fusion "
                "avoiding a modeled write).\n")
        f.write(_NOTES)
    print(json.dumps({"metric": "min_pct_sol_across_kernels",
                      "value": min(r["pct_sol"] for r in rows),
                      "unit": "%", "rows": rows}))


if __name__ == "__main__":
    main()
