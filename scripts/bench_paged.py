#!/usr/bin/env python
"""Paged vs slot-contiguous serving: decode-step cost and cache HBM.

Two measurements on the real chip:
  1. decode attention kernel time — paged (scalar-prefetch over the page
     table) vs contiguous (dense [B, H, S, D] int8 cache) at the same
     occupancy: quantifies the indirection overhead;
  2. cache HBM for a mixed-length workload — the dense engine allocates
     slots x max_seq_len regardless of the requests; the paged engine
     reserves each request's own worst case. Reported from the actual
     array sizes.

Prints one JSON line.
"""

import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.utils.profiling import bench_ms


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    from qgemm_tpu.ops.kv_cache import quantize_kv
    from qgemm_tpu.ops.pallas.decode_attention import decode_attention
    from qgemm_tpu.ops.pallas.paged_attention import paged_decode_attention
    from qgemm_tpu.serving.paged_cache import (PAGE_SIZE, PageAllocator,
                                               PagedKVCache, init_paged_cache,
                                               paged_write_prompt)

    rng = np.random.default_rng(0)
    b, h, d = 8, 16, 128
    lengths = [2048, 700, 129, 40, 1024, 333, 2000, 512]   # mixed traffic
    s_max = 2048
    pps = s_max // PAGE_SIZE

    # --- paged cache filled to the workload ---------------------------------
    n_pages = 1 + b * pps
    cache = init_paged_cache(h, d, n_pages=n_pages, batch=b,
                             pages_per_slot=pps)
    alloc = PageAllocator(n_pages, b, pps)
    pt = np.zeros((b, pps), np.int32)
    for slot, ln in enumerate(lengths):
        for j, p in alloc.grow(slot, ln):
            pt[slot, j] = p
    cache = PagedKVCache(kq=cache.kq, kc=cache.kc, vq=cache.vq, vc=cache.vc,
                         page_table=jnp.asarray(pt), page_size=PAGE_SIZE)
    # one shared bucket bounds compile count on the tunnel
    bucket = s_max
    wp = jax.jit(paged_write_prompt)
    for slot, ln in enumerate(lengths):
        kp = jnp.asarray(rng.normal(size=(h, bucket, d)).astype(np.float32))
        cache = wp(cache, slot, kp, kp)
    jl = jnp.asarray(lengths, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, h, 1, d)).astype(np.float32))

    t_paged = bench_ms(lambda q: paged_decode_attention(q, cache, jl), q,
                       iters=600, base=40)

    # --- contiguous dense cache at the same occupancy -----------------------
    kd = jax.random.normal(jax.random.PRNGKey(1), (b, h, s_max, d))
    kq2, kc2 = quantize_kv(kd)
    vq2, vc2 = quantize_kv(kd)
    t_dense = bench_ms(
        lambda q: decode_attention(q, kq2, vq2, jl, kc=kc2, vc=vc2), q,
        iters=600, base=40)

    # --- memory accounting ---------------------------------------------------
    per_pos = h * (d + 4) * 2                      # int8 K+V + f32 scales
    dense_bytes = b * s_max * per_pos
    used_pages = sum(len(p) for p in alloc.slot_pages)
    paged_bytes = used_pages * PAGE_SIZE * per_pos
    out = {
        "metric": "paged_vs_dense_decode_attention",
        "value": round(t_paged / t_dense, 3),
        "unit": "x (indirection overhead, lower=better)",
        "paged_us": round(t_paged * 1e3, 1),
        "dense_us": round(t_dense * 1e3, 1),
        "workload_lengths": lengths,
        "cache_mb_dense": round(dense_bytes / 1e6, 1),
        "cache_mb_paged_resident": round(paged_bytes / 1e6, 1),
        "hbm_saving": round(dense_bytes / paged_bytes, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
