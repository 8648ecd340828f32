#!/usr/bin/env python
"""Trained-model quantization quality table (r3 verdict #4: random-weight
relative error says nothing about what quantization does to a model that
actually computes something — the LLM.int8() claim the whole scheme
serves, reference README.md:26, is about preserved MODEL quality).

Trains one GPT on the induction task (examples/train_gpt_lm.train_model),
then evaluates the SAME checkpoint at every serving precision the
framework offers — f32, bf16 weights, int8 (absmax vector-wise), int8 +
outlier decomposition, W4A8 (int4 group-128 weights), W4A8 + outliers —
on held-out loss and copy-half next-token accuracy.

Usage: python scripts/quant_quality_eval.py [--steps 300] [--layers 16]
"""

import argparse
import json
import sys

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def to_bf16(model):
    return jax.tree_util.tree_map(
        lambda l: l.astype(jnp.bfloat16)
        if hasattr(l, "dtype") and l.dtype == jnp.float32 else l, model)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=64)
    ap.add_argument("--d-model", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d-ff", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ckpt", default="/tmp/qgemm_spec_ckpt/target_6l_d512.npz",
                    help="load this trained checkpoint instead of training "
                         "(must match the model args); '' forces training")
    args = ap.parse_args()

    from examples.train_gpt_lm import heldout_eval, train_model

    if args.ckpt and _os.path.exists(args.ckpt):
        from qgemm_tpu.models.gpt import GPT, GPTConfig
        from qgemm_tpu.utils.checkpoint import load_checkpoint
        log(f"loading trained target from {args.ckpt}")
        cfg = GPTConfig(vocab_size=args.vocab, d_model=args.d_model,
                        n_heads=args.heads, d_ff=args.d_ff,
                        n_layers=args.layers,
                        max_seq_len=args.seq_len + 72)
        model = load_checkpoint(args.ckpt,
                                GPT.init(cfg, key=jax.random.PRNGKey(0)))
        hl, acc = heldout_eval(model, args.seq_len, args.vocab)
        st = {"heldout_loss": hl, "heldout_acc": acc,
              "loss_first": -1.0, "loss_last": -1.0}
    else:
        log(f"training target ({args.layers}L d{args.d_model})...")
        model, st = train_model(
            steps=args.steps, batch=16, seq_len=args.seq_len,
            vocab=args.vocab, d_model=args.d_model, n_heads=args.heads,
            d_ff=args.d_ff, n_layers=args.layers, lr=args.lr, seed=0,
            log=log)
    log(f"trained: held-out loss {st['heldout_loss']:.4f} "
        f"acc {st['heldout_acc']:.4f}")

    variants = [
        ("f32", lambda m: m),
        ("bf16", to_bf16),
        ("int8", lambda m: m.quantize()),
        ("int8+outliers", lambda m: m.quantize(outlier_threshold=6.0)),
        ("w4a8", lambda m: m.quantize(bits=4)),
        ("w4a8+outliers", lambda m: m.quantize(bits=4,
                                               outlier_threshold=6.0)),
    ]
    # mean KL(f32 || variant) over held-out positions: far more
    # discriminative than loss/accuracy once the model saturates the task
    # (every variant can be at acc 1.0 while their distributions drift)
    from examples.train_gpt_lm import batch_iter
    test = next(batch_iter(jax.random.PRNGKey(7), 64, args.seq_len,
                           args.vocab))
    fwd = jax.jit(lambda m, s: m.forward(s[:, :-1]))
    ref_lp = jax.nn.log_softmax(
        jnp.asarray(fwd(model, test), jnp.float32), axis=-1)

    rows = []
    for name, fn in variants:
        v = fn(model)
        loss, acc = heldout_eval(v, args.seq_len, args.vocab)
        lp = jax.nn.log_softmax(jnp.asarray(fwd(v, test), jnp.float32),
                                axis=-1)
        kl = float(jnp.mean(jnp.sum(jnp.exp(ref_lp) * (ref_lp - lp),
                                    axis=-1)))
        log(f"{name:>14}: held-out loss {loss:.4f}  copy acc {acc:.4f}  "
            f"KL(f32||v) {kl:.3e}")
        rows.append({"variant": name, "heldout_loss": round(loss, 4),
                     "copy_acc": round(acc, 4),
                     "kl_vs_f32": round(kl, 8)})

    # ---- KV-cache tier table (r4 verdict item 8): the weight table above
    # runs cache-free teacher forcing; KV quantization only bites at
    # DECODE. Teacher-force the same held-out batch through decode_step
    # (writing each tier's cache as it goes) and KL against the f32
    # forward — pins what int8-KV and paged int4-KV cost on a trained
    # checkpoint.
    # serving-realistic batch for the decode kernels (the dense int8-KV
    # Pallas kernel rejects a 64-wide batch reshape under Mosaic; engines
    # run 8-16 slots)
    kv_test = test[:16]
    kv_ref_lp = ref_lp[:16]

    def decode_kl(m, tier):
        test, ref_lp = kv_test, kv_ref_lp
        b, s = test.shape
        n_steps = s - 1
        if tier in ("dense_f32", "dense_int8"):
            caches = m.init_cache(b, s, quantized=(tier == "dense_int8"))
        else:
            from dataclasses import replace
            from qgemm_tpu.serving.paged_cache import (PageAllocator,
                                                       build_step_tables,
                                                       init_paged_cache)
            import numpy as np
            bits = 4 if tier == "paged_int4" else 8
            cfg_ = m.cfg
            ps_ = 128
            pps_ = -(-s // ps_)
            npg_ = 1 + b * pps_
            dh_ = cfg_.d_model // cfg_.n_heads
            hkv_ = getattr(cfg_, "n_kv_heads", 0) or cfg_.n_heads
            alloc_ = PageAllocator(npg_, b, pps_)
            pt_ = np.zeros((b, pps_), np.int32)
            for sl in range(b):
                for j, pg in alloc_.grow(sl, s, ps_):
                    pt_[sl, j] = pg
            ss_, sp_ = build_step_tables(
                [len(p) for p in alloc_.slot_pages], pps_)
            caches = [replace(init_paged_cache(hkv_, dh_, npg_, b, pps_,
                                               kv_bits=bits),
                              page_table=jnp.asarray(pt_),
                              step_slot=jnp.asarray(ss_),
                              step_page=jnp.asarray(sp_))
                      for _ in m.blocks]

        @jax.jit
        def run(m, caches):
            def stp(carry, t):
                caches = carry
                tok = jax.lax.dynamic_slice_in_dim(test, t, 1, axis=1)
                lg, caches = m.decode_step(
                    tok, jnp.full((b,), t, jnp.int32), caches)
                return caches, lg
            _, lgs = jax.lax.scan(stp, caches, jnp.arange(n_steps))
            return lgs.transpose(1, 0, 2)          # [B, n_steps, V]
        lp = jax.nn.log_softmax(jnp.asarray(run(m, caches), jnp.float32),
                                axis=-1)
        return float(jnp.mean(jnp.sum(
            jnp.exp(ref_lp) * (ref_lp - lp), axis=-1)))

    q8 = model.quantize()
    kv_rows = []
    for tier in ("dense_f32", "dense_int8", "paged_int8", "paged_int4"):
        kl = decode_kl(q8, tier)
        log(f"int8 weights + {tier:>10} cache: KL(f32||v) {kl:.3e}")
        kv_rows.append({"kv_tier": tier, "kl_vs_f32": round(kl, 8)})

    f32 = rows[0]
    print(json.dumps({
        "metric": "int8_copy_acc_delta_vs_f32",
        "value": round(rows[2]["copy_acc"] - f32["copy_acc"], 4),
        "unit": "accuracy", "rows": rows, "kv_rows": kv_rows,
        "train": {k: round(v, 4) for k, v in st.items()},
    }))


if __name__ == "__main__":
    main()
