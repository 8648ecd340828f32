#!/usr/bin/env python
"""End-to-end causal-LM training demo: tiny GPT + Adam + the framework's
training kernels.

The reference only trains an MLP (train_mlp.cu per its notebook); this
drives the full transformer TRAINING path the framework provides beyond
it: flash attention forward AND blockwise backward (S >= 128 engages the
Pallas kernels on TPU), the fused custom-VJP cross-entropy
(ops/cross_entropy.py — the reference C9 capability at transformer
scale), pytree Adam (models/optim.py), and checkpointing.

Task: the classic induction/copy task — each sequence is a random first
half repeated verbatim as the second half. Predicting the second half is
exact in-context copying (the "induction head" circuit a 2-layer
transformer learns quickly); the first half is irreducible noise.
Held-out accuracy is next-token top-1 over the copied half.

``train_model`` is importable: scripts/bench_trained_speculative.py and
scripts/quant_quality_eval.py train their target/draft through it, so
every trained-model evidence artifact shares one training path.

Usage: python examples/train_gpt_lm.py [--steps 200] [--seq-len 128]
"""

import argparse
import sys

import os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.models.optim import Adam
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss


def batch_iter(key, batch, seq_len, vocab):
    """[B, S+1] sequences: random half, repeated (S+1 odd keeps one extra
    copied token as the final target)."""
    half = (seq_len + 1) // 2
    while True:
        key, k1 = jax.random.split(key)
        first = jax.random.randint(k1, (batch, half), 0, vocab)
        yield jnp.concatenate([first, first], axis=1)[:, :seq_len + 1]


def heldout_eval(model, seq_len, vocab, n=64, seed=7):
    """(loss over all positions, top-1 accuracy over the copied half) on a
    fresh PRNG stream."""
    test = next(batch_iter(jax.random.PRNGKey(seed), n, seq_len, vocab))
    logits = jax.jit(lambda m, s: m.forward(s[:, :-1]))(model, test)
    loss = float(cross_entropy_loss(
        jnp.asarray(logits, jnp.float32).reshape(-1, vocab),
        test[:, 1:].reshape(-1)))
    half = (seq_len + 1) // 2
    pred = jnp.argmax(logits[:, half - 1:], axis=-1)
    acc = float(jnp.mean(pred == test[:, half:]))
    return loss, acc


def train_model(steps=200, batch=16, seq_len=128, vocab=64, lr=3e-3,
                d_model=128, n_heads=4, d_ff=512, n_layers=2,
                max_seq_len=None, seed=0, data_seed=1, log=None):
    """Train a GPT on the induction task; returns (model, stats dict)."""
    cfg = GPTConfig(vocab_size=vocab, d_model=d_model, n_heads=n_heads,
                    d_ff=d_ff, n_layers=n_layers,
                    max_seq_len=max_seq_len or seq_len + 1)
    model = GPT.init(cfg, key=jax.random.PRNGKey(seed))
    opt = Adam(lr=lr)
    state = opt.init(model)

    def loss_fn(m, seqs):
        logits = m.forward(seqs[:, :-1])            # [B, S, V]
        return cross_entropy_loss(logits.reshape(-1, vocab),
                                  seqs[:, 1:].reshape(-1))

    @jax.jit
    def train_step(m, st, seqs):
        loss, grads = jax.value_and_grad(loss_fn)(m, seqs)
        m, st = opt.step(m, grads, st)
        return m, st, loss

    it = batch_iter(jax.random.PRNGKey(data_seed), batch, seq_len, vocab)
    first = None
    for i in range(steps):
        model, state, loss = train_step(model, state, next(it))
        if i == 0:
            first = float(loss)
        if log and i % max(1, steps // 10) == 0:
            log(f"step {i:4d}  loss {float(loss):.4f}")
    last = float(loss)
    hl, acc = heldout_eval(model, seq_len, vocab)
    return model, {"loss_first": first, "loss_last": last,
                   "heldout_loss": hl, "heldout_acc": acc}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--d-ff", type=int, default=512)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--ckpt", default="", help="save the trained model here")
    args = ap.parse_args()

    model, st = train_model(
        steps=args.steps, batch=args.batch, seq_len=args.seq_len,
        vocab=args.vocab, lr=args.lr, d_model=args.d_model,
        n_heads=args.heads, d_ff=args.d_ff, n_layers=args.layers,
        log=lambda m: print(m, file=sys.stderr))
    print(f"loss {st['loss_first']:.3f} -> {st['loss_last']:.3f}; held-out "
          f"next-token acc {st['heldout_acc']:.3f}", file=sys.stderr)

    if args.ckpt:
        from qgemm_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(args.ckpt, model)
        print(f"saved {args.ckpt}", file=sys.stderr)

    import json
    print(json.dumps({"metric": "gpt_lm_heldout_acc",
                      "value": round(st["heldout_acc"], 4),
                      "loss_first": round(st["loss_first"], 4),
                      "loss_last": round(st["loss_last"], 4)}))


if __name__ == "__main__":
    main()
