#!/usr/bin/env python
"""MNIST MLP oracle run — reference accuracy-parity evidence (C21).

Replicates the EXACT protocol of the reference's PyTorch oracle
(/root/reference/mnist_mlp.ipynb): 784-16-10 MLP with ReLU (cell 3),
CrossEntropyLoss + SGD lr=0.01 (cell 4), batch 32 UNSHUFFLED (cell 1),
50 epochs (cell 7), running train accuracy during the epoch (cell 6) and
test accuracy after (cells 8-9). Golden numbers on real MNIST: 96.08%
train / 92.9% test.

Runs the protocol twice on the SAME data:
  1. this framework (jax MLP + fused-VJP cross-entropy + SGD), plus an
     int8-quantized inference pass (BASELINE config 2);
  2. the reference oracle's own framework (PyTorch, CPU) — the identical
     TwoLayerMLP, so accuracy parity is checked cross-framework even when
     real MNIST is unavailable (this environment has no egress: the
     synthetic fallback is used and recorded as such).

Writes RESULTS_MNIST.md + prints one JSON line.

Usage: JAX_PLATFORMS=cpu python scripts/mnist_oracle.py [--epochs 50]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.data.mnist import MNIST
from qgemm_tpu.models.mlp import MLP
from qgemm_tpu.models.optim import sgd_step
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss


def sequential_batches(images, targets, batch):
    """Notebook protocol: DataLoader(shuffle=False) — same order every
    epoch (mnist_mlp.ipynb cell 1)."""
    for i in range(0, len(images) - batch + 1, batch):
        yield images[i:i + batch], targets[i:i + batch]


def train_jax(train, test, epochs, batch, lr, seed):
    model = MLP.init(jax.random.PRNGKey(seed), [784, 16, 10])

    @jax.jit
    def step(model, x, y):
        def loss_fn(m):
            logits = m(x)
            return cross_entropy_loss(logits, y), logits
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(model)
        correct = jnp.sum(jnp.argmax(logits, -1) == y)
        return sgd_step(model, grads, lr), loss, correct

    @jax.jit
    def accuracy(model, x, y):
        return jnp.mean(jnp.argmax(model(x), -1) == y)

    tr_acc = 0.0
    for epoch in range(epochs):
        n_correct, n_seen = 0, 0
        for bx, by in sequential_batches(train.images, train.targets, batch):
            model, loss, correct = step(model, jnp.asarray(bx), jnp.asarray(by))
            n_correct += int(correct)
            n_seen += len(bx)
        tr_acc = n_correct / n_seen   # running accuracy, notebook cell 6
    te_acc = float(accuracy(model, jnp.asarray(test.images),
                            jnp.asarray(test.targets)))
    q_acc = float(accuracy(model.quantize(), jnp.asarray(test.images),
                           jnp.asarray(test.targets)))
    return tr_acc, te_acc, q_acc


def train_torch(train, test, epochs, batch, lr, seed):
    """The oracle's own framework on the same data (mnist_mlp.ipynb
    cells 3-9, verbatim protocol)."""
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    model = nn.Sequential(nn.Linear(784, 16), nn.ReLU(), nn.Linear(16, 10))
    criterion = nn.CrossEntropyLoss()
    opt = torch.optim.SGD(model.parameters(), lr=lr)

    xs = torch.from_numpy(train.images)
    ys = torch.from_numpy(train.targets.astype(np.int64))
    tr_acc = 0.0
    for epoch in range(epochs):
        n_correct, n_seen = 0, 0
        model.train()
        for i in range(0, len(xs) - batch + 1, batch):
            x, y = xs[i:i + batch], ys[i:i + batch]
            out = model(x)
            loss = criterion(out, y)
            n_correct += int((out.argmax(1) == y).sum())
            n_seen += len(x)
            loss.backward()
            opt.step()
            opt.zero_grad()
        tr_acc = n_correct / n_seen
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(test.images))
        te_acc = float((out.argmax(1) ==
                        torch.from_numpy(test.targets.astype(np.int64)))
                       .float().mean())
    return tr_acc, te_acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1)      # notebook cell 0
    ap.add_argument("--data", default="./data/MNIST/raw")
    ap.add_argument("--out", default="RESULTS_MNIST.md")
    args = ap.parse_args()

    try:
        train = MNIST.load(args.data, "train")
        test = MNIST.load(args.data, "test")
        source = "real MNIST idx files"
    except (FileNotFoundError, ValueError):
        # noise=2.0 puts the 784-16-10 model in an MNIST-like 90-97%
        # accuracy band (swept in-repo), so the cross-framework parity
        # comparison is informative rather than saturated at 100%
        train = MNIST.synthetic(8192, seed=args.seed, noise=2.0)
        test = MNIST.synthetic(2048, seed=args.seed + 1, noise=2.0)
        source = "synthetic fallback (no egress; class-template data, noise=2.0)"
    print(f"dataset: {source}", file=sys.stderr)

    t0 = time.time()
    j_tr, j_te, j_q = train_jax(train, test, args.epochs, args.batch,
                                args.lr, args.seed)
    t_jax = time.time() - t0
    print(f"jax: train {j_tr:.4f} test {j_te:.4f} int8 {j_q:.4f} "
          f"({t_jax:.0f}s)", file=sys.stderr)

    t0 = time.time()
    p_tr, p_te = train_torch(train, test, args.epochs, args.batch,
                             args.lr, args.seed)
    t_torch = time.time() - t0
    print(f"torch: train {p_tr:.4f} test {p_te:.4f} ({t_torch:.0f}s)",
          file=sys.stderr)

    result = {
        "dataset": source,
        "protocol": f"784-16-10 MLP, SGD lr={args.lr}, batch {args.batch} "
                    f"unshuffled, {args.epochs} epochs (mnist_mlp.ipynb)",
        "qgemm_tpu": {"train_acc": round(j_tr, 4), "test_acc": round(j_te, 4),
                      "int8_test_acc": round(j_q, 4)},
        "pytorch_same_data": {"train_acc": round(p_tr, 4),
                              "test_acc": round(p_te, 4)},
        "reference_golden_real_mnist": {"train_acc": 0.9608, "test_acc": 0.929},
    }
    print(json.dumps(result))

    with open(args.out, "w") as f:
        f.write(f"""# MNIST MLP oracle run (reference C21 parity evidence)

Protocol: **{result['protocol']}** — the exact recipe of the reference's
PyTorch oracle (`/root/reference/mnist_mlp.ipynb` cells 1-9; golden
accuracies on real MNIST: 96.08% train / 92.9% test @ 50 epochs).

Dataset: **{source}**. This environment has no network egress, so when real
idx files are absent the run uses the deterministic synthetic set
(`qgemm_tpu.data.mnist.MNIST.synthetic`: 10 fixed class templates + noise,
8192 train / 2048 test). The cross-framework check below is therefore the
parity evidence: the same protocol, on the same bytes, in the oracle's own
framework (PyTorch CPU) must land within ~1 point of this framework.

| Run | train acc (running, final epoch) | test acc |
|---|---|---|
| qgemm_tpu (jax, fp32) | {j_tr:.4f} | {j_te:.4f} |
| qgemm_tpu (int8 inference) | — | {j_q:.4f} |
| PyTorch, same data/protocol | {p_tr:.4f} | {p_te:.4f} |
| reference golden (REAL MNIST) | 0.9608 | 0.9290 |

int8 delta vs fp32: {j_q - j_te:+.4f}. Drop this file's protocol onto real
idx files (`--data ./data/MNIST/raw`) to reproduce the golden numbers
directly; `tests/test_mnist_data.py::test_training_on_idx_fixture` proves
the full idx-loading path on checked-in real-format bytes.

Regenerate: `JAX_PLATFORMS=cpu python scripts/mnist_oracle.py`
""")


if __name__ == "__main__":
    main()
