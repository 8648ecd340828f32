#!/usr/bin/env python
"""MNIST MLP training + int8-quantized inference.

The workload of the reference's mnist_mlp.ipynb oracle (784-16-10 MLP, SGD
lr=0.01, batch 32, cross-entropy; golden accuracies 96.08% train / 92.9%
test at 50 epochs) driven by this framework: jitted train step with the
fused-VJP cross-entropy, then evaluation with every Linear routed through
the int8 quantized GEMM (BASELINE config 2).

Falls back to a deterministic synthetic dataset when ./data has no MNIST
(this environment has no network egress).

Usage: python examples/train_mnist.py [-s SEED] [--epochs N] [--data DIR]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--data", default="./data/MNIST/raw")
    ap.add_argument("--dims", type=int, nargs="+", default=[784, 16, 10])
    args = ap.parse_args()

    try:
        train = MNIST.load(args.data, "train")
        test = MNIST.load(args.data, "test")
        source = f"idx files from {args.data}"
    except (FileNotFoundError, ValueError):
        train = MNIST.synthetic(8192, seed=args.seed)
        test = MNIST.synthetic(2048, seed=args.seed + 1)
        source = "synthetic fallback (no MNIST on disk)"
    print(f"dataset: {source}: train {train.images.shape}, test {test.images.shape}",
          file=sys.stderr)

    model = MLP.init(jax.random.PRNGKey(args.seed), args.dims)

    @jax.jit
    def train_step(model, x, y):
        def loss_fn(m):
            return cross_entropy_loss(m(x), y)
        loss, grads = jax.value_and_grad(loss_fn)(model)
        return sgd_step(model, grads, args.lr), loss

    @jax.jit
    def accuracy(model, x, y):
        return jnp.mean(jnp.argmax(model(x), -1) == y)

    t0 = time.time()
    for epoch in range(args.epochs):
        losses = []
        for bx, by in train.batches(args.batch, seed=args.seed + epoch):
            model, loss = train_step(model, jnp.asarray(bx), jnp.asarray(by))
            losses.append(loss)
        tr_acc = accuracy(model, jnp.asarray(train.images), jnp.asarray(train.targets))
        te_acc = accuracy(model, jnp.asarray(test.images), jnp.asarray(test.targets))
        print(f"epoch {epoch}: loss {np.mean(jax.device_get(losses)):.4f} "
              f"train_acc {float(tr_acc):.4f} test_acc {float(te_acc):.4f}",
              file=sys.stderr)
    print(f"training wall-clock: {time.time() - t0:.1f}s", file=sys.stderr)

    # int8 inference: quantize every Linear offline, re-evaluate (config 2)
    qmodel = model.quantize()
    q_acc = float(accuracy(qmodel, jnp.asarray(test.images), jnp.asarray(test.targets)))
    f_acc = float(accuracy(model, jnp.asarray(test.images), jnp.asarray(test.targets)))
    print(f"fp32 test acc: {f_acc:.4f}  int8 test acc: {q_acc:.4f} "
          f"(delta {f_acc - q_acc:+.4f})")


if __name__ == "__main__":
    main()
