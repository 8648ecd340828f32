"""SGD optimizer — parity with src/modules/sgd.cuh (:10-14: t -= lr*dt over
the parameter list). A parameter list on TPU is any pytree; the update is
one fused tree_map."""

from __future__ import annotations

from dataclasses import dataclass

import jax


def sgd_step(params, grads, lr: float):
    """params - lr * grads, over arbitrary pytrees (None-safe for frozen
    leaves such as absent biases)."""
    return jax.tree_util.tree_map(
        lambda p, g: p if g is None else p - lr * g, params, grads,
        is_leaf=lambda x: x is None)


@dataclass
class SGD:
    lr: float = 0.01

    def step(self, params, grads):
        return sgd_step(params, grads, self.lr)
