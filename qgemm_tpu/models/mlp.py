"""N-layer perceptron — parity with src/modules/mlp.cuh.

Forward = Linear + ReLU chain (:64-83). The reference's backward recomputes
pre-activations with an extra forward pass (:89-112) to apply ReLU-backward;
under ``jax.grad`` the same recompute-vs-store tradeoff is expressed with
``jax.checkpoint`` (``remat=True``) — rematerialization is the TPU-idiomatic
form of that capability.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp

from qgemm_tpu.models.linear import Linear


@partial(jax.tree_util.register_dataclass,
         data_fields=("layers",), meta_fields=("remat",))
@dataclass
class MLP:
    layers: List[object]  # Linear | QuantizedLinear
    remat: bool = False

    @classmethod
    def init(cls, key, layer_dims: List[int], bias: bool = True,
             dtype=jnp.float32, remat: bool = False) -> "MLP":
        """layer_dims e.g. [784, 16, 10] (the MNIST oracle topology,
        mnist_mlp.ipynb cell 3)."""
        keys = jax.random.split(key, len(layer_dims) - 1)
        layers = [Linear.init(k, din, dout, bias=bias, dtype=dtype)
                  for k, din, dout in zip(keys, layer_dims[:-1], layer_dims[1:])]
        return cls(layers=layers, remat=remat)

    def quantize(self, **qkw) -> "MLP":
        return MLP(layers=[l.quantize(**qkw) for l in self.layers], remat=False)

    def __call__(self, x):
        def block(layer, h):
            return jnp.maximum(layer(h), 0)

        f = jax.checkpoint(block, static_argnums=()) if self.remat else block
        for layer in self.layers[:-1]:
            x = f(layer, x)
        return self.layers[-1](x)  # logits: no activation on the last layer
