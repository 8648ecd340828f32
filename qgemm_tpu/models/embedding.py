"""Token embedding + sinusoidal positional encoding.

The reference transformer demo has neither (src/transformer.cu:182 "TODO::")
— it feeds random [seq, d_model] activations. The north-star requires a real
inference path, so these are first-class here.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(max_len: int, d_model: int, dtype=jnp.float32):
    """Classic fixed sin/cos table [max_len, d_model]."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    dim = np.arange(0, d_model, 2).astype(np.float64)
    inv_freq = 1.0 / (10000.0 ** (dim / d_model))
    angles = pos * inv_freq[None, :]
    table = np.zeros((max_len, d_model))
    table[:, 0::2] = np.sin(angles)
    table[:, 1::2] = np.cos(angles[:, : d_model // 2])
    return jnp.asarray(table, dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=("table", "pos"), meta_fields=())
@dataclass
class Embedding:
    table: jax.Array  # [vocab, d_model]
    pos: jax.Array    # [max_len, d_model] sinusoidal, non-trainable by convention

    @classmethod
    def init(cls, key, vocab_size: int, d_model: int, max_len: int,
             dtype=jnp.float32) -> "Embedding":
        scale = 1.0 / (d_model ** 0.5)
        table = jax.random.normal(key, (vocab_size, d_model), dtype) * scale
        return cls(table=table, pos=sinusoidal_positions(max_len, d_model, dtype))

    def __call__(self, tokens, offset: int | jax.Array = 0):
        """tokens [B, S] int -> [B, S, D] with positions offset..offset+S.

        Out-of-vocab tokens CLAMP (mode="clip"): jnp.take's default fill
        mode yields NaN embeddings that poison the whole forward, and its
        lowering differs between the single-device and shard_map paths —
        clamping is deterministic and identical everywhere."""
        emb = jnp.take(self.table, tokens, axis=0, mode="clip")
        s = tokens.shape[-1]
        tab = self.pos
        if s > tab.shape[0]:
            # a page-aligned prefill bucket may exceed the positional
            # table (e.g. a 128-wide paged bucket on a max_seq_len=64
            # model); the rows past the table are prompt PADDING — junk
            # K/V that attention masks by true length — so zero-extend
            # rather than erroring on the slice size
            tab = jnp.pad(tab, ((0, s), (0, 0)))
        pos = jax.lax.dynamic_slice_in_dim(tab, offset, s, axis=0)
        return emb + pos
