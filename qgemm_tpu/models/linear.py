"""Linear layer — parity with src/modules/linear.cuh.

y = x W + b (forward :49-56). The reference hand-writes the backward
(dW = x^T dy, db = colsum(dy), dx = dy W^T, :63-72); here the module is a
registered pytree and ``jax.grad`` derives exactly those VJPs from the
forward. Init is Kaiming-uniform ±1/sqrt(in_dim) (:33-39).

``QuantizedLinear`` is the serving artifact: weights quantized offline to
int8 with per-column absmax scales; the forward routes through the fused
Pallas quantized matmul. ``Linear.quantize()`` converts.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from qgemm_tpu.ops.quantize import (
    QuantizedWeight,
    QuantizedWeight4,
    quantize_weights,
    quantize_weights_int4,
    quantized_matmul_prequant,
    quantized_matmul_prequant_outlier,
    quantized_matmul_prequant_w4,
)
from qgemm_tpu.utils.prng import uniform_init


@partial(jax.tree_util.register_dataclass, data_fields=("w", "b"), meta_fields=())
@dataclass
class Linear:
    w: jax.Array                 # [in_dim, out_dim]
    b: Optional[jax.Array]       # [out_dim] or None

    @classmethod
    def init(cls, key, in_dim: int, out_dim: int, bias: bool = True,
             dtype=jnp.float32) -> "Linear":
        bound = 1.0 / (in_dim ** 0.5)
        kw, kb = jax.random.split(key)
        w = uniform_init(kw, (in_dim, out_dim), bound, dtype)
        b = uniform_init(kb, (out_dim,), bound, dtype) if bias else None
        return cls(w=w, b=b)

    def __call__(self, x):
        y = jnp.dot(x, self.w, preferred_element_type=jnp.float32).astype(x.dtype)
        if self.b is not None:
            y = y + self.b
        return y

    def quantize(self, outlier_threshold: float = 0.0,
                 outlier_capacity: int = 32, bits: int = 8) -> "QuantizedLinear":
        """outlier_threshold > 0 enables LLM.int8() mixed-precision
        decomposition at inference (outlier activation dims in bf16).
        ``bits=4``: W4A8 — int4 group-quantized weights through the fused
        w4a8 kernel (halves weight HBM again; group-128 scales). Composes
        with the outlier path: outlier weight ROWS dequantize on the fly
        from the packed nibbles (ops/quantize._take_rows_w4)."""
        if bits == 4:
            return QuantizedLinear(wq=quantize_weights_int4(self.w), b=self.b,
                                   out_features=self.w.shape[1],
                                   in_features=self.w.shape[0],
                                   outlier_threshold=outlier_threshold,
                                   outlier_capacity=outlier_capacity)
        return QuantizedLinear(wq=quantize_weights(self.w), b=self.b,
                               out_features=self.w.shape[1],
                               in_features=self.w.shape[0],
                               outlier_threshold=outlier_threshold,
                               outlier_capacity=outlier_capacity)


@partial(jax.tree_util.register_dataclass,
         data_fields=("wq", "b"),
         meta_fields=("out_features", "outlier_threshold", "outlier_capacity",
                      "tp_mode", "tp_axis", "gather_output", "mesh",
                      "in_features"))
@dataclass
class QuantizedLinear:
    """``tp_mode`` routes the fused int8 Pallas kernel multi-chip: GSPMD
    cannot partition a ``pallas_call``, so under a mesh the matmul runs
    inside ``shard_map`` with explicit collectives (parallel/tp_ops.py):

      * ``"column"``: wq sharded on N (Megatron QKV / FFN-up); with
        ``gather_output=False`` the output stays N-sharded to feed the
        paired row layer with zero traffic;
      * ``"row"``: wq sharded on K, activation consumed K-sharded, ONE
        psum after the partial int8 products (Megatron W_O / FFN-down).

    Marks are applied by ``parallel.sharding.shard_quantized_model`` (which
    also device_puts the shards); ``tp_mode="none"`` is the single-chip
    path. Mesh/axis live in meta so the module stays one jit-stable pytree.
    """
    wq: QuantizedWeight
    b: Optional[jax.Array]
    out_features: int
    outlier_threshold: float = 0.0
    outlier_capacity: int = 32
    tp_mode: str = "none"          # "none" | "column" | "row"
    tp_axis: str = "model"
    gather_output: bool = True     # column mode: all-gather the output?
    mesh: object = None            # jax.sharding.Mesh when tp_mode != "none"
    in_features: int = 0           # true K (0 = unknown, legacy pickles)

    def with_tp(self, mode: str, mesh, axis: str = "model",
                gather_output: bool = True) -> "QuantizedLinear":
        from dataclasses import replace
        p = mesh.shape[axis]
        if isinstance(self.wq, QuantizedWeight4):
            # W4A8 TP: column shards N; row shards whole scale GROUPS (the
            # pack layout is group-major, so a groups-even K split is a
            # clean row split of both the packed values and the scales).
            # Row mode additionally requires K unpadded (true K == packed
            # extent) so activation shards line up with weight shards.
            n = self.wq.qp.shape[1]
            kg = self.wq.c.shape[0]
            if mode == "column":
                ok = n % p == 0
            else:
                # row mode also requires the TRUE K unpadded (equal to the
                # packed extent) — a padded layer would trip the shard_map
                # body's trace-time assert instead of falling back to the
                # single-kernel path like the int8 branch does (r3 advisor)
                ok = (kg % p == 0
                      and self.in_features == 2 * self.wq.qp.shape[0])
            if not ok:
                return self
            return replace(self, tp_mode=mode, tp_axis=axis,
                           gather_output=gather_output, mesh=mesh)
        k, n = self.wq.q.shape
        if (mode == "column" and n % p) or (mode == "row" and k % p):
            # indivisible shard dim (e.g. odd vocab): stay single-kernel —
            # every device runs the full matmul on the replicated weight
            # (GSPMD reshards the activation around it), still correct
            return self
        return replace(self, tp_mode=mode, tp_axis=axis,
                       gather_output=gather_output, mesh=mesh)

    def _matmul(self, x2):
        if isinstance(self.wq, QuantizedWeight4):
            if self.tp_mode == "column":
                from qgemm_tpu.parallel.tp_ops import tp_w4a8_matmul_column
                return tp_w4a8_matmul_column(
                    x2, self.wq.qp, self.wq.c, self.mesh, self.tp_axis,
                    gather_output=self.gather_output)
            if self.tp_mode == "row":
                from qgemm_tpu.parallel.tp_ops import tp_w4a8_matmul_row
                return tp_w4a8_matmul_row(x2, self.wq.qp, self.wq.c,
                                          self.mesh, self.tp_axis)
            return quantized_matmul_prequant_w4(x2, self.wq)
        if self.tp_mode == "column":
            from qgemm_tpu.parallel.tp_ops import tp_quantized_matmul_column
            return tp_quantized_matmul_column(
                x2, self.wq.q, self.wq.c, self.mesh, self.tp_axis,
                gather_output=self.gather_output)
        if self.tp_mode == "row":
            from qgemm_tpu.parallel.tp_ops import tp_quantized_matmul_row
            return tp_quantized_matmul_row(x2, self.wq.q, self.wq.c,
                                           self.mesh, self.tp_axis)
        return quantized_matmul_prequant(x2, self.wq)

    def __call__(self, x):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if self.outlier_threshold > 0:
            y = quantized_matmul_prequant_outlier(
                x2, self.wq, threshold=self.outlier_threshold,
                capacity=self.outlier_capacity,
                matmul_fn=lambda x_in, wq: self._matmul(x_in)).astype(x.dtype)
        else:
            y = self._matmul(x2).astype(x.dtype)
        y = y.reshape(*orig_shape[:-1], self.out_features)
        if self.b is not None:
            y = y + self.b
        return y
