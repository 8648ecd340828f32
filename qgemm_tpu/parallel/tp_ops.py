"""Explicit-collective tensor-parallel quantized matmul (shard_map path).

GSPMD cannot partition a ``pallas_call``, so when the fused int8 kernels run
multi-chip they run *inside* ``shard_map``: every device executes the local
kernel on its weight shard and the collective is explicit. Two classic
layouts (Megatron):

  * ``column``: W int8 is sharded on N (output) — each device computes the
    full M x K activation against its K x (N/p) shard; outputs are either
    kept sharded (feeding a row-sharded layer) or all-gathered.
  * ``row``: W is sharded on K (input) and the activation on its last dim —
    each device computes a partial M x N product from its K/p slice and the
    results are ``psum`` -reduced over the model axis.

Row-parallel subtlety for int8: the per-row activation absmax must be the
GLOBAL row max or each shard would quantize on a different grid. We take a
``jax.lax.pmax`` over the model axis before quantizing — one tiny [M,1]
collective overlapping the weight-shard DMA, not a re-read of X.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map_raw
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map as _shard_map_raw


def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
    try:  # new API: replication checking is `check_vma`
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
    except TypeError:
        return _shard_map_raw(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=check_rep)
from jax.sharding import Mesh, PartitionSpec as P

from qgemm_tpu.ops.pallas.quantized_matmul import _pick_tiles, _qmm_call, _round_up
from qgemm_tpu.ops.quantize import _EPS


def _local_qmm(x, wq, cx, cw, rounding="nearest"):
    """Local fused kernel with padding (mirror of the single-chip wrapper)."""
    m, k = x.shape
    n = wq.shape[1]
    bm, bn, bk = _pick_tiles(m, n, k)
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    if (mp, kp) != (m, k):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
        cx = jnp.pad(cx, ((0, mp - m), (0, 0)), constant_values=1.0)
    if (kp, np_) != (k, n):
        wq = jnp.pad(wq, ((0, kp - k), (0, np_ - n)))
        cw = jnp.pad(cw, ((0, 0), (0, np_ - n)), constant_values=1.0)
    out = _qmm_call(x, wq, cx, cw, rounding=rounding, bm=bm, bn=bn, bk=bk)
    return out[:m, :n]


def tp_quantized_matmul_column(x, wq, cw, mesh: Mesh, axis: str = "model",
                               gather_output: bool = True):
    """x [M, K] replicated; wq [K, N] int8 + cw [1, N] sharded on N.

    Returns [M, N] (all-gathered) or [M, N/p]-sharded when
    ``gather_output=False`` (to feed a row-parallel layer without traffic).
    """
    def body(x, wq, cw):
        cx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                                 keepdims=True), _EPS)
        return _local_qmm(x, wq, cx, cw)

    out_spec = P(None, axis)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(None, axis), P(None, axis)),
                  out_specs=out_spec, check_rep=False)
    out = f(x, wq, cw)
    if gather_output:
        gather = shard_map(
            functools.partial(jax.lax.all_gather, axis_name=axis, axis=1,
                              tiled=True),
            mesh=mesh, in_specs=P(None, axis), out_specs=P(), check_rep=False)
        out = gather(out)
    return out


def tp_w4a8_matmul_column(x, qp, c, mesh: Mesh, axis: str = "model",
                          gather_output: bool = True):
    """W4A8 column parallelism: packed int4 weights + group scales sharded
    on N; every device runs the fused w4a8 kernel on its shard."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import w4a8_matmul_pallas

    def body(x, qp, c):
        return w4a8_matmul_pallas(x, qp, c)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(None, axis), P(None, axis)),
                  out_specs=P(None, axis), check_rep=False)
    out = f(x, qp, c)
    if gather_output:
        gather = shard_map(
            functools.partial(jax.lax.all_gather, axis_name=axis, axis=1,
                              tiled=True),
            mesh=mesh, in_specs=P(None, axis), out_specs=P(), check_rep=False)
        out = gather(out)
    return out


def tp_w4a8_matmul_row(x, qp, c, mesh: Mesh, axis: str = "model"):
    """W4A8 row parallelism: x sharded on K, packed rows + group scales
    sharded on K (group-aligned — the pack layout is group-major so a
    groups-even split is a clean row split), ONE psum of the partials.

    Unlike the int8 row path there is no global-activation-grid pmax: the
    w4a8 kernel quantizes each K slab on its own per-slab grid and
    dequantizes with the same grid, so per-device partials are exact
    contributions regardless of how K is split."""
    from qgemm_tpu.ops.pallas.w4a8_matmul import w4a8_matmul_pallas

    def body(x, qp, c):
        assert x.shape[-1] == 2 * qp.shape[0], (
            f"w4a8 row-TP needs the true K ({x.shape[-1]}) to equal the "
            f"packed extent ({2 * qp.shape[0]}) — pad K to a multiple of "
            "group*p before sharding")
        return jax.lax.psum(w4a8_matmul_pallas(x, qp, c), axis)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, axis), P(axis, None), P(axis, None)),
                  out_specs=P(), check_rep=False)
    return f(x, qp, c)


def tp_quantized_matmul_row(x, wq, cw, mesh: Mesh, axis: str = "model"):
    """x [M, K] sharded on K (i.e. the column-parallel predecessor's output);
    wq [K, N] int8 sharded on K; cw [1, N] replicated (column absmax is a
    global statistic, computed at quantization time over full K).

    Each device quantizes its K/p activation slice on the GLOBAL row grid
    (pmax of the local absmax) and psum-reduces the int32-accumulated
    partial products. Returns [M, N] replicated.
    """
    def body(x, wq, cw):
        local_max = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
        cx = jnp.maximum(jax.lax.pmax(local_max, axis), _EPS)
        partial = _local_qmm(x, wq, cx, cw)
        return jax.lax.psum(partial, axis)

    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, axis), P(axis, None), P()),
                  out_specs=P(), check_rep=False)
    return f(x, wq, cw)
