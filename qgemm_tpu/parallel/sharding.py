"""Sharding rules for the transformer pytree (GSPMD path).

Megatron-style tensor parallelism over the ``model`` axis:
  * QKV projections: column-sharded  [d, d]  -> P(None, "model")
    (head dim splits across devices — heads are data-parallel within attn)
  * output projection W_O: row-sharded [d, d] -> P("model", None)
    (GSPMD inserts the all-reduce after the partial matmul)
  * FFN up: column-sharded; FFN down: row-sharded (one all-reduce per block)
  * lm_head: column-sharded over vocab
  * embeddings / LayerNorm / biases: replicated
  * activations: batch-sharded over ``data``

``shard_model`` device_puts every leaf with its NamedSharding; under
``jax.jit`` XLA then inserts all-gather/reduce-scatter/all-reduce
collectives automatically. The explicit-collective shard_map path (for
Pallas kernels, which GSPMD cannot partition) lives in parallel/tp_ops.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-substring -> (spec for 2-D weight, spec override for 1-D bias)
_COL = P(None, "model")   # output-dim sharded
_ROW = P("model", None)   # input-dim sharded (needs all-reduce after)
_REP = P()

_RULES = (
    # (field substrings that must all appear in the path, 2d spec, 1d spec)
    (("wqkv_q",), _COL, P("model")),
    (("wqkv_k",), _COL, P("model")),
    (("wqkv_v",), _COL, P("model")),
    (("w_o",), _ROW, _REP),
    (("ffn", "up"), _COL, P("model")),
    (("ffn", "down"), _ROW, _REP),
    (("lm_head",), _COL, _REP),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "name", getattr(k, "idx", k))) for k in path)


def _spec_for_leaf(path, leaf):
    p = _path_str(path)
    if ("ffn" in p and ("w_up" in p or "w_down" in p)
            and getattr(leaf, "ndim", 0) == 3):
        # MoE expert-stacked tensors [E, ...] — specifically the
        # MoEFeedForward w_up/w_down leaves (float [E, d, f] or their
        # QuantizedExpertWeight q [E, in, out] / c [E, 1, out] scales):
        # shard the EXPERT dim over the model axis — expert parallelism
        # through GSPMD (the dispatch/FFN/combine einsums partition on E;
        # XLA inserts the psum-style combine). Matching the leaf NAME, not
        # just any 3-D tensor under an ffn path, keeps a future non-expert
        # 3-D tensor from being silently mis-sharded (r4 advisor finding).
        # The router [d, E] stays replicated (no rule matches it).
        return P("model", None, None)
    for substrings, spec2d, spec1d in _RULES:
        if all(s in p for s in substrings):
            if leaf.ndim >= 2:
                # QuantizedWeight.c has shape [1, n]: shard its n like the
                # weight's output dim when column-sharded, replicate when
                # row-sharded (scales follow the columns they describe).
                if leaf.shape[0] == 1 and spec2d == _ROW:
                    return _REP
                if leaf.shape[0] == 1 and spec2d == _COL:
                    return P(None, "model")
                return spec2d
            return spec1d
    return _REP


def model_sharding_spec(model):
    """PartitionSpec pytree matching the model's structure."""
    return jax.tree_util.tree_map_with_path(lambda p, l: _spec_for_leaf(p, l),
                                            model)


def _divisible(leaf, spec, mesh: Mesh) -> bool:
    for dim, names in enumerate(spec):
        if names is None:
            continue
        names = names if isinstance(names, tuple) else (names,)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        if leaf.shape[dim] % size:
            return False
    return True


def shard_model(model, mesh: Mesh):
    """device_put every parameter with its NamedSharding. Leaves whose dims
    don't divide the mesh axis (e.g. an odd vocab on the model axis) fall
    back to replication rather than erroring."""
    spec = model_sharding_spec(model)

    def put(leaf, s):
        if not _divisible(leaf, s, mesh):
            s = _REP
        return jax.device_put(leaf, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(put, model, spec)


def shard_quantized_model(model, mesh: Mesh, axis: str = "model"):
    """Tensor parallelism for the int8 serving path (BASELINE config 5).

    GSPMD cannot partition a ``pallas_call``, so sharding the float model
    alone would replicate (or fail to place) the fused int8 kernels. This
    instead (a) marks every QuantizedLinear for the explicit-collective
    shard_map kernels (``model.with_tp`` -> parallel/tp_ops.py, Megatron
    column/row pairing: one psum per attention block and one per FFN) and
    (b) device_puts the int8 shards + scales per the same rules GSPMD uses
    for the float model (the [1,n] per-column absmax follows its columns).
    """
    return shard_model(model.with_tp(mesh, axis), mesh)


def shard_kv_caches(caches, mesh: Mesh, axis: str = "model"):
    """Head-shard every KV-cache leaf [B, H, S, *] over the model axis —
    matches the column-sharded K/V projections (heads split across devices)
    so cache writes and decode attention stay local to each device. Leaves
    whose head count doesn't divide the axis replicate instead (same
    graceful degradation as shard_model)."""
    def put(leaf):
        spec = P(None, axis)
        if not _divisible(leaf, spec, mesh):
            spec = _REP
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, caches)


def shard_paged_caches(caches, mesh: Mesh, axis: str = "model"):
    """Head-shard every paged pool [P, H, page, *] over the model axis
    (page tables replicate — paging is identical on every device; each
    device's pool holds its own heads' pages)."""
    def put_one(cache):
        from dataclasses import replace
        def pool(leaf):
            spec = P(None, axis)
            if not _divisible(leaf, spec, mesh):
                spec = _REP
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        rep = lambda x: None if x is None else jax.device_put(
            x, NamedSharding(mesh, _REP))
        return replace(
            cache, kq=pool(cache.kq), kc=pool(cache.kc),
            vq=pool(cache.vq), vc=pool(cache.vc),
            page_table=rep(cache.page_table),
            step_slot=rep(cache.step_slot), step_page=rep(cache.step_page))
    return [put_one(c) for c in caches]


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard leading (batch) dim of every array in a pytree."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(axis, *([None] * (x.ndim - 1))))), batch)
