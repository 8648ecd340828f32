"""Checkpoint / resume.

Greenfield aux subsystem (SURVEY.md §5: the reference has NO serialization —
weights are random per run, src/transformer.cu:34-35). Pytree-path-keyed
``.npz`` checkpoints: framework-agnostic, human-inspectable, works for fp32
training state and int8 serving artifacts alike (quantized weights + scales
round-trip bit-exactly).

Two flavors:
  * ``save_checkpoint``/``load_checkpoint`` — single-file, host-gathered;
    right for single-chip models and small training state.
  * ``save_checkpoint_sharded``/``load_checkpoint_sharded`` — per-shard:
    every process writes ONLY its addressable shards (one npz per process,
    no host gather, no replicated-copy duplication), and restore rebuilds
    each leaf with ``jax.make_array_from_callback`` against the TEMPLATE's
    sharding — a tensor-sharded 6.7B model round-trips without any chip
    ever holding a full copy. Same-topology reload is zero-copy per shard;
    a topology change re-slices through the per-shard index.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "key"):
            parts.append(str(k.key))
        else:
            parts.append(str(k))
    return "/".join(parts)


# npz can only round-trip native numpy dtypes; extension dtypes (bfloat16,
# float8_*) come back as raw void — store their bits + a dtype tag instead
_DTYPE_TAG = ".__dtype__"


def save_checkpoint(path: str, tree) -> None:
    """Serialize every array leaf of ``tree`` into one .npz keyed by its
    pytree path. Atomic (tmp + rename)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in flat:
        key = _path_key(p)
        assert key not in arrays, f"duplicate path {key}"
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "V":  # extension dtype (e.g. bfloat16)
            arrays[key + _DTYPE_TAG] = np.array(str(arr.dtype))
            arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
        arrays[key] = arr
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _shard_key(path_key: str, index, shape) -> str:
    """Key one shard by its full global index (start:stop per dim), e.g.
    'blocks/0/w@0:512,0:128'. Starts alone are ambiguous: a replicated
    template and a 2-way-sharded checkpoint both have a shard starting at 0,
    and resolving across them would fail with an opaque shape error instead
    of the intended topology-mismatch KeyError."""
    spans = ",".join(
        f"{s.start or 0}:{s.stop if s.stop is not None else dim}"
        for s, dim in zip(index, shape))
    return f"{path_key}@{spans}"


def save_checkpoint_sharded(dirpath: str, tree) -> None:
    """Per-shard save: this process writes its addressable shards only (one
    replica per distinct global index — replicated leaves are written once,
    sharded leaves once per shard) to ``dirpath/proc{i}.npz``. No host
    gather: peak host memory is one shard."""
    os.makedirs(dirpath, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {}
    for p, leaf in flat:
        key = _path_key(p)
        if not hasattr(leaf, "addressable_shards"):
            leaf = jax.numpy.asarray(leaf)
        for sh in leaf.addressable_shards:
            skey = _shard_key(key, sh.index, leaf.shape)
            if skey in arrays:
                continue  # replicated copy
            arr = np.asarray(sh.data)
            if arr.dtype.kind == "V":
                arrays[skey + _DTYPE_TAG] = np.array(str(arr.dtype))
                arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
            arrays[skey] = arr
    path = os.path.join(dirpath, f"proc{jax.process_index()}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_checkpoint_sharded(dirpath: str, template):
    """Restore into ``template``'s shardings (e.g. the output of
    ``shard_quantized_model`` on a freshly-initialized model): each leaf is
    rebuilt with ``jax.make_array_from_callback``, so every device reads
    exactly its shard — no full-array host materialization. Requires the
    template's shard boundaries to match the checkpoint's (same mesh
    topology); use the host-gathered flavor to reshard across topologies."""
    path = os.path.join(dirpath, f"proc{jax.process_index()}.npz")
    with np.load(path) as data:
        flat, _ = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            key = _path_key(p)

            def read(index, key=key, shape=getattr(leaf, "shape", ())):
                skey = _shard_key(key, index, shape)
                if skey not in data:
                    # legacy format (pre-r3): start-offsets only, e.g.
                    # 'w@0,512'. Accept it on miss so older sharded
                    # checkpoints keep loading (their ambiguity only
                    # mattered for the error message, not the bytes).
                    legacy = key + "@" + ",".join(
                        str(s.start or 0) for s in index)
                    if legacy in data:
                        skey = legacy
                    else:
                        raise KeyError(
                            f"{dirpath}: no shard {skey} — checkpoint "
                            "topology differs from template; reshard via "
                            "load_checkpoint")
                arr = data[skey]
                if skey + _DTYPE_TAG in data:
                    arr = arr.view(np.dtype(str(data[skey + _DTYPE_TAG])))
                return arr

            if hasattr(leaf, "sharding") and hasattr(leaf, "shape"):
                leaves.append(jax.make_array_from_callback(
                    leaf.shape, leaf.sharding, read))
            else:
                full = (slice(0, None),) * getattr(leaf, "ndim", 0)
                leaves.append(jax.numpy.asarray(read(full)))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template),
        leaves)


def load_checkpoint(path: str, template):
    """Restore into the structure of ``template`` (same model config/pytree;
    leaf values are replaced, dtypes/shapes validated)."""
    with np.load(path) as data:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            key = _path_key(p)
            if key not in data:
                raise KeyError(f"checkpoint {path} missing leaf {key}")
            arr = data[key]
            if key + _DTYPE_TAG in data:
                arr = arr.view(np.dtype(str(data[key + _DTYPE_TAG])))
            want_shape = getattr(leaf, "shape", None)
            if want_shape is not None and tuple(arr.shape) != tuple(want_shape):
                raise ValueError(
                    f"{key}: checkpoint shape {arr.shape} != model {want_shape}")
            leaves.append(jax.numpy.asarray(arr))
        keys = {_path_key(p) for p, _ in flat}
        extra = {f for f in set(data.files) - keys
                 if not (f.endswith(_DTYPE_TAG) and f[:-len(_DTYPE_TAG)] in keys)}
        if extra:
            raise ValueError(f"checkpoint has extra leaves: {sorted(extra)[:5]}")
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
