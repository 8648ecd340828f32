"""Checkpoint / resume.

Greenfield aux subsystem (SURVEY.md §5: the reference has NO serialization —
weights are random per run, src/transformer.cu:34-35). Pytree-path-keyed
``.npz`` checkpoints: framework-agnostic, human-inspectable, works for fp32
training state and int8 serving artifacts alike (quantized weights + scales
round-trip bit-exactly). For multi-host sharded state, arrays are gathered
to host before save and re-sharded by the caller after restore (orbax is the
heavier alternative when per-shard async checkpointing is needed).
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
