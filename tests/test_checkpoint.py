"""Checkpoint/resume round trips (fp32 training state + int8 serving)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

CFG = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64, n_layers=2,
                max_seq_len=32)


def test_roundtrip_fp32(tmp_path):
    model = GPT.init(CFG, key=jax.random.PRNGKey(0))
    p = str(tmp_path / "model.npz")
    save_checkpoint(p, model)
    restored = load_checkpoint(p, GPT.init(CFG, key=jax.random.PRNGKey(9)))
    for a, b in zip(jax.tree_util.tree_leaves(model),
                    jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # restored model produces identical logits
    toks = jnp.asarray([[1, 2, 3]])
    assert np.array_equal(np.asarray(model.forward(toks)),
                          np.asarray(restored.forward(toks)))


def test_roundtrip_int8_serving(tmp_path):
    q = GPT.init(CFG, key=jax.random.PRNGKey(1)).quantize()
    p = str(tmp_path / "model_int8.npz")
    save_checkpoint(p, q)
    restored = load_checkpoint(
        p, GPT.init(CFG, key=jax.random.PRNGKey(2)).quantize())
    for a, b in zip(jax.tree_util.tree_leaves(q),
                    jax.tree_util.tree_leaves(restored)):
        assert a.dtype == b.dtype  # int8 stays int8
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_shape_mismatch_rejected(tmp_path):
    model = GPT.init(CFG, key=jax.random.PRNGKey(0))
    p = str(tmp_path / "model.npz")
    save_checkpoint(p, model)
    other_cfg = GPTConfig(vocab_size=64, d_model=16, n_heads=4, d_ff=64,
                          n_layers=2, max_seq_len=32)
    with pytest.raises((ValueError, KeyError)):
        load_checkpoint(p, GPT.init(other_cfg, key=jax.random.PRNGKey(0)))


def test_quantized_gpt_roundtrip(tmp_path):
    """int8 serving artifacts (QuantizedWeight q+c leaves) round-trip
    bit-exactly through the npz checkpoint."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=67, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=32)
    m = GPT.init(cfg, key=jax.random.PRNGKey(1)).quantize()
    p = str(tmp_path / "gpt_int8.npz")
    save_checkpoint(p, m)
    m2 = load_checkpoint(p, m)
    for a, b in zip(jax.tree_util.tree_leaves(m),
                    jax.tree_util.tree_leaves(m2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bfloat16_roundtrip(tmp_path):
    """Extension dtypes (bfloat16) survive the npz round-trip via the
    bits+tag encoding (npz alone degrades them to raw void)."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=67, d_model=32, n_heads=4, d_ff=64,
                    n_layers=1, max_seq_len=32, dtype="bfloat16",
                    n_experts=2)
    m = GPT.init(cfg, key=jax.random.PRNGKey(2)).quantize()
    p = str(tmp_path / "bf16.npz")
    save_checkpoint(p, m)
    m2 = load_checkpoint(p, m)
    for a, b in zip(jax.tree_util.tree_leaves(m),
                    jax.tree_util.tree_leaves(m2)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Per-shard save/restore of a TP-sharded int8 GPT: no full-array host
    gather (each saved entry is shard-sized), restore lands on the template
    sharding bit-exactly."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import numpy as np
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.utils.checkpoint import (load_checkpoint_sharded,
                                            save_checkpoint_sharded)

    mesh = make_mesh((1, 8), ("data", "model"))
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=8, d_ff=64,
                    n_layers=2, max_seq_len=32)
    qms = shard_quantized_model(
        GPT.init(cfg, key=jax.random.PRNGKey(3)).quantize(), mesh)
    d = str(tmp_path / "ckpt")
    save_checkpoint_sharded(d, qms)

    # saved entries are SHARD-sized, not global: the column-sharded QKV int8
    # block must appear as [d_model, d_model/8] slices
    data = np.load(f"{d}/proc0.npz")
    qkv_keys = [k for k in data.files if "wqkv_q/wq/q@" in k]
    assert len(qkv_keys) == 8 * cfg.n_layers
    assert data[qkv_keys[0]].shape == (32, 4)

    template = shard_quantized_model(
        GPT.init(cfg, key=jax.random.PRNGKey(99)).quantize(), mesh)
    restored = load_checkpoint_sharded(d, template)
    toks = jnp.arange(8, dtype=jnp.int32)[None, :]
    ref = jax.jit(lambda m, t: m.forward(t))(qms, toks)
    got = jax.jit(lambda m, t: m.forward(t))(restored, toks)
    assert bool(jnp.all(ref == got))
    # restored leaves carry the template's sharding
    assert restored.blocks[0].attn.wqkv_q.wq.q.sharding == \
        template.blocks[0].attn.wqkv_q.wq.q.sharding


def test_sharded_checkpoint_topology_mismatch(tmp_path):
    """A replicated-template load against a sharded checkpoint must fail
    with the intended topology KeyError: both have a shard starting at 0,
    so keying shards by start offsets alone would silently resolve to a
    wrong-extent shard and die with an opaque shape error."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.utils.checkpoint import (load_checkpoint_sharded,
                                            save_checkpoint_sharded)

    mesh = make_mesh((8,), ("model",))
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)
    sharded = jax.device_put(x, NamedSharding(mesh, P("model", None)))
    d = str(tmp_path / "ckpt")
    save_checkpoint_sharded(d, {"w": sharded})

    replicated = jax.device_put(x, NamedSharding(mesh, P(None, None)))
    with pytest.raises(KeyError, match="topology"):
        load_checkpoint_sharded(d, {"w": replicated})


def test_sharded_checkpoint_legacy_start_keys(tmp_path):
    """Pre-r3 sharded checkpoints keyed shards by start offsets only
    ('w@0,0'); the loader must fall back to that format on a span-key miss
    instead of raising the topology KeyError (r3 advisor: silent on-disk
    format break)."""
    import os

    import numpy as np
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.utils.checkpoint import load_checkpoint_sharded

    mesh = make_mesh((8,), ("model",))
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    # write a legacy-format checkpoint by hand: one entry per shard start
    legacy = {f"w@{i},0": x[i:i + 1] for i in range(8)}
    np.savez(os.path.join(d, "proc0.npz"), **legacy)
    sharded_template = jax.device_put(
        jnp.zeros((8, 8), jnp.float32), NamedSharding(mesh, P("model", None)))
    restored = load_checkpoint_sharded(d, {"w": sharded_template})
    assert bool(jnp.all(restored["w"] == jnp.asarray(x)))
