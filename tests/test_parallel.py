"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(greenfield capability — SURVEY.md §2 'Parallelism & distributed' and §7 M5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.optim import sgd_step
from qgemm_tpu.models.transformer import Transformer, TransformerConfig
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss
from qgemm_tpu.ops.quantize import quantize_weights, quantized_matmul_prequant
from qgemm_tpu.parallel.mesh import make_mesh
from qgemm_tpu.parallel.sharding import model_sharding_spec, shard_batch, shard_model
from qgemm_tpu.parallel.tp_ops import (
    tp_quantized_matmul_column,
    tp_quantized_matmul_row,
)
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(5)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_tp_column_matches_single_chip():
    mesh = make_mesh((1, 4), ("data", "model"))
    x = jnp.asarray(RNG.normal(size=(16, 64)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(64, 128)).astype(np.float32))
    wq = quantize_weights(w)
    ref = quantized_matmul_prequant(x, wq, backend="xla")
    got = tp_quantized_matmul_column(x, wq.q, wq.c, mesh)
    assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_tp_row_matches_single_chip():
    """Row-parallel with the global-absmax pmax: must be EXACTLY the
    single-chip quantization grid (same int8 values, same scales)."""
    mesh = make_mesh((1, 4), ("data", "model"))
    x = jnp.asarray(RNG.normal(size=(16, 128)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(128, 64)).astype(np.float32))
    wq = quantize_weights(w)
    ref = quantized_matmul_prequant(x, wq, backend="xla")
    got = tp_quantized_matmul_row(x, wq.q, wq.c, mesh)
    assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_sharded_training_step_matches_unsharded():
    cfg = TransformerConfig(vocab_size=64, d_model=16, n_heads=4, d_ff=32,
                            n_layers=1, max_seq_len=16)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(0))
    src = jnp.asarray(RNG.integers(0, 64, (4, 6)).astype(np.int32))
    tgt_in = jnp.asarray(RNG.integers(0, 64, (4, 5)).astype(np.int32))
    tgt_out = jnp.asarray(RNG.integers(0, 64, (4, 5)).astype(np.int32))

    def loss_fn(m):
        logits = m.forward(src, tgt_in)
        return cross_entropy_loss(logits.reshape(-1, cfg.vocab_size),
                                  tgt_out.reshape(-1))

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(model)

    mesh = make_mesh((2, 4), ("data", "model"))
    sharded = shard_model(model, mesh)
    loss_sh, grads_sh = jax.jit(jax.value_and_grad(loss_fn))(sharded)
    assert_allclose(loss_sh, loss_ref, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_sh)[:5],
                    jax.tree_util.tree_leaves(grads_ref)[:5]):
        assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # one SGD step executes with sharded params
    new_model = jax.jit(lambda m, g: sgd_step(m, g, 0.01))(sharded, grads_sh)
    jax.block_until_ready(jax.tree_util.tree_leaves(new_model)[0])


def test_sharding_spec_rules():
    cfg = TransformerConfig(vocab_size=64, d_model=16, n_heads=4, d_ff=32,
                            n_layers=1, max_seq_len=16)
    model = Transformer.init(cfg, key=jax.random.PRNGKey(0))
    spec = model_sharding_spec(model)
    blk = spec.enc_blocks[0]
    from jax.sharding import PartitionSpec as P
    assert blk.attn.wqkv_q.w == P(None, "model")
    assert blk.attn.w_o.w == P("model", None)
    assert blk.ffn.up.w == P(None, "model")
    assert blk.ffn.down.w == P("model", None)
    assert blk.ln1.gamma == P()
    assert spec.lm_head.w == P(None, "model")


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh((2, 4), ("data", "model"))
    batch = {"x": jnp.zeros((8, 3)), "y": jnp.zeros((8,), jnp.int32)}
    sb = shard_batch(batch, mesh)
    assert "data" in str(sb["x"].sharding.spec)


def test_quantized_sharded_model_spec():
    """Quantized pytree (int8 weights + scales) shards consistently."""
    cfg = TransformerConfig(vocab_size=64, d_model=16, n_heads=4, d_ff=32,
                            n_layers=1, max_seq_len=16)
    q = Transformer.init(cfg, key=jax.random.PRNGKey(0)).quantize()
    spec = model_sharding_spec(q)
    from jax.sharding import PartitionSpec as P
    blk = spec.enc_blocks[0]
    assert blk.attn.wqkv_q.wq.q == P(None, "model")
    assert blk.attn.wqkv_q.wq.c == P(None, "model")   # scales follow columns
    assert blk.attn.w_o.wq.q == P("model", None)
    assert blk.attn.w_o.wq.c == P()                   # replicated for row-sharded


# ---------------------------------------------------------------------------
# integrated multi-chip int8 path: TP-marked QuantizedLinear model
# (VERDICT r1 #1 / BASELINE config 5 / SURVEY §7 M5)
# ---------------------------------------------------------------------------

def _tp_gpt(mesh):
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=64)
    qm = GPT.init(cfg, key=jax.random.PRNGKey(0)).quantize()
    return qm, shard_quantized_model(qm, mesh)


def test_tp_quantized_gpt_forward_parity():
    """A quantized GPT sharded over a (data, model) mesh routes every GEMM
    through the shard_map int8 kernels and matches the single-device
    quantized model."""
    mesh = make_mesh((2, 4), ("data", "model"))
    qm, qms = _tp_gpt(mesh)
    # every projection in the sharded model carries a TP mark
    blk = qms.blocks[0]
    assert blk.attn.wqkv_q.tp_mode == "column"
    assert not blk.attn.wqkv_q.gather_output
    assert blk.attn.w_o.tp_mode == "row"
    assert blk.ffn.up.tp_mode == "column" and blk.ffn.down.tp_mode == "row"
    assert qms.lm_head.tp_mode == "column" and qms.lm_head.gather_output
    # and the int8 shards are actually placed on the model axis
    assert "model" in str(blk.attn.wqkv_q.wq.q.sharding.spec)

    toks = jnp.asarray(RNG.integers(0, 64, size=(2, 12)), jnp.int32)
    ref = jax.jit(lambda m, t: m.forward(t))(qm, toks)
    out = jax.jit(lambda m, t: m.forward(t))(qms, toks)
    assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_tp_quantized_gpt_generate_parity():
    mesh = make_mesh((2, 4), ("data", "model"))
    qm, qms = _tp_gpt(mesh)
    prompt = jnp.asarray(RNG.integers(0, 64, size=(2, 6)), jnp.int32)
    g_ref = jax.jit(lambda m, p: m.generate(p, 5))(qm, prompt)
    g_out = jax.jit(lambda m, p: m.generate(p, 5))(qms, prompt)
    assert bool(jnp.all(g_ref == g_out))


def test_tp_quantized_outlier_forward_runs():
    """Outlier decomposition composes with TP: the inlier int8 matmul rides
    shard_map, the bf16 outlier correction stays at the GSPMD level."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    mesh = make_mesh((1, 8), ("data", "model"))
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=8, d_ff=64,
                    n_layers=1, max_seq_len=32)
    qm = GPT.init(cfg, key=jax.random.PRNGKey(1)).quantize(
        outlier_threshold=2.0, outlier_capacity=4)
    qms = shard_quantized_model(qm, mesh)
    toks = jnp.asarray(RNG.integers(0, 64, size=(1, 8)), jnp.int32)
    ref = jax.jit(lambda m, t: m.forward(t))(qm, toks)
    out = jax.jit(lambda m, t: m.forward(t))(qms, toks)
    assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_tp_forward_hlo_collectives_are_exactly_as_designed():
    """Profile-based assertion (SURVEY §7 hard-part 6): the compiled HLO of
    the TP int8 forward contains EXACTLY the designed collectives and
    nothing more — per block: one [M,1] pmax (global activation absmax) +
    one psum for attention W_O, the same pair for FFN-down (4 all-reduces
    per block), plus one lm_head output all-gather. Any GSPMD resharding
    regression (e.g. the Megatron pairing breaking and activations
    bouncing through extra all-gathers) fails this test."""
    import collections
    import re

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    mesh = make_mesh((1, 8), ("data", "model"))
    n_layers = 2
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=8, d_ff=64,
                    n_layers=n_layers, max_seq_len=32)
    qms = shard_quantized_model(
        GPT.init(cfg, key=jax.random.PRNGKey(0)).quantize(), mesh)
    toks = jnp.zeros((1, 8), jnp.int32)
    txt = jax.jit(lambda m, t: m.forward(t)).lower(qms, toks).compile().as_text()

    ops = collections.Counter()
    for name in ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                 "collective-permute"):
        ops[name] = (len(re.findall(rf"= \S+ {name}\(", txt))
                     + len(re.findall(rf"= \S+ {name}-start\(", txt)))
    assert ops["all-reduce"] == 4 * n_layers, ops
    assert ops["all-gather"] == 1, ops
    assert ops["reduce-scatter"] == 0 and ops["all-to-all"] == 0 \
        and ops["collective-permute"] == 0, ops


def test_scaling_model_allreduce_bytes_match_compiled_hlo():
    """VERDICT r1 weak #4: the 2-host scaling model's per-step all-reduce
    byte count is asserted against the compiled HLO of the actual sharded
    decode step — every all-reduce operand's dtype x shape is parsed out of
    the program and the total must equal the analytic formula."""
    import re

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "bench_scaling", os.path.join(os.path.dirname(__file__), "..",
                                      "scripts", "bench_scaling.py"))
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)

    mesh = make_mesh((1, 8), ("data", "model"))
    n_layers, d_model, batch = 2, 32, 4
    cfg = GPTConfig(vocab_size=64, d_model=d_model, n_heads=8, d_ff=64,
                    n_layers=n_layers, max_seq_len=32)
    qms = shard_quantized_model(
        GPT.init(cfg, key=jax.random.PRNGKey(0)).quantize(), mesh)
    caches = qms.init_cache(batch, 32)
    tok = jnp.zeros((batch, 1), jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)
    txt = jax.jit(lambda m, t, p, c: m.decode_step(t, p, c)[0]).lower(
        qms, tok, pos, caches).compile().as_text()

    sizes = {"f32": 4, "bf16": 2, "s32": 4, "f16": 2}
    total = 0
    for dt, shape in re.findall(
            r"= (\w+)\[([\d,]*)\][^=]*? all-reduce(?:-start)?\(", txt):
        elems = 1
        for d in filter(None, shape.split(",")):
            elems *= int(d)
        total += elems * sizes[dt]
    expected = bs.analytic_decode_step_allreduce_bytes(n_layers, d_model,
                                                       batch)
    assert total == expected, (total, expected)


def test_tp_quantized_encoder_decoder_parity():
    """The encoder-decoder family also runs TP int8: sharded forward and
    greedy generate match the single-device quantized model."""
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    mesh = make_mesh((1, 4), ("data", "model"))
    cfg = TransformerConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                            n_layers=2, max_seq_len=32)
    qm = Transformer.init(cfg, key=jax.random.PRNGKey(5)).quantize()
    qms = shard_quantized_model(qm, mesh)
    assert qms.dec_blocks[0].cross_attn.wqkv_q.tp_mode == "column"
    src = jnp.asarray(RNG.integers(0, 64, size=(2, 6)), jnp.int32)
    tgt = jnp.asarray(RNG.integers(0, 64, size=(2, 5)), jnp.int32)
    ref = jax.jit(lambda m, s, t: m.forward(s, t))(qm, src, tgt)
    out = jax.jit(lambda m, s, t: m.forward(s, t))(qms, src, tgt)
    assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    g_ref = jax.jit(lambda m, s: m.generate(s, 4))(qm, src)
    g_out = jax.jit(lambda m, s: m.generate(s, 4))(qms, src)
    assert bool(jnp.all(g_ref == g_out))


def test_w4a8_tp_ops_match_single_chip():
    """W4A8 column/row tensor parallelism == the single-chip kernel
    (column: exact — same per-row activation grid; row: within
    activation-quant noise — each K shard quantizes on its own slab grid,
    mathematically the per-slab scheme the kernel uses anyway)."""
    from qgemm_tpu.ops.quantize import (quantize_weights_int4,
                                        quantized_matmul_prequant_w4)
    from qgemm_tpu.parallel.tp_ops import (tp_w4a8_matmul_column,
                                           tp_w4a8_matmul_row)

    mesh = make_mesh((1, 4), ("data", "model"))
    x = jnp.asarray(RNG.normal(size=(16, 512)).astype(np.float32))
    w = jnp.asarray(RNG.normal(size=(512, 256)).astype(np.float32) / 20)
    wq4 = quantize_weights_int4(w)
    ref = quantized_matmul_prequant_w4(x, wq4)

    col = tp_w4a8_matmul_column(x, wq4.qp, wq4.c, mesh)
    assert_allclose(col, ref, rtol=1e-5, atol=1e-5)

    row = tp_w4a8_matmul_row(x, wq4.qp, wq4.c, mesh)
    assert_allclose(row, ref, rtol=5e-2, atol=5e-2)


def test_w4a8_tp_model_forward():
    """A bits=4 GPT under shard_quantized_model matches the single-device
    w4 model within row-TP activation-grid noise; indivisible layers fall
    back to the single kernel (graceful)."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.sharding import shard_quantized_model

    mesh = make_mesh((1, 8), ("data", "model"))
    cfg = GPTConfig(vocab_size=64, d_model=1024, n_heads=8, d_ff=2048,
                    n_layers=1, max_seq_len=16)
    q4 = GPT.init(cfg, key=jax.random.PRNGKey(2)).quantize(bits=4)
    q4s = shard_quantized_model(q4, mesh)
    # the FFN-down row layer really is marked for shard_map TP
    assert q4s.blocks[0].ffn.down.tp_mode == "row"
    assert q4s.blocks[0].attn.wqkv_q.tp_mode == "column"
    toks = jnp.asarray(RNG.integers(0, 64, size=(1, 8)), jnp.int32)
    ref = jax.jit(lambda m, t: m.forward(t))(q4, toks)
    out = jax.jit(lambda m, t: m.forward(t))(q4s, toks)
    assert_allclose(out, ref, rtol=5e-2, atol=5e-2)
