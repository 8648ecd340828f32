"""Pipeline parallelism (GPipe over a ``pipe`` mesh axis) vs the sequential
reference forward — the parallel components have no reference counterpart
(SURVEY.md §2: the reference is single-GPU), so the oracle is this
framework's own single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.parallel.mesh import make_mesh
from qgemm_tpu.utils.testing import assert_allclose
from qgemm_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_gpt_forward,
    stack_stages,
)

CFG = GPTConfig(vocab_size=61, d_model=16, n_heads=2, d_ff=32, n_layers=4,
                max_seq_len=16)


@pytest.fixture(scope="module")
def model():
    return GPT.init(CFG, key=jax.random.PRNGKey(0))


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_sequential(model, n_stages, n_micro):
    mesh = make_mesh((n_stages,), ("pipe",))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 12), 0,
                                CFG.vocab_size)
    want = model.forward(tokens)
    got = pipeline_gpt_forward(model, tokens, mesh=mesh,
                               n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_apply_grad(model):
    """GPipe backward = jax.grad through the schedule (differentiable
    ppermute/scan)."""
    mesh = make_mesh((4,), ("pipe",))
    stage_params = stack_stages(model.blocks, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 6, CFG.d_model))

    def block_fn(block, x):
        return block(x)

    def loss_pipe(params):
        y = pipeline_apply(block_fn, params, x, mesh=mesh)
        return jnp.sum(y ** 2)

    def loss_seq(blocks):
        h = x
        for b in blocks:
            h = b(h)
        return jnp.sum(h ** 2)

    g_pipe = jax.grad(loss_pipe)(stage_params)
    g_seq = jax.grad(loss_seq)(model.blocks)
    g_seq_stacked = stack_stages(g_seq, 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pipeline_jit_compiles(model):
    mesh = make_mesh((8,), ("pipe",))
    cfg8 = GPTConfig(vocab_size=61, d_model=16, n_heads=2, d_ff=32,
                     n_layers=8, max_seq_len=16)
    model8 = GPT.init(cfg8, key=jax.random.PRNGKey(3))
    tokens = jnp.zeros((8, 4), jnp.int32)

    @jax.jit
    def fwd(m, t):
        return pipeline_gpt_forward(m, t, mesh=mesh)

    out = fwd(model8, tokens)
    assert out.shape == (8, 4, cfg8.vocab_size)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pipeline_quantized_gpt_matches_single_device():
    """GPipe composes with the int8 model: the stacked-stage params carry
    QuantizedWeight leaves, each stage runs the fused quantized matmuls
    locally inside shard_map."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.pipeline import pipeline_gpt_forward

    mesh = make_mesh((4,), ("pipe",))
    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=4, max_seq_len=32)
    qm = GPT.init(cfg, key=jax.random.PRNGKey(11)).quantize()
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (8, 8)),
                       jnp.int32)
    ref = jax.jit(lambda m, t: m.forward(t))(qm, toks)
    out = jax.jit(lambda m, t: pipeline_gpt_forward(m, t, mesh=mesh))(qm, toks)
    assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
