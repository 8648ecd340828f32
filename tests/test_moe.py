"""MoE feed-forward + expert parallelism (models/moe.py, parallel/expert.py).

Greenfield capability — no reference counterpart (SURVEY.md §2: the
reference has no parallelism and no MoE); verified against a per-token
numpy oracle and, for EP, against the single-device dense result.
"""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.moe import (MoEFeedForward, expert_ffn,
                                  quantize_expert_weights, route)
from qgemm_tpu.parallel.expert import ep_moe_forward, shard_moe
from qgemm_tpu.parallel.mesh import make_mesh


def _oracle(x, moe):
    """Per-token numpy loop: top-k experts, renormalized gates, no capacity
    limit (tests use generous capacity so nothing drops)."""
    xf = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
    rw = np.asarray(moe.router_w, np.float64)
    up = np.asarray(moe.w_up, np.float64)
    dn = np.asarray(moe.w_down, np.float64)
    logits = xf @ rw
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.zeros_like(xf)
    for t in range(xf.shape[0]):
        top = np.argsort(-p[t])[:moe.top_k]
        gates = p[t][top] / p[t][top].sum()
        for g, e in zip(gates, top):
            h = np.maximum(xf[t] @ up[e], 0.0)
            out[t] += g * (h @ dn[e])
    return out.reshape(x.shape)


def test_moe_matches_oracle_top1():
    moe = MoEFeedForward.init(jax.random.PRNGKey(0), 16, 32, n_experts=4,
                              top_k=1, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 16))
    np.testing.assert_allclose(np.asarray(moe(x)), _oracle(x, moe),
                               rtol=0, atol=1e-4)


def test_moe_matches_oracle_top2():
    moe = MoEFeedForward.init(jax.random.PRNGKey(2), 16, 32, n_experts=4,
                              top_k=2, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 16))
    np.testing.assert_allclose(np.asarray(moe(x)), _oracle(x, moe),
                               rtol=0, atol=1e-4)


def test_capacity_drops_overflow_tokens():
    """With capacity 8 (the floor) and 64 tokens on 1 expert, only the first
    8 tokens get expert output; the rest are zeros (residual carries them)."""
    moe = MoEFeedForward.init(jax.random.PRNGKey(4), 8, 16, n_experts=1,
                              top_k=1, capacity_factor=0.01)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 8))
    out = np.asarray(moe(x))
    assert np.abs(out[0, :8]).max() > 0
    assert np.abs(out[0, 8:]).max() == 0


def test_quantized_moe_close_to_float():
    moe = MoEFeedForward.init(jax.random.PRNGKey(6), 32, 64, n_experts=4,
                              top_k=2, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 32))
    ref = np.asarray(moe(x))
    qout = np.asarray(moe.quantize()(x))
    scale = np.abs(ref).max()
    assert np.abs(qout - ref).max() / scale < 0.05


def test_ep_matches_dense():
    """Expert-parallel shard_map forward == single-device dense forward."""
    mesh = make_mesh((8,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(8), 16, 32, n_experts=8,
                              top_k=2, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 16))
    dense = np.asarray(moe(x))
    ep = np.asarray(jax.jit(
        lambda x: ep_moe_forward(x, moe, mesh))(x))
    np.testing.assert_allclose(ep, dense, rtol=0, atol=1e-5)


def test_ep_quantized_matches_dense_quantized():
    mesh = make_mesh((8,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(10), 16, 32, n_experts=8,
                              top_k=1, capacity_factor=4.0).quantize()
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 16))
    dense = np.asarray(moe(x))
    ep = np.asarray(ep_moe_forward(x, moe, mesh))
    np.testing.assert_allclose(ep, dense, rtol=0, atol=1e-5)


def test_gspmd_sharded_moe_runs():
    """GSPMD path: expert tensors sharded on E, XLA partitions the einsums."""
    mesh = make_mesh((8,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(12), 16, 32, n_experts=8,
                              top_k=2, capacity_factor=4.0)
    dense = None
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 8, 16))
    dense = np.asarray(moe(x))
    smoe = shard_moe(moe, mesh)
    out = np.asarray(jax.jit(lambda m, x: m(x))(smoe, x))
    np.testing.assert_allclose(out, dense, rtol=0, atol=1e-5)


def test_moe_gpt_family():
    """GPTConfig(n_experts=...) swaps every block's FFN for the MoE and the
    whole serving path (forward / quantize / generate) still works."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    cfg = GPTConfig(vocab_size=67, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=32, n_experts=4, moe_top_k=2)
    m = GPT.init(cfg, key=jax.random.PRNGKey(14))
    from qgemm_tpu.models.moe import MoEFeedForward as M
    assert all(isinstance(b.ffn, M) for b in m.blocks)
    toks = jax.random.randint(jax.random.PRNGKey(15), (2, 6), 0, 67)
    logits = m(toks)
    assert logits.shape == (2, 6, 67)
    assert bool(jnp.all(jnp.isfinite(logits)))
    out = m.quantize().generate(toks, 4)
    assert out.shape == (2, 4)


def test_moe_gpt_trains():
    """Gradients flow through routing (via the combine gates) and experts."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.models.optim import sgd_step
    from qgemm_tpu.ops.cross_entropy import cross_entropy_loss
    cfg = GPTConfig(vocab_size=67, d_model=32, n_heads=4, d_ff=64,
                    n_layers=1, max_seq_len=32, n_experts=4)
    m = GPT.init(cfg, key=jax.random.PRNGKey(16))
    toks = jax.random.randint(jax.random.PRNGKey(17), (2, 8), 0, 67)

    def loss_fn(m):
        lg = m(toks[:, :-1])
        return cross_entropy_loss(lg.reshape(-1, 67), toks[:, 1:].reshape(-1))

    l0, grads = jax.value_and_grad(loss_fn)(m)
    g_router = grads.blocks[0].ffn.router_w
    assert float(jnp.abs(g_router).max()) > 0  # router learns
    m2 = sgd_step(m, grads, 0.1)
    l1 = loss_fn(m2)
    assert float(l1) < float(l0)


def test_moe_gpt_under_continuous_batching_engine():
    """The MoE model family serves through the same engine (dense + paged
    caches are attention-level; the routed FFN is orthogonal)."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=128, n_experts=4, moe_top_k=2)
    model = GPT.init(cfg, key=jax.random.PRNGKey(2)).quantize()
    eng = ContinuousBatchingEngine(model, max_slots=2)
    for i in range(3):
        eng.submit(Request(prompt=[1 + i, 2], max_new_tokens=4))
    fin = eng.run_to_completion()
    assert len(fin) == 3 and all(len(r.generated) == 4 for r in fin)

    # paged engine too
    eng2 = ContinuousBatchingEngine(model, max_slots=2, paged=True)
    for i in range(3):
        eng2.submit(Request(prompt=[1 + i, 2], max_new_tokens=4))
    fin2 = {tuple(r.generated) for r in eng2.run_to_completion()}
    assert fin2 == {tuple(r.generated) for r in fin}


def test_load_balancing_loss():
    """Switch aux loss: ~1.0 (minimum) for a uniform router, larger when
    routing collapses onto one expert; differentiable."""
    import jax
    import jax.numpy as jnp
    from qgemm_tpu.models.moe import MoEFeedForward, load_balancing_loss

    moe = MoEFeedForward.init(jax.random.PRNGKey(0), 16, 32, n_experts=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 16))
    # near-uniform router (tiny random weights) -> loss near 1
    near = float(moe.aux_loss(x))
    assert 0.9 < near < 1.6, near

    # collapsed router: a constant input feature drives every token to
    # expert 0 -> loss approaches E
    xc = x.at[:, 0].set(5.0)
    w_collapsed = jnp.zeros((16, 4)).at[0, 0].set(10.0)
    collapsed = float(load_balancing_loss(xc, w_collapsed))
    assert collapsed > 3.5, collapsed

    g = jax.grad(lambda w: load_balancing_loss(x, w))(moe.router_w)
    assert jnp.isfinite(g).all() and float(jnp.abs(g).max()) > 0


def test_ep_moe_a2a_matches_single_device():
    """The all-to-all EP formulation == the single-device layer when
    capacity doesn't bind (generous factor), dense and int8, with tokens
    sharded over the expert axis."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qgemm_tpu.models.moe import MoEFeedForward
    from qgemm_tpu.parallel.expert import ep_moe_forward_a2a, shard_moe
    from qgemm_tpu.parallel.mesh import make_mesh
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    mesh = make_mesh((8,), ("expert",))
    moe = MoEFeedForward.init(jax.random.PRNGKey(0), 32, 64, n_experts=8,
                              top_k=2, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
    ref = moe(x)
    got = ep_moe_forward_a2a(x, shard_moe(moe, mesh), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    qmoe = moe.quantize()
    refq = qmoe(x)
    gotq = ep_moe_forward_a2a(x, shard_moe(qmoe, mesh), mesh)
    np.testing.assert_allclose(np.asarray(gotq), np.asarray(refq),
                               rtol=2e-2, atol=2e-2)


def test_moe_gpt_engine_under_mesh_matches_single_device():
    """MoE x TP serving: shard_quantized_model places expert-stacked
    tensors EXPERT-sharded over the model axis (expert parallelism via
    GSPMD — the routed einsums partition on E) while attention runs the
    shard_map int8 kernels; engine transcripts equal single-device,
    dense AND paged."""
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.parallel.mesh import make_mesh
    from qgemm_tpu.parallel.sharding import shard_quantized_model
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=128, n_experts=4, moe_top_k=2)
    m = GPT.init(cfg, key=jax.random.PRNGKey(30)).quantize()
    mesh = make_mesh((2, 4), ("data", "model"))
    ms = shard_quantized_model(m, mesh)
    # the expert dim actually sharded (not silently replicated)
    up = ms.blocks[0].ffn.w_up
    leaf = up.q if hasattr(up, "q") else up
    assert "model" in str(leaf.sharding.spec), leaf.sharding

    def run(model, **kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, **kw)
        reqs = [Request(prompt=[1 + i, 2, 3], max_new_tokens=5)
                for i in range(3)]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=60)}
        return [(tuple(fin[r.id].generated), fin[r.id].error) for r in reqs]

    for kw in ({}, {"paged": True}):
        tp = run(ms, mesh=mesh, **kw)
        sd = run(m, **kw)
        assert all(e is None for _, e in tp), (kw, tp)
        assert tp == sd, (kw, tp, sd)


def test_moe_gpt_with_speculative_decoding():
    """MoE x speculative serving (r4 verdict item 1c): an MoE target with
    a draft model speculates through the engine — greedy transcripts
    bit-equal to the plain MoE engine, dense AND paged caches."""
    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=64, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=128, n_experts=4, moe_top_k=2)
    model = GPT.init(cfg, key=jax.random.PRNGKey(7)).quantize()

    def run(**kw):
        eng = ContinuousBatchingEngine(model, max_slots=2, **kw)
        reqs = [Request(prompt=[1 + i, 2, 3], max_new_tokens=6)
                for i in range(3)]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=80)}
        assert all(fin[r.id].error is None for r in reqs)
        return [tuple(fin[r.id].generated) for r in reqs]

    plain = run()
    # self-draft (acceptance ~1) and an unrelated draft (acceptance ~0):
    # the verifier is the target, so transcripts never change
    other = GPT.init(cfg, key=jax.random.PRNGKey(8)).quantize()
    for draft in (model, other):
        assert run(draft_model=draft, spec_gamma=3) == plain
        assert run(draft_model=draft, spec_gamma=3, paged=True) == plain


def test_grouped_expert_qmm_kernel_parity():
    """The grouped Pallas expert qmm (ops/pallas/expert_matmul.py — a
    measured-negative-but-kept option, see its docstring) matches the
    einsum expert FFN exactly, including C/K/N padding edges."""
    from qgemm_tpu.models.moe import quantized_expert_ffn
    from qgemm_tpu.ops.pallas.expert_matmul import (
        grouped_quantized_matmul_pallas, quantized_expert_ffn_pallas)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    for e, c, d, f in ((4, 8, 64, 128), (3, 5, 48, 96)):
        x = jax.random.normal(k1, (e, c, d))
        wu = quantize_expert_weights(
            jax.random.uniform(k2, (e, d, f), minval=-1, maxval=1))
        wd = quantize_expert_weights(
            jax.random.uniform(k3, (e, f, d), minval=-1, maxval=1))
        ref = quantized_expert_ffn(x, wu, wd)
        got = quantized_expert_ffn_pallas(x, wu, wd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # single grouped matmul against the einsum formulation
        from qgemm_tpu.models.moe import _row_quantize
        from qgemm_tpu.ops.quantize import QRANGE
        xq, cx = _row_quantize(x)
        acc = jnp.einsum("ecd,edf->ecf", xq, wu.q,
                         preferred_element_type=jnp.int32)
        ref1 = acc.astype(jnp.float32) * (cx * wu.c) / (QRANGE * QRANGE)
        one = grouped_quantized_matmul_pallas(x, wu.q, wu.c)
        np.testing.assert_allclose(np.asarray(one), np.asarray(ref1),
                                   rtol=1e-5, atol=1e-5)
