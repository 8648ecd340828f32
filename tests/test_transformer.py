"""Encoder-decoder transformer tests (reference configs 3-4: attention block
+ full transformer inference with every GEMM int8-quantizable, plus the
KV-cache path the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.transformer import Transformer, TransformerConfig
from qgemm_tpu.utils.testing import assert_allclose

CFG = TransformerConfig(vocab_size=128, d_model=32, n_heads=4, d_ff=64,
                        n_layers=2, max_seq_len=32)


def _model(seed=0):
    return Transformer.init(CFG, key=jax.random.PRNGKey(seed))


def test_forward_shapes_and_finite():
    model = _model()
    src = jnp.asarray(np.arange(12).reshape(2, 6) % CFG.vocab_size)
    tgt = jnp.asarray((np.arange(10).reshape(2, 5) * 3) % CFG.vocab_size)
    logits = jax.jit(lambda m, s, t: m.forward(s, t))(model, src, tgt)
    assert logits.shape == (2, 5, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_decoder_is_causal():
    """Changing a future target token must not affect earlier logits."""
    model = _model()
    src = jnp.zeros((1, 4), jnp.int32)
    tgt1 = jnp.asarray([[5, 7, 9, 11]])
    tgt2 = jnp.asarray([[5, 7, 9, 99]])  # change last token only
    l1 = model.forward(src, tgt1)
    l2 = model.forward(src, tgt2)
    assert_allclose(l1[:, :3], l2[:, :3], rtol=1e-5, atol=1e-6)


def test_generate_matches_naive_decode():
    """KV-cache greedy generation == naive re-run-the-whole-decoder greedy
    decoding (the M3 correctness gate)."""
    model = _model(seed=3)
    src = jnp.asarray([[3, 14, 15, 92], [6, 5, 3, 58]])
    n_new = 6
    bos = 1

    fast = jax.jit(lambda m, s: m.generate(s, n_new, bos_token=bos))(model, src)

    # naive: re-encode once, re-decode full prefix each step, no cache
    enc = model.encode(src)
    toks = jnp.full((2, 1), bos, jnp.int32)
    naive = []
    for _ in range(n_new):
        logits = model.decode_full(toks, enc)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
        naive.append(nxt[:, 0])
        toks = jnp.concatenate([toks, nxt], axis=1)
    naive = jnp.stack(naive, axis=1)
    assert np.array_equal(np.asarray(fast), np.asarray(naive)), \
        (np.asarray(fast), np.asarray(naive))


def test_quantized_transformer_runs_and_is_close():
    model = _model(seed=4)
    qmodel = model.quantize()
    src = jnp.asarray([[3, 14, 15, 92]])
    tgt = jnp.asarray([[1, 2, 3]])
    lf = np.asarray(model.forward(src, tgt))
    lq = np.asarray(qmodel.forward(src, tgt))
    rel = np.linalg.norm(lq - lf) / np.linalg.norm(lf)
    assert rel < 0.1, rel
    # quantized generation runs under jit and produces mostly the same tokens
    gen_q = np.asarray(jax.jit(lambda m, s: m.generate(s, 4))(qmodel, src))
    assert gen_q.shape == (1, 4)


def test_training_step_on_transformer():
    """Cross-entropy + SGD over the full seq2seq model (training capability
    beyond the reference demo's random weights)."""
    from qgemm_tpu.models.optim import sgd_step
    from qgemm_tpu.ops.cross_entropy import cross_entropy_loss

    model = _model(seed=5)
    src = jnp.asarray([[3, 1, 4, 1]])
    tgt_in = jnp.asarray([[1, 7, 7]])
    tgt_out = jnp.asarray([[7, 7, 2]])

    @jax.jit
    def step(model):
        def loss_fn(m):
            logits = m.forward(src, tgt_in)
            return cross_entropy_loss(logits.reshape(-1, CFG.vocab_size),
                                      tgt_out.reshape(-1))
        loss, grads = jax.value_and_grad(loss_fn)(model)
        return sgd_step(model, grads, 0.1), loss

    losses = []
    for _ in range(20):
        model, loss = step(model)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
