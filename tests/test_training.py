"""End-to-end transformer TRAINING path: jax.grad through the GPT forward
(flash kernels on TPU, jnp on CPU), fused custom-VJP cross-entropy, Adam.
The reference's only training loop is the MNIST MLP; this covers the
transformer-scale training capability the framework adds."""

import jax
import jax.numpy as jnp

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.models.optim import Adam, adam_init, adam_step, sgd_step
from qgemm_tpu.ops.cross_entropy import cross_entropy_loss


def _loss_fn(m, seqs, vocab):
    logits = m.forward(seqs[:, :-1])
    return cross_entropy_loss(logits.reshape(-1, vocab),
                              seqs[:, 1:].reshape(-1))


def test_gpt_adam_overfits_batch():
    """Memorizing one batch is the canonical training-loop sanity check:
    loss must collapse far below the uniform floor ln(V)."""
    cfg = GPTConfig(vocab_size=32, d_model=64, n_heads=4, d_ff=128,
                    n_layers=2, max_seq_len=24)
    model = GPT.init(cfg, key=jax.random.PRNGKey(0))
    seqs = jax.random.randint(jax.random.PRNGKey(5), (4, 17), 0, 32)
    opt = Adam(lr=5e-3)
    state = opt.init(model)

    @jax.jit
    def step(m, st, s):
        loss, g = jax.value_and_grad(_loss_fn)(m, s, cfg.vocab_size)
        m, st = opt.step(m, g, st)
        return m, st, loss

    first = None
    for i in range(60):
        model, state, loss = step(model, state, seqs)
        if i == 0:
            first = float(loss)
    assert first > 3.0                       # ~ln(32) at init
    assert float(loss) < 0.5, float(loss)    # memorized


def test_adam_handles_none_leaves_and_dtypes():
    """None grads (frozen leaves / absent biases) pass through; bf16
    params keep f32 moments."""
    params = {"w": jnp.ones((4, 4), jnp.bfloat16), "b": None}
    grads = {"w": jnp.full((4, 4), 0.5, jnp.bfloat16), "b": None}
    st = adam_init(params)
    assert st.m["w"].dtype == jnp.float32 and st.m["b"] is None
    p2, st2 = adam_step(params, grads, st, lr=0.1)
    assert p2["b"] is None
    assert p2["w"].dtype == jnp.bfloat16
    assert float(p2["w"][0, 0]) < 1.0        # moved against the gradient
    assert int(st2.t) == 1

    p3 = sgd_step(params, grads, lr=0.1)
    assert p3["b"] is None and float(p3["w"][0, 0]) < 1.0
