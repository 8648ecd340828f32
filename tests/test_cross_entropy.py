"""Cross-entropy fused fwd+bwd vs analytic oracle
(reference: src/ops/op_cross_entropy.cuh)."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.ops.cross_entropy import (
    cross_entropy_loss,
    cross_entropy_loss_and_grad,
)
from qgemm_tpu.utils.testing import assert_allclose

RNG = np.random.default_rng(3)


def _numpy_ce(logits, targets):
    m = logits.max(-1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(-1, keepdims=True)
    nll = -np.log(p[np.arange(len(targets)), targets])
    return nll.mean(), (p - np.eye(logits.shape[1])[targets]) / len(targets)


def test_loss_matches_numpy():
    logits = RNG.normal(size=(32, 10)).astype(np.float32)
    targets = RNG.integers(0, 10, size=(32,))
    loss_np, _ = _numpy_ce(logits, targets)
    loss = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets))
    assert_allclose(loss, loss_np, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_analytic():
    logits = RNG.normal(size=(16, 7)).astype(np.float32)
    targets = RNG.integers(0, 7, size=(16,))
    _, dlogits_np = _numpy_ce(logits, targets)
    g = jax.grad(cross_entropy_loss)(jnp.asarray(logits), jnp.asarray(targets))
    assert_allclose(g, dlogits_np, rtol=1e-5, atol=1e-6)
    # dual-return convenience (reference op returns loss + d_logits together)
    loss, d = cross_entropy_loss_and_grad(jnp.asarray(logits), jnp.asarray(targets))
    assert_allclose(d, dlogits_np, rtol=1e-5, atol=1e-6)


def test_custom_vjp_vs_autodiff_of_composition():
    """The hand-derived VJP must equal autodiff of the unfused composition."""
    logits = RNG.normal(size=(8, 5)).astype(np.float32)
    targets = RNG.integers(0, 5, size=(8,))

    def unfused(lg):
        lp = jax.nn.log_softmax(lg)
        return -jnp.mean(jnp.take_along_axis(lp, jnp.asarray(targets)[:, None], -1))

    g_ref = jax.grad(unfused)(jnp.asarray(logits))
    g = jax.grad(cross_entropy_loss)(jnp.asarray(logits), jnp.asarray(targets))
    assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)
