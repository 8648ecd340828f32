"""Ring attention (sequence parallelism) vs the single-device attention
oracle (models/attention.py::scaled_dot_product_attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.attention import scaled_dot_product_attention
from qgemm_tpu.parallel.mesh import make_mesh
from qgemm_tpu.parallel.ring_attention import ring_attention
from qgemm_tpu.utils.testing import assert_allclose


def _qkv(b=2, h=2, s=32, d=8, dv=8, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, h, s, d), jnp.float32)
    k = jax.random.normal(k2, (b, h, s, d), jnp.float32)
    v = jax.random.normal(k3, (b, h, s, dv), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense(n_dev, causal):
    mesh = make_mesh((n_dev,), ("seq",))
    q, k, v = _qkv()
    want = scaled_dot_product_attention(q, k, v, causal=causal)
    got = ring_attention(q, k, v, mesh=mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_jit_and_grad():
    mesh = make_mesh((4,), ("seq",))
    q, k, v = _qkv(s=16)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            scaled_dot_product_attention(q, k, v, causal=True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ring_rejects_indivisible():
    mesh = make_mesh((4,), ("seq",))
    q, k, v = _qkv(s=30)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh=mesh)


# ---------------------------------------------------------------------------
# Ulysses (all-to-all) sequence parallelism
# ---------------------------------------------------------------------------

def test_ulysses_matches_full_attention():
    from qgemm_tpu.parallel.ulysses import ulysses_attention
    mesh = make_mesh((8,), ("seq",))
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(kq, (2, 8, 64, 16), jnp.float32)
    k = jax.random.normal(kk, (2, 8, 64, 16), jnp.float32)
    v = jax.random.normal(kv, (2, 8, 64, 16), jnp.float32)
    for causal in (False, True):
        got = jax.jit(lambda q, k, v: ulysses_attention(
            q, k, v, mesh=mesh, causal=causal))(q, k, v)
        ref = scaled_dot_product_attention(q, k, v, causal=causal)
        assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_ulysses_grad_matches():
    from qgemm_tpu.parallel.ulysses import ulysses_attention
    mesh = make_mesh((4,), ("seq",))
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (1, 4, 32, 16), jnp.float32)
    k = jax.random.normal(kk, (1, 4, 32, 16), jnp.float32)
    v = jax.random.normal(kv, (1, 4, 32, 16), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(ulysses_attention(q, k, v, mesh=mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(scaled_dot_product_attention(q, k, v, causal=True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_ulysses_rejects_indivisible_heads():
    from qgemm_tpu.parallel.ulysses import ulysses_attention
    mesh = make_mesh((8,), ("seq",))
    x = jnp.zeros((1, 4, 64, 16))
    with pytest.raises(ValueError, match="n_heads"):
        ulysses_attention(x, x, x, mesh=mesh)
