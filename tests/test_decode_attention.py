"""Fused decode-attention kernel (ops/pallas/decode_attention.py) vs a jnp
oracle — float and int8 cache variants, per-slot lengths, ragged shapes.
Runs in Pallas interpreter mode on the CPU conftest backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.ops.kv_cache import quantize_kv
from qgemm_tpu.models.attention import scaled_dot_product_attention
from qgemm_tpu.ops.pallas.decode_attention import decode_attention


def _oracle(q, k, v, lengths):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / (d ** 0.5)
    mask = jnp.arange(k.shape[2])[None, None, None, :] < \
        lengths[:, None, None, None]
    p = jax.nn.softmax(jnp.where(mask, s, -1e30), axis=-1)
    return jnp.einsum("bhqk,bhkv->bhqv", p, v.astype(jnp.float32))


@pytest.mark.parametrize("b,h,s,d", [(8, 4, 256, 128), (8, 2, 300, 128)])
def test_float_cache_matches_oracle(b, h, s, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    lengths = jnp.arange(1, b + 1, dtype=jnp.int32) * (s // (b + 1))
    out = decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, lengths)),
                               rtol=0, atol=2e-3)


def test_int8_cache_matches_oracle():
    b, h, s, d = 8, 4, 333, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, h, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    kq, kc = quantize_kv(k)
    vq, vc = quantize_kv(v)
    lengths = jnp.array([7, 100, 333, 1, 50, 256, 8, 129], jnp.int32)
    out = decode_attention(q, kq, vq, lengths, kc=kc, vc=vc)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, lengths)),
                               rtol=0, atol=2e-2)


def test_length_one_attends_only_first():
    """lengths=1 -> output is exactly v[:, :, 0] (softmax over one position)."""
    b, h, s, d = 8, 2, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (b, h, 1, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    out = decode_attention(q, k, v, jnp.ones((b,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(v[:, :, 0]), rtol=0, atol=1e-5)


def test_decode_attention_large_batch_batched_dots():
    """B > 16 takes the batched-dot_general branch inside the kernel."""
    b, h, s, d = 20, 2, 256, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(k1, (b, h, 1, d), jnp.float32)
    kq, kc = quantize_kv(jax.random.normal(k2, (b, h, s, d), jnp.float32))
    vq, vc = quantize_kv(jax.random.normal(k3, (b, h, s, d), jnp.float32))
    lengths = (jnp.arange(b, dtype=jnp.int32) * 11) % (s - 8) + 8
    out = decode_attention(q, kq, vq, lengths, kc=kc, vc=vc)
    kd = kq.astype(jnp.float32) * kc / 127.0
    vd = vq.astype(jnp.float32) * vc / 127.0
    mask = jnp.arange(s)[None, None, None, :] < lengths[:, None, None, None]
    ref = scaled_dot_product_attention(q, kd, vd, mask=mask)
    assert float(jnp.max(jnp.abs(out - ref))) < 6e-3


def test_decode_attention_gqa_groups():
    """q with Hq = g*Hkv heads against an Hkv-head cache (kernel in
    interpret mode) == per-group reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from qgemm_tpu.models.attention import scaled_dot_product_attention
    from qgemm_tpu.ops.kv_cache import quantize_kv
    from qgemm_tpu.ops.pallas.decode_attention import decode_attention

    rng = np.random.default_rng(17)
    b, hkv, g, s, d = 3, 2, 4, 256, 64
    q = jnp.asarray(rng.normal(size=(b, hkv * g, 1, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, hkv, s, d)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, hkv, s, d)), jnp.float32)
    kq, kc = quantize_kv(kf)
    vq, vc = quantize_kv(vf)
    lengths = jnp.asarray([100, 256, 17], jnp.int32)

    got = decode_attention(q, kq, vq, lengths, kc=kc, vc=vc)
    kd = kq.astype(jnp.float32) * kc / 127.0
    vd = vq.astype(jnp.float32) * vc / 127.0
    mask = jnp.arange(s)[None, None, None, :] < lengths[:, None, None, None]
    ref = scaled_dot_product_attention(
        q, jnp.repeat(kd, g, axis=1), jnp.repeat(vd, g, axis=1), mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=6e-3, atol=6e-3)
