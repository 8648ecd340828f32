"""Coverage for the small leaf modules: Embedding (+sinusoidal positions),
PRNG plumbing (reference: op_uniform_init / randgen_seed), and the timing
harness used by every benchmark."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qgemm_tpu.models.embedding import Embedding, sinusoidal_positions
from qgemm_tpu.utils.prng import key_seq, uniform_init
from qgemm_tpu.utils import profiling


# --------------------------------------------------------------- embedding

def test_sinusoidal_table_values():
    d = 8
    tab = np.asarray(sinusoidal_positions(16, d))
    pos = np.arange(16)[:, None].astype(np.float64)
    inv_freq = 1.0 / 10000.0 ** (np.arange(0, d, 2) / d)
    np.testing.assert_allclose(tab[:, 0::2], np.sin(pos * inv_freq), atol=1e-6)
    np.testing.assert_allclose(tab[:, 1::2], np.cos(pos * inv_freq), atol=1e-6)
    # position 0 is [0,1,0,1,...]
    np.testing.assert_allclose(tab[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(tab[0, 1::2], 1.0, atol=1e-7)


def test_embedding_offset_matches_full_sequence():
    """Decode-style embedding (one token at position t) must equal the
    corresponding slice of the full-sequence embedding — the invariant the
    KV-cache generation loop relies on."""
    emb = Embedding.init(jax.random.PRNGKey(0), vocab_size=50, d_model=16,
                         max_len=32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 7), 0, 50)
    full = emb(tokens)
    for t in range(7):
        step = emb(tokens[:, t:t + 1], offset=t)
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full[:, t]), atol=1e-6)


def test_embedding_is_pytree():
    emb = Embedding.init(jax.random.PRNGKey(0), 10, 4, 8)
    leaves = jax.tree_util.tree_leaves(emb)
    assert len(leaves) == 2
    # survives a jit boundary as an argument
    out = jax.jit(lambda e, t: e(t))(emb, jnp.zeros((1, 3), jnp.int32))
    assert out.shape == (1, 3, 4)


# -------------------------------------------------------------------- prng

def test_key_seq_deterministic_and_distinct():
    a = key_seq(7)
    b = key_seq(7)
    ka = [next(a) for _ in range(4)]
    kb = [next(b) for _ in range(4)]
    for x, y in zip(ka, kb):
        assert jnp.array_equal(jax.random.key_data(x), jax.random.key_data(y))
    datas = {tuple(np.asarray(jax.random.key_data(k)).ravel()) for k in ka}
    assert len(datas) == 4  # never reused


def test_uniform_init_bound_and_seed():
    w = uniform_init(jax.random.PRNGKey(3), (256, 256), 0.25)
    assert float(jnp.max(jnp.abs(w))) <= 0.25
    assert float(jnp.max(jnp.abs(w))) > 0.2  # actually fills the range
    w2 = uniform_init(jax.random.PRNGKey(3), (256, 256), 0.25)
    assert jnp.array_equal(w, w2)


# --------------------------------------------------------------- profiling

def test_bench_ms_positive_and_scales():
    x = jnp.ones((64, 64))

    def f(a):
        return a @ a

    ms = profiling.bench_ms(f, x, iters=30, base=5, repeats=2)
    assert 0 < ms < 1e3

    def f10(a):
        for _ in range(20):
            a = a @ a
        return a

    ms20 = profiling.bench_ms(f10, x, iters=30, base=5, repeats=2)
    assert ms20 > ms  # 20x the work must not time faster


def test_bench_ms_defeats_dce():
    """A function whose output were dead would time at ~0; the carry chain
    must keep it alive."""
    x = jnp.ones((128, 128))
    ms_mm = profiling.bench_ms(lambda a: (a @ a) @ (a @ a), x,
                               iters=40, base=5, repeats=2)
    ms_id = profiling.bench_ms(lambda a: a, x, iters=40, base=5, repeats=2)
    assert ms_mm > ms_id


def test_flops_per_sec():
    assert profiling.flops_per_sec(1.0, 2 * 10 ** 9) == pytest.approx(2e12)


def test_trace_context(tmp_path):
    with profiling.trace(str(tmp_path)):
        jnp.ones((8, 8)).block_until_ready()
    # profiler must have written a trace directory
    assert any(tmp_path.iterdir())
