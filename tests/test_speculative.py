"""Speculative decoding: exact greedy-target transcripts for ANY draft."""

import jax
import jax.numpy as jnp
import numpy as np

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.serving.speculative import speculative_generate

CFG = GPTConfig(vocab_size=97, d_model=64, n_heads=4, d_ff=128, n_layers=2,
                max_seq_len=128)


def _model(seed):
    return GPT.init(CFG, key=jax.random.PRNGKey(seed))


def test_self_draft_exact_and_minimal_rounds():
    """Draft == target: every proposal accepted — transcript identical to
    plain greedy generate and rounds collapse to ~max_new/(gamma+1)."""
    m = _model(0)
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    n, gamma = 24, 4
    ref = np.asarray(m.generate(prompt, n))[0]
    res = speculative_generate(m, m, prompt, n, gamma=gamma)
    assert np.asarray(res.tokens).tolist() == ref.tolist()
    body_rounds = int(res.rounds) - 1
    assert body_rounds <= -(-(n - 1) // (gamma + 1)) + 1, int(res.rounds)
    assert int(res.accepted) == body_rounds * gamma  # all accepted


def test_arbitrary_draft_still_exact():
    """A DIFFERENT (random) draft must not change the transcript — only
    the number of rounds (the exactness property of greedy speculative
    decoding: disagreements truncate to the target's own token)."""
    target, draft = _model(1), _model(2)
    prompt = jnp.asarray([[7, 8, 9]])
    n = 16
    ref = np.asarray(target.generate(prompt, n))[0]
    res = speculative_generate(target, draft, prompt, n, gamma=3)
    assert np.asarray(res.tokens).tolist() == ref.tolist()
    # an unrelated draft agrees ~never: roughly one token per round
    assert int(res.rounds) >= n // 2


def test_quantization_self_speculation():
    """The practical draft: a W4A8 copy of the target. Transcript stays
    the target's exactly; acceptance is whatever quantization agreement
    buys (a property check, not a fixed number, on random weights)."""
    target = _model(3)
    draft = target.quantize(bits=4)
    prompt = jnp.asarray([[11, 22, 33]])
    n = 16
    ref = np.asarray(target.generate(prompt, n))[0]
    res = speculative_generate(target, draft, prompt, n, gamma=3)
    assert np.asarray(res.tokens).tolist() == ref.tolist()
    assert 0 <= int(res.accepted) <= int(res.drafted)


def test_eos_stops_and_pins():
    """eos_token: the transcript is truncated at the target's first EOS
    (even mid-accepted-block) and pinned after it, like generate's
    padded-decode contract."""
    m = _model(4)
    prompt = jnp.asarray([[2, 7, 1]])
    n = 12
    ref = np.asarray(m.generate(prompt, n))[0]
    eos = int(ref[3])                     # force an EOS at position 3
    res = speculative_generate(m, m, prompt, n, gamma=4, eos_token=eos)
    toks = np.asarray(res.tokens)
    # prefix matches the target transcript through the first eos
    k = list(ref).index(eos)
    assert toks[:k + 1].tolist() == ref[:k + 1].tolist(), (toks, ref, eos)
    assert (toks[k:] == eos).all(), toks
    assert int(res.rounds) <= 3           # stopped early


def test_speculative_with_gqa_target():
    """Speculation composes with GQA (prefill_chunk / decode_step carry
    the grouped cache paths)."""
    cfg = GPTConfig(vocab_size=97, d_model=64, n_heads=8, n_kv_heads=2,
                    d_ff=128, n_layers=2, max_seq_len=128)
    m = GPT.init(cfg, key=jax.random.PRNGKey(6))
    prompt = jnp.asarray([[4, 5, 6]])
    ref = np.asarray(m.generate(prompt, 10))[0]
    res = speculative_generate(m, m, prompt, 10, gamma=3)
    assert np.asarray(res.tokens).tolist() == ref.tolist()
