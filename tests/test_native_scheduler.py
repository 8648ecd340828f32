"""Native C++ scheduler (csrc/scheduler.cpp) vs the pure-Python bookkeeper:
identical transcripts for the same workload, plus unit tests of the C ABI."""

import numpy as np
import pytest

import jax

from qgemm_tpu.models.gpt import GPT, GPTConfig
from qgemm_tpu.serving import native
from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libqgemm_sched.so not built "
                                       "(make -C csrc)")

CFG = GPTConfig(vocab_size=89, d_model=32, n_heads=4, d_ff=64, n_layers=2,
                max_seq_len=48)


def _reqs():
    rng = np.random.default_rng(3)
    return [Request(prompt=[int(t) for t in
                            rng.integers(0, CFG.vocab_size, int(n))],
                    max_new_tokens=int(m))
            for n, m in [(3, 5), (7, 2), (2, 9), (5, 1), (4, 6)]]


def test_native_matches_python_engine():
    model = GPT.init(CFG, key=jax.random.PRNGKey(0))
    results = {}
    for sched in ("python", "native"):
        eng = ContinuousBatchingEngine(model, max_slots=2, scheduler=sched)
        for r in _reqs():
            eng.submit(r)
        fin = eng.run_to_completion()
        results[sched] = sorted((r.prompt[0], tuple(r.generated))
                                for r in fin)
        assert all(r.done for r in fin)
        assert len(fin) == 5
    assert results["python"] == results["native"]


def test_scheduler_abi_roundtrip():
    s = native.NativeScheduler(max_slots=2, max_seq_len=16)
    s.submit(10, [1, 2, 3], max_new_tokens=3)
    s.submit(11, [4, 5], max_new_tokens=2, eos_token=99)
    s.submit(12, [6], max_new_tokens=4)
    assert s.num_waiting == 3

    slot, rid, prompt = s.next_admission()
    assert (slot, rid, prompt.tolist()) == (0, 10, [1, 2, 3])
    s.admitted(slot, 40)
    slot2, rid2, prompt2 = s.next_admission()
    assert (slot2, rid2, prompt2.tolist()) == (1, 11, [4, 5])
    s.admitted(slot2, 41)
    assert s.next_admission() is None  # both slots busy
    assert s.num_active == 2 and s.num_waiting == 1
    assert s.positions().tolist() == [3, 2]
    assert s.active_mask().tolist() == [True, True]

    s.record_step(np.asarray([50, 99], np.int32))   # slot1 hits EOS
    assert s.num_finished == 1 and s.num_active == 1
    rid_f, toks = s.pop_finished()
    assert rid_f == 11 and toks.tolist() == [41, 99]

    # freed slot admits the waiting request
    slot3, rid3, _ = s.next_admission()
    assert slot3 == 1 and rid3 == 12
    s.admitted(slot3, 60)
    s.record_step(np.asarray([51, 61], np.int32))   # slot0: 3rd tok -> done
    assert s.num_finished == 1
    rid_f, toks = s.pop_finished()
    assert rid_f == 10 and toks.tolist() == [40, 50, 51]
    assert s.steps == 2


def test_scheduler_rejects_oversize():
    s = native.NativeScheduler(max_slots=1, max_seq_len=8)
    with pytest.raises(ValueError):
        s.submit(1, [0] * 6, max_new_tokens=4)


def test_record_block_matches_python_bookkeeper():
    """qg_sched_record_block: per-slot variable-length accepted blocks with
    EOS/max_new truncation — the native scheduler serves SPECULATIVE
    engines with transcripts and logprobs identical to the python
    bookkeeper."""
    import jax

    from qgemm_tpu.models.gpt import GPT, GPTConfig
    from qgemm_tpu.serving.engine import ContinuousBatchingEngine, Request

    cfg = GPTConfig(vocab_size=97, d_model=32, n_heads=4, d_ff=64,
                    n_layers=2, max_seq_len=64)
    m = GPT.init(cfg, key=jax.random.PRNGKey(0))
    probe = ContinuousBatchingEngine(m, max_slots=1)
    pr = Request(prompt=[5, 6], max_new_tokens=6)
    probe.submit(pr)
    probe.run_to_completion(max_steps=20)
    eos = pr.generated[3]

    def run(sched):
        eng = ContinuousBatchingEngine(m, max_slots=2, draft_model=m,
                                       spec_gamma=3, scheduler=sched)
        reqs = [Request(prompt=[5 + i, 6], max_new_tokens=8,
                        eos_token=eos if i == 0 else None, logprobs=True)
                for i in range(3)]
        for r in reqs:
            eng.submit(r)
        fin = {r.id: r for r in eng.run_to_completion(max_steps=100)}
        assert eng.scheduler == sched
        return [(tuple(fin[r.id].generated),
                 tuple(round(x, 5) for x in fin[r.id].token_logprobs),
                 fin[r.id].error) for r in reqs]

    assert run("native") == run("python")
