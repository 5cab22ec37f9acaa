"""Speculative (prompt-lookup) greedy decoding must be LOSSLESS: token
stream identical to plain greedy decode, positions/cache consistent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.runtime.decode_loop import decode_chunk
from llamago_tpu.runtime.kv_cache import KVCache
from llamago_tpu.runtime.speculative import assemble_tokens, speculative_decode_chunk

from conftest import random_ggjt_tensors


@pytest.fixture(scope="module")
def setup():
    from llamago_tpu.config import MODEL_PRESETS
    from llamago_tpu.models.llama import forward

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=256
    )
    tensors = random_ggjt_tensors(config, seed=11)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    return config, params


def _greedy_reference(config, params, prompt, n_tokens):
    from llamago_tpu.models.llama import forward

    cache = KVCache.create(config, batch=1)
    logits, cache = forward(
        params, prompt, cache, jnp.zeros(1, jnp.int32), config
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    pos = jnp.array([prompt.shape[1]], jnp.int32)
    toks, cache, pos, _, _ = decode_chunk(
        params, tok, cache, pos, config, n_tokens - 1
    )
    return [int(tok[0])] + [int(t) for t in np.asarray(toks)[0]]


def _speculative(config, params, prompt, n_tokens, draft_len=5):
    from llamago_tpu.models.llama import forward

    cache = KVCache.create(config, batch=1)
    logits, cache = forward(
        params, prompt, cache, jnp.zeros(1, jnp.int32), config
    )
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    plen = prompt.shape[1]
    pos = jnp.array([plen], jnp.int32)
    hist = jnp.zeros((1, config.max_seq_len), jnp.int32)
    hist = hist.at[0, :plen].set(prompt[0])
    hist = hist.at[0, plen].set(tok[0])
    hlen = jnp.array([plen + 1], jnp.int32)

    # enough steps to cover n_tokens even at 1 emit/step
    n_steps = n_tokens
    toks, counts, cache, pos, hist, hlen = speculative_decode_chunk(
        params, tok, cache, pos, hist, hlen, config,
        n_steps=n_steps, draft_len=draft_len,
    )
    emitted = [int(tok[0])] + assemble_tokens(toks[0], counts[0], limit=n_tokens - 1)
    return emitted, int(pos[0]), np.asarray(counts[0])


def test_speculative_matches_plain_greedy(setup):
    config, params = setup
    prompt = jnp.asarray([[3, 9, 2, 7, 9, 2, 7, 5]], jnp.int32)
    want = _greedy_reference(config, params, prompt, 40)
    got, _, _ = _speculative(config, params, prompt, 40)
    assert got == want


def test_speculative_positions_advance_by_counts(setup):
    config, params = setup
    prompt = jnp.asarray([[3, 9, 2, 7]], jnp.int32)
    _, pos, counts = _speculative(config, params, prompt, 24)
    assert pos == prompt.shape[1] + counts.sum()
    assert (counts >= 1).all()


def test_speculative_accepts_on_repetitive_text(setup):
    """A loopy prompt should produce real multi-token acceptances —
    otherwise the whole mechanism is dead weight."""
    config, params = setup
    pat = [5, 11, 23, 5, 11, 23, 5, 11, 23, 5, 11, 23]
    prompt = jnp.asarray([pat], jnp.int32)
    got, _, counts = _speculative(config, params, prompt, 32, draft_len=5)
    want = _greedy_reference(config, params, prompt, 32)
    assert got == want
    # greedy decode of random weights degenerates into repetition, which
    # prompt-lookup must exploit: at least one step accepts >1 token
    assert counts.max() > 1


def test_speculative_batch2(setup):
    config, params = setup
    prompts = [
        jnp.asarray([[3, 9, 2, 7, 9, 2]], jnp.int32),
        jnp.asarray([[12, 4, 4, 12, 4, 4]], jnp.int32),
    ]
    singles = [_speculative(config, params, p, 20)[0] for p in prompts]

    from llamago_tpu.models.llama import forward

    cache = KVCache.create(config, batch=2)
    both = jnp.concatenate(prompts, axis=0)
    logits, cache = forward(params, both, cache, jnp.zeros(2, jnp.int32), config)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    plen = both.shape[1]
    pos = jnp.full((2,), plen, jnp.int32)
    hist = jnp.zeros((2, config.max_seq_len), jnp.int32)
    hist = hist.at[:, :plen].set(both)
    hist = jax.vmap(lambda h, t, l: h.at[l].set(t))(
        hist, tok, jnp.full((2,), plen, jnp.int32)
    )
    hlen = jnp.full((2,), plen + 1, jnp.int32)
    toks, counts, *_ = speculative_decode_chunk(
        params, tok, cache, pos, hist, hlen, config, n_steps=20, draft_len=5
    )
    for b in range(2):
        got = [int(tok[b])] + assemble_tokens(toks[b], counts[b], limit=19)
        assert got == singles[b]


def test_engine_speculative_matches_plain(setup):
    """Engine with speculative=True emits the same greedy stream as the
    plain engine, including EOS/budget termination."""
    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Engine, JobStatus

    from conftest import make_test_vocab

    config, params = setup
    vocab = make_test_vocab()
    gen = GenerateConfig(max_tokens=24, ctx_size=128, temp=0.0)

    plain = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    spec = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64),
                  speculative=True, draft_len=5, decode_chunk_size=4)
    a = plain.generate("hello world", gen)
    b = spec.generate("hello world", gen)
    assert a.status == b.status == JobStatus.FINISHED
    assert a.output_tokens == b.output_tokens


def test_engine_speculative_skips_sampled_jobs(setup):
    """temp>0 jobs must take the exact sampling path, not speculative."""
    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Engine, JobStatus

    from conftest import make_test_vocab

    config, params = setup
    vocab = make_test_vocab()
    gen = GenerateConfig(max_tokens=10, ctx_size=128, temp=0.8, seed=3)
    spec = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64),
                  speculative=True, decode_chunk_size=4)
    plain = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = spec.generate("hello", gen)
    b = plain.generate("hello", gen)
    assert a.status == JobStatus.FINISHED
    assert a.output_tokens == b.output_tokens


def test_spec_gate_yields_to_chunked_on_low_acceptance(setup):
    """Adaptive gate (VERDICT r2 #6): when every active slot's acceptance
    EMA is below the threshold, _spec_steps returns 0 (chunked decode
    runs instead) except for periodic 1-step re-probes."""
    import numpy as np

    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Engine

    from conftest import make_test_vocab

    config, params = setup
    vocab = make_test_vocab()
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64),
                 speculative=True, draft_len=5, decode_chunk_size=4)
    gen = GenerateConfig(max_tokens=64, ctx_size=128, temp=0.0)
    for i in range(2):
        eng.slots[i].job = __import__(
            "llamago_tpu.runtime.engine", fromlist=["Job"]
        ).Job(id=str(i), prompt="x", gen=gen)
        eng.slots[i].history = [1, 2, 3]
        eng.slots[i].pos = 3
        eng.slots[i].remaining = 64
    active = np.array([True, True])
    temp = np.zeros(2, np.float32)

    # healthy acceptance -> full rung
    eng.spec_accept_ema[:] = 3.0
    assert eng._spec_steps(active, temp) == 4

    # collapsed acceptance -> gated off, with a 1-step probe first
    # (countdown starts at 0) and then spec_probe_interval gated steps
    eng.spec_accept_ema[:] = 0.2
    assert eng._spec_steps(active, temp) == 1  # probe
    for _ in range(eng.spec_probe_interval):
        assert eng._spec_steps(active, temp) == 0
    assert eng._spec_steps(active, temp) == 1  # next probe

    # ONE slot recovering is enough to re-engage (it drags the batch,
    # but speculation is batch-wide and lossless)
    eng.spec_accept_ema[0] = 3.0
    assert eng._spec_steps(active, temp) == 4


def test_spec_gate_ema_updates_and_probes_reopen(setup):
    """_decode_speculative must feed the EMA. New admissions INHERIT the
    slot's acceptance EMA (a per-admit optimistic reset forced a
    speculative burst per job and halved served throughput under churn —
    see engine._admit); a closed gate re-opens only via the periodic
    1-step probes when the traffic proves repetitive."""
    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Engine

    from conftest import make_test_vocab

    config, params = setup
    vocab = make_test_vocab()
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64),
                 speculative=True, draft_len=5, decode_chunk_size=4)
    assert eng.spec_accept_ema[0] == 5.0  # optimistic prior = draft_len
    gen = GenerateConfig(max_tokens=24, ctx_size=128, temp=0.0)
    eng.generate("hello world", gen)
    moved = eng.spec_accept_ema[0]
    assert moved != 5.0  # at least one speculative chunk updated it

    # a fresh admission INHERITS the slot EMA (no optimistic reset) —
    # observe the EMA immediately after _admit runs, where a
    # reintroduced per-admit reset would show up as draft_len
    eng.spec_accept_ema[0] = 0.0
    eng._spec_probe_countdown = 2  # force at least one probe this job
    ema_at_admit = []
    orig_admit = eng._admit

    def spy_admit(slot_idx, job):
        orig_admit(slot_idx, job)
        ema_at_admit.append(float(eng.spec_accept_ema[slot_idx]))

    eng._admit = spy_admit
    eng.generate("something else entirely", gen)
    assert ema_at_admit == [0.0]  # inherited, NOT reset to draft_len
    # thereafter only probe steps may move it, with real acceptance
    ema = float(eng.spec_accept_ema[0])
    assert 0.0 <= ema < 5.0


def test_engine_speculative_with_context_swap(setup):
    """Long generation through a small context: speculative engine must
    survive swaps and still match the plain engine exactly."""
    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Engine, JobStatus

    from conftest import make_test_vocab

    config, params = setup
    vocab = make_test_vocab()
    gen = GenerateConfig(max_tokens=60, ctx_size=32, temp=0.0)
    spec = Engine(config, params, vocab, slots=1, buckets=(16, 32),
                  speculative=True, draft_len=3, decode_chunk_size=2)
    plain = Engine(config, params, vocab, slots=1, buckets=(16, 32))
    a = spec.generate("hello world", gen)
    b = plain.generate("hello world", gen)
    assert a.status == b.status == JobStatus.FINISHED
    assert a.output_tokens == b.output_tokens
    assert spec.slots[0].swap_point is not None  # a swap really happened
