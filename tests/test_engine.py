"""Engine tests: generation loop, context swap, multi-slot independence,
job lifecycle (reference behaviors: pkg/server/server.go:110-278)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import GenerateConfig
from llamago_tpu.runtime.engine import Engine, JobStatus

from conftest import make_test_vocab, random_ggjt_tensors


@pytest.fixture(scope="module")
def engine_setup():
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=3)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), host_parameters(config, tensors)
    )
    vocab = make_test_vocab()
    return config, params, vocab


GREEDY = GenerateConfig(max_tokens=10, ctx_size=64, temp=0.0)


def test_greedy_generation_completes(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    job = eng.generate("hello world", GREEDY)
    assert job.status == JobStatus.FINISHED
    assert len(job.output_tokens) == 10
    assert job.prompt_tokens > 0
    assert job.ttft_ms > 0
    assert job.tokens_per_second > 0
    assert job.finished >= job.started >= job.created


def test_greedy_is_deterministic(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = eng.generate("hello world", GREEDY).output_tokens
    b = eng.generate("hello world", GREEDY).output_tokens
    assert a == b


def test_sampled_with_seed_is_deterministic(engine_setup):
    config, params, vocab = engine_setup
    gen = GenerateConfig(max_tokens=10, ctx_size=64, temp=0.8, seed=7)
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = eng.generate("hello", gen).output_tokens
    b = eng.generate("hello", gen).output_tokens
    assert a == b


def test_multi_slot_matches_single_slot_greedy(engine_setup):
    """Jobs decoded concurrently in a slot batch must produce exactly the
    tokens they'd produce alone (pods-isolation parity)."""
    config, params, vocab = engine_setup
    solo = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    ja = solo.generate("hello world", GREEDY)
    jb = solo.generate("world", GREEDY)

    duo = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    a = duo.submit("hello world", GREEDY)
    b = duo.submit("world", GREEDY)
    while a.status in ("queued", "processing") or b.status in ("queued", "processing"):
        duo.step()
    assert a.status == JobStatus.FINISHED and b.status == JobStatus.FINISHED
    assert a.output_tokens == ja.output_tokens
    assert b.output_tokens == jb.output_tokens


def test_context_swap_generates_past_context(engine_setup):
    """With ctx 32 and 40 tokens to generate, the swap must kick in and
    generation still completes ('infinite generation', server.go:160-172)."""
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    gen = GenerateConfig(max_tokens=40, ctx_size=32, temp=0.0)
    job = eng.generate("hello world", gen)
    assert job.status == JobStatus.FINISHED
    assert len(job.output_tokens) == 40


def test_context_swap_keep_count(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    gen = GenerateConfig(max_tokens=40, ctx_size=32, temp=0.0, keep_count=4)
    job = eng.generate("hello world", gen)
    assert job.status == JobStatus.FINISHED
    assert len(job.output_tokens) == 40


def test_prompt_too_long_fails_cleanly(engine_setup):
    """The reference leaves failed jobs stuck in 'processing'
    (server.go:176 TODO); we fail them explicitly."""
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    job = eng.generate("hello " * 200, GenerateConfig(max_tokens=5, ctx_size=32))
    assert job.status == JobStatus.FAILED
    assert "too long" in job.error


def test_output_excludes_prompt_and_is_trimmed(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    job = eng.generate("hello world", GREEDY)
    # output is detok of generated ids only (reference: server.go:222-244)
    assert job.output == job.output.strip()
    assert len(job.output_tokens) == 10


def test_queue_overflow_waits_for_free_slot(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = eng.submit("hello", GREEDY)
    b = eng.submit("world", GREEDY)
    for _ in range(200):
        if b.status == JobStatus.FINISHED:
            break
        eng.step()
    assert a.status == JobStatus.FINISHED
    assert b.status == JobStatus.FINISHED


def test_engine_loop_survives_eval_failure(engine_setup, monkeypatch):
    """A failed eval marks in-flight jobs FAILED and the loop keeps
    serving (the reference leaves them stuck in processing,
    server.go:176-177)."""
    import llamago_tpu.runtime.engine as eng_mod

    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))

    real_prefill = eng_mod.prefill_into_slot
    monkeypatch.setattr(
        eng_mod, "prefill_into_slot",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    job = eng.submit("hello", GREEDY)
    try:
        eng._expire_deadlines()
        eng.step()
    except RuntimeError as exc:
        eng._fail_active(exc)
    assert job.status == JobStatus.FAILED
    assert "boom" in job.error
    assert job.finished > 0

    # engine still serves new jobs afterwards
    monkeypatch.setattr(eng_mod, "prefill_into_slot", real_prefill)
    ok = eng.generate("hello", GREEDY)
    assert ok.status == JobStatus.FINISHED


def test_job_deadline_expires(engine_setup):
    """deadline_s fails long jobs (the reference's unwritten background
    watcher, server.go:55)."""
    import time

    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    gen = GREEDY.replace(max_tokens=1000, deadline_s=1e-9)
    job = eng.submit("hello", gen)
    eng.step()  # admit + first step
    time.sleep(0.01)
    eng._expire_deadlines()
    assert job.status == JobStatus.FAILED
    assert "deadline" in job.error


def test_warmup_compiles_and_leaves_clean_state(engine_setup):
    eng_mod = Engine  # noqa: F841
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64),
                 decode_chunk_size=2)
    secs = eng.warmup()
    assert secs > 0
    # engine still produces the same deterministic output after warmup
    a = eng.generate("hello world", GREEDY)
    fresh = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    b = fresh.generate("hello world", GREEDY)
    assert a.output_tokens == b.output_tokens


def test_prefix_cache_reuses_common_prompt(engine_setup):
    """A chat-style continuation (prompt = previous prompt + output + more)
    reuses the slot's cached KV and produces identical tokens to a cold
    engine."""
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    first = eng.generate("hello world", GREEDY)
    assert first.reused_tokens == 0

    # same prompt again -> all but the last prompt token reused
    again = eng.generate("hello world", GREEDY)
    assert again.reused_tokens == again.prompt_tokens - 1
    assert again.output_tokens == first.output_tokens

    # a different prompt must not reuse beyond the shared prefix
    cold = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = eng.generate("hello hello", GREEDY)
    b = cold.generate("hello hello", GREEDY)
    assert a.output_tokens == b.output_tokens


def test_prefix_cache_disabled_after_context_swap(engine_setup):
    """After a swap the cache rows no longer mirror history positions —
    reuse must be capped at the swap point."""
    config, params, vocab = engine_setup
    gen = GenerateConfig(max_tokens=80, ctx_size=32, temp=0.0)
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32))
    job = eng.generate("hello world", gen)
    assert job.status == JobStatus.FINISHED
    slot = eng.slots[0]
    assert slot.swap_point is not None
    nxt = eng.generate("hello world", gen)
    assert nxt.reused_tokens <= slot.swap_point if slot.swap_point else True
    # and outputs still match a cold engine
    cold = Engine(config, params, vocab, slots=1, buckets=(16, 32))
    assert nxt.output_tokens == cold.generate("hello world", gen).output_tokens


def test_layered_engine_matches_stacked(engine_setup):
    """Engine on unstacked+fused weights (the single-chip fast path the
    CLI builds) produces identical outputs to the stacked-scan engine."""
    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights,
        unstack_layer_params,
    )

    config, params, vocab = engine_setup
    layered = fuse_layer_weights(
        unstack_layer_params(jax.tree.map(lambda x: x, params), config.n_layers)
    )
    eng_l = Engine(config, layered, vocab, slots=2, buckets=(16, 32, 64),
                   decode_chunk_size=4)
    assert eng_l.cache.layered
    eng_s = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    assert not eng_s.cache.layered

    a = eng_l.generate("hello world", GREEDY)
    b = eng_s.generate("hello world", GREEDY)
    assert a.status == b.status == JobStatus.FINISHED
    assert a.output_tokens == b.output_tokens

    gen = GenerateConfig(max_tokens=10, ctx_size=64, temp=0.8, seed=5)
    assert eng_l.generate("hi", gen).output_tokens == \
        eng_s.generate("hi", gen).output_tokens


def test_layered_engine_speculative(engine_setup):
    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights,
        unstack_layer_params,
    )

    config, params, vocab = engine_setup
    layered = fuse_layer_weights(
        unstack_layer_params(jax.tree.map(lambda x: x, params), config.n_layers)
    )
    spec = Engine(config, layered, vocab, slots=1, buckets=(16, 32, 64),
                  speculative=True, draft_len=4, decode_chunk_size=4)
    plain = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    a = spec.generate("hello world", GREEDY)
    b = plain.generate("hello world", GREEDY)
    assert a.output_tokens == b.output_tokens


def test_embed_routed_direct_when_single_process(engine_setup):
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    direct, n1 = eng.embed("hello world")
    routed, n2 = eng.embed_routed("hello world")
    assert n1 == n2
    assert np.allclose(direct, routed)


def test_embed_routed_queues_under_lockstep(engine_setup):
    """Under lockstep admission, embed_routed must NOT touch the device
    from the caller thread (that is the multi-host deadlock, r4 VERDICT
    #4b): it queues, and the tick loop (drain -> broadcast -> run) both
    computes and delivers the result."""
    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    want, _ = eng.embed("hello world")
    eng.enable_lockstep_admission()

    got = {}
    t = threading.Thread(
        target=lambda: got.update(zip(("emb", "n"),
                                      eng.embed_routed("hello world"))))
    t.start()
    # simulate the serve_lockstep tick: drain on the primary, run on all
    for _ in range(100):
        reqs = eng.drain_embeds()
        if reqs:
            assert reqs[0]["text"] == "hello world"
            eng.run_embeds(reqs)
            break
        time.sleep(0.02)
    t.join(timeout=30)
    assert not t.is_alive()
    assert got["n"] > 0 and np.allclose(got["emb"], want)

    # input errors are delivered to the waiter, not swallowed
    err = {}

    def too_long():
        try:
            eng.embed_routed("x " * 500)
        except ValueError as e:
            err["e"] = e

    t2 = threading.Thread(target=too_long)
    t2.start()
    for _ in range(100):
        reqs = eng.drain_embeds()
        if reqs:
            eng.run_embeds(reqs)
            break
        time.sleep(0.02)
    t2.join(timeout=30)
    assert "exceeds the largest prefill bucket" in str(err["e"])


def test_warmup_covers_embed_programs(engine_setup):
    """warmup(include_embed=True) pre-compiles the per-bucket embed
    programs, so the first /v1/embeddings request never pays a
    mid-traffic compile (r4 VERDICT #5). Verified via jax's compile log:
    zero new compilations during the post-warmup embed call."""
    import logging

    config, params, vocab = engine_setup
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    eng.warmup()

    import jax

    logger = logging.getLogger("jax._src.dispatch")
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    old_level = logger.level
    logger.addHandler(handler)
    logger.setLevel(logging.DEBUG)
    try:
        jax.config.update("jax_log_compiles", True)
        emb, n = eng.embed("hello world")
    finally:
        jax.config.update("jax_log_compiles", False)
        logger.removeHandler(handler)
        logger.setLevel(old_level)
    compiles = [r.getMessage() for r in records
                if "compil" in r.getMessage().lower()]
    assert not compiles, compiles
    assert n > 0 and emb.shape == (config.dim,)
