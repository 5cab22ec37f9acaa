"""Regression tests for round-2 correctness fixes.

Covers:
  * free-slot prefix caches surviving co-tenant decode (inactive batch
    rows used to be fed position 0, clobbering rows 0..n of freed slots);
  * prefix-reuse prefill near the context limit (the padded suffix bucket
    used to clamp inside lax.dynamic_update_slice and overwrite reused
    rows);
  * per-request repeat_last_n (the penalty window used to be hardwired to
    max_seq_len; reference sizes its ring per request, main.go:89);
  * chunked admission prefill (one long prompt must not freeze co-tenant
    decode — the reference's pod isolation, server.go:84-106);
  * prompts longer than the largest prefill bucket (used to crash on the
    numpy pad assignment);
  * arbitrary top-k beyond the old silent 128 clamp (reference sorts the
    full vocab, llama.go:548-565);
  * Q4_1 'm' (block mins) surviving fuse_layer_weights (used to be
    silently dropped, dequantizing with Q4_0 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import GenerateConfig
from llamago_tpu.runtime.engine import Engine, JobStatus

from conftest import make_test_vocab, random_ggjt_tensors


@pytest.fixture(scope="module")
def setup():
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=3)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    return config, params, make_test_vocab()


GREEDY = GenerateConfig(max_tokens=10, ctx_size=64, temp=0.0)


def _drain(eng, *jobs, max_steps=500):
    for _ in range(max_steps):
        if all(j.status not in (JobStatus.QUEUED, JobStatus.PROCESSING)
               for j in jobs):
            return
        eng.step()
    raise AssertionError("jobs did not finish")


def test_free_slot_prefix_cache_survives_cotenant_decode(setup):
    """Slot 0's job finishes; slot 1 keeps decoding (whose batched forward
    also writes K/V for the inactive row 0); re-admitting slot 0's prompt
    reuses its cached prefix — which must still be intact."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    a = eng.submit("hello world", GREEDY.replace(max_tokens=2))
    b = eng.submit("world", GREEDY.replace(max_tokens=25))
    _drain(eng, a, b)
    assert a.status == b.status == JobStatus.FINISHED

    again = eng.submit("hello world", GREEDY)
    _drain(eng, again)
    assert again.reused_tokens >= 1  # prefix cache actually engaged

    cold = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    ref = cold.generate("hello world", GREEDY)
    assert again.output_tokens == ref.output_tokens


def test_free_slot_cache_survives_chunked_cotenant_decode(setup):
    """Same property under the on-device chunked decode path (writes
    n_chunk+1 rows per call for every batch row)."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64),
                 decode_chunk_size=4)
    a = eng.submit("hello world", GREEDY.replace(max_tokens=2))
    b = eng.submit("world", GREEDY.replace(max_tokens=25))
    _drain(eng, a, b)

    again = eng.submit("hello world", GREEDY)
    _drain(eng, again)
    assert again.reused_tokens >= 1

    cold = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64))
    assert again.output_tokens == cold.generate("hello world", GREEDY).output_tokens


def test_prefix_reuse_near_context_limit(setup):
    """Readmission with a long shared prefix near max_seq_len: the padded
    suffix bucket must not overrun the cache (reuse shrinks instead)."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    p1 = "hello" * 56  # " hello"*56 + BOS = 57 ids
    first = eng.generate(p1, GenerateConfig(max_tokens=1, ctx_size=64, temp=0.0))
    assert first.status == JobStatus.FINISHED
    assert first.prompt_tokens >= 50

    p2 = p1 + " world"  # shares all 57 ids, adds a tail near the limit
    gen = GenerateConfig(max_tokens=3, ctx_size=64, temp=0.0)
    second = eng.generate(p2, gen)
    assert second.status == JobStatus.FINISHED
    # guard must have kicked in: reuse + bucket(suffix) <= 64
    bucket = 16
    assert second.reused_tokens + bucket <= config.max_seq_len

    cold = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    ref = cold.generate(p2, gen)
    assert second.output_tokens == ref.output_tokens


def test_repeat_last_n_sampler_window():
    """Per-slot window: tokens older than repeat_last_n stop counting."""
    from llamago_tpu.ops.sampling import SamplerState, push_tokens, reset_slots

    st = SamplerState.create(batch=1, window=8, vocab_size=16)
    st = reset_slots(st, jnp.array([True]), jnp.array([2], jnp.int32))
    st = push_tokens(st, jnp.array([[5, 6, 7]], jnp.int32), jnp.array([True]))
    counts = np.asarray(st.counts[0])
    assert counts[5] == 0  # evicted: outside the 2-token window
    assert counts[6] == 1 and counts[7] == 1
    assert int(st.window[0]) == 2


def test_repeat_last_n_wired_from_request(setup):
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    gen = GREEDY.replace(repeat_last_n=4, max_tokens=2)
    job = eng.generate("hello", gen)
    assert job.status == JobStatus.FINISHED
    assert int(eng.sampler_state.window[0]) == 4


def test_long_admission_does_not_block_cotenant_decode(setup):
    """Pod isolation: while a long prompt is absorbed chunk-by-chunk, the
    other slot keeps emitting tokens every step."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64),
                 prefill_chunk=16)
    a = eng.submit("hello", GREEDY.replace(max_tokens=40))
    eng.step()  # admit + prefill A (short prompt: single chunk)
    eng.step()  # A decodes
    n_before = len(a.output_tokens)
    assert n_before >= 1

    b = eng.submit("hello" * 50, GREEDY.replace(max_tokens=2))  # 51 ids, 4 chunks
    interleaved = 0
    for _ in range(4):
        prev = len(a.output_tokens)
        eng.step()
        slot_b = next(s for s in eng.slots if s.job is b)
        if slot_b.pending and len(a.output_tokens) > prev:
            interleaved += 1
    # A emitted tokens during steps where B's prefill was still pending
    assert interleaved >= 2
    _drain(eng, a, b)
    assert a.status == b.status == JobStatus.FINISHED

    # and B's output is unaffected by the interleaving
    cold = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    ref = cold.generate("hello" * 50, GREEDY.replace(max_tokens=2))
    assert b.output_tokens == ref.output_tokens


def test_prompt_longer_than_largest_bucket(setup):
    """Prompts beyond the largest bucket prefill in segments instead of
    crashing (old behavior: numpy pad assignment ValueError)."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32))
    gen = GenerateConfig(max_tokens=3, ctx_size=64, temp=0.0)
    job = eng.generate("hello" * 40, gen)  # 41 ids > bucket 32
    assert job.status == JobStatus.FINISHED
    big = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    assert job.output_tokens == big.generate("hello" * 40, gen).output_tokens


def test_arbitrary_top_k_beyond_128(setup):
    """top_k > 128 keeps exactly top_k candidates (old code silently
    clamped at 128; the reference sorts the full vocab)."""
    from llamago_tpu.ops.sampling import SamplerState, sample_impl

    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16,))
    assert eng._static_top_k(np.array([40]), np.array([True])) == 128
    assert eng._static_top_k(np.array([300]), np.array([True])) == 512
    assert eng._static_top_k(np.array([5000]), np.array([True])) == \
        config.vocab_size

    v = 512
    st = SamplerState.create(1, 8, v)
    logits = jnp.asarray(np.linspace(5.0, -5.0, v)[None, :], jnp.float32)
    _, (probs, _) = sample_impl(
        jax.random.PRNGKey(0), logits, st,
        temp=jnp.array([1.0]), top_k=jnp.array([300], jnp.int32),
        top_p=jnp.array([1.0]), repeat_penalty=jnp.array([1.0]),
        max_top_k=512, return_probs=True,
    )
    assert int((np.asarray(probs[0]) > 0).sum()) == 300


def test_q4_1_mins_survive_weight_fusion():
    """fuse_layer_weights must carry the Q4_1 'm' leaf: fused dequant ==
    concatenated per-part dequant."""
    from llamago_tpu.checkpoint.params import _concat_weights
    from llamago_tpu.checkpoint.quant_file import quantize_array, to_device_leaf
    from llamago_tpu.ops.quant import dequantize

    rng = np.random.default_rng(11)
    xa = (rng.standard_normal((32, 64)) * 0.05 + 0.01).astype(np.float32)
    xb = (rng.standard_normal((48, 64)) * 0.05 - 0.02).astype(np.float32)
    la = {k: jnp.asarray(v) for k, v in to_device_leaf(quantize_array(xa, "q4_1")).items()}
    lb = {k: jnp.asarray(v) for k, v in to_device_leaf(quantize_array(xb, "q4_1")).items()}
    want = np.concatenate(
        [np.asarray(dequantize(la)), np.asarray(dequantize(lb))], axis=-1
    )
    fused = _concat_weights([dict(la), dict(lb)])
    assert "m" in fused
    np.testing.assert_allclose(np.asarray(dequantize(fused)), want, rtol=1e-6)


def test_q4_1_engine_with_fused_weights(tiny_config, test_vocab, tmp_path):
    """End-to-end: a Q4_1 file served through the CLI's single-chip path
    (unstack + fuse) matches the unfused forward."""
    from test_ggjt import padded_vocab

    from llamago_tpu.checkpoint import load_parameters, read_ggjt, write_ggjt
    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights,
        unstack_layer_params,
    )
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_config.replace(dtype="float32", weight_dtype="float32",
                                 max_seq_len=32)
    vocab = padded_vocab(test_vocab, config.vocab_size)
    tensors = random_ggjt_tensors(config, seed=5)
    src, dst = str(tmp_path / "f32.bin"), str(tmp_path / "q41.bin")
    write_ggjt(src, config, vocab, tensors)
    quantize_ggjt(src, dst, kind="q4_1")

    ckpt = read_ggjt(dst, max_seq_len=32)
    qconfig = ckpt.config.replace(dtype="float32", max_seq_len=32)
    params = load_parameters(qconfig, ckpt.tensors)
    fused = fuse_layer_weights(
        unstack_layer_params(jax.tree.map(lambda x: x, params), qconfig.n_layers)
    )
    toks = jnp.asarray([[3, 9, 2]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    ref, _ = forward_impl(
        params, toks, KVCache.create(qconfig, batch=1, dtype=jnp.float32),
        pos, qconfig,
    )
    got, _ = forward_impl(
        fused, toks,
        KVCache.create(qconfig, batch=1, dtype=jnp.float32, layered=True),
        pos, qconfig,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_engine_recovers_device_state_after_failure(setup, monkeypatch):
    """run_forever's recovery must rebuild donated buffers: after a
    mid-step failure the engine serves correct tokens again."""
    import llamago_tpu.runtime.engine as eng_mod

    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, buckets=(16, 32, 64))
    ref = eng.generate("hello world", GREEDY).output_tokens

    real_forward = eng_mod.forward
    calls = {"n": 0}

    def exploding_forward(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("device boom")
        return real_forward(*a, **k)

    monkeypatch.setattr(eng_mod, "forward", exploding_forward)
    victim = eng.submit("hello world", GREEDY)
    try:
        while victim.status in (JobStatus.QUEUED, JobStatus.PROCESSING):
            eng.step()
    except RuntimeError as exc:
        eng._fail_active(exc)
        eng._rebuild_device_state()
    assert victim.status == JobStatus.FAILED

    monkeypatch.setattr(eng_mod, "forward", real_forward)
    again = eng.generate("hello world", GREEDY)
    assert again.status == JobStatus.FINISHED
    assert again.output_tokens == ref


def test_unfittable_prompt_rejected_not_engine_crash(setup):
    """A prompt that fits the ctx char/token check but whose LAST prefill
    chunk's bucket would overrun a non-bucket-aligned context must fail
    THAT job at admission — not raise inside the engine loop and kill
    every co-tenant (review finding: --context 1000 + 990-token prompt)."""
    config, params, vocab = setup
    cfg60 = config.replace(max_seq_len=60)  # not bucket-aligned
    eng = Engine(cfg60, params, vocab, slots=2, decode_chunk_size=1,
                 prefill_chunk=16)
    healthy = eng.submit("ok", GenerateConfig(max_tokens=4, ctx_size=60,
                                              temp=0.0))
    # 56 byte-tokens + BOS + leading space ~ 58 ids < 60 ctx, but the
    # final 16-token chunk buckets past 60
    doomed = eng.submit("x" * 56, GenerateConfig(max_tokens=4, ctx_size=60,
                                                 temp=0.0))
    _drain(eng, healthy, doomed)
    assert healthy.status == JobStatus.FINISHED
    assert doomed.status == JobStatus.FAILED
    assert "does not fit" in doomed.error


def test_top_k_zero_means_full_vocab(setup):
    """top_k<=0 is the llama.cpp 'disabled' convention: sample over the
    whole vocab (it used to mask out every candidate -> NaN draws)."""
    config, params, vocab = setup
    eng = Engine(config, params, vocab, slots=1, decode_chunk_size=1)
    job = eng.submit("hello", GenerateConfig(max_tokens=6, ctx_size=64,
                                             temp=0.9, top_k=0, seed=7))
    _drain(eng, job)
    assert job.status == JobStatus.FINISHED
    assert len(job.output_tokens) > 0


def test_stop_sequences_truncate_and_finish(setup):
    """OpenAI-style stop sequences: generation ends when a stop string
    appears in the rendered output, truncated at the first occurrence —
    across the per-token, chunked, and speculative decode paths."""
    config, params, vocab = setup
    for chunk, spec in ((1, False), (4, False), (4, True)):
        eng = Engine(config, params, vocab, slots=1, decode_chunk_size=chunk,
                     speculative=spec)
        # learn what greedy emits first, then stop on a substring of it
        probe = eng.submit("hello", GenerateConfig(max_tokens=8, ctx_size=64,
                                                   temp=0.0))
        _drain(eng, probe)
        assert probe.status == JobStatus.FINISHED
        if len(probe.output) < 2:
            continue  # degenerate render; other configs still assert
        stop_seq = probe.output[1:3]
        eng2 = Engine(config, params, vocab, slots=1,
                      decode_chunk_size=chunk, speculative=spec)
        job = eng2.submit("hello", GenerateConfig(
            max_tokens=8, ctx_size=64, temp=0.0, stop=(stop_seq,)))
        _drain(eng2, job)
        assert job.status == JobStatus.FINISHED
        assert stop_seq not in job.output, (chunk, spec, job.output)
        assert job.output == probe.output[:probe.output.find(stop_seq)], (
            chunk, spec)
