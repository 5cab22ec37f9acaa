"""Chunked engine fast path: must produce identical greedy output to the
per-token path, finish jobs correctly, and respect context limits."""

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
    tensors = random_ggjt_tensors(config, seed=31)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), host_parameters(config, tensors)
    )
    return config, params, make_test_vocab()


def run(setup_t, chunk, gen, prompt="hello world", slots=1):
    config, params, vocab = setup_t
    eng = Engine(config, params, vocab, slots=slots, buckets=(16, 32, 64),
                 decode_chunk_size=chunk)
    return eng.generate(prompt, gen)


def test_chunked_greedy_matches_per_token(setup):
    gen = GenerateConfig(max_tokens=20, ctx_size=64, temp=0.0)
    a = run(setup, 1, gen)
    b = run(setup, 8, gen)
    assert a.status == b.status == JobStatus.FINISHED
    assert a.output_tokens == b.output_tokens
    assert len(b.output_tokens) == 20


def test_chunked_sampled_matches_per_token(setup):
    # identical seeds: the chunked sampler must reproduce the per-token
    # stream (same per-slot key splitting order)
    gen = GenerateConfig(max_tokens=16, ctx_size=64, temp=0.9, seed=5)
    a = run(setup, 1, gen)
    b = run(setup, 8, gen)
    assert a.output_tokens == b.output_tokens


def test_chunked_near_context_limit(setup):
    # context swap territory: chunk must shrink / fall back and still finish
    gen = GenerateConfig(max_tokens=40, ctx_size=32, temp=0.0)
    a = run(setup, 1, gen)
    b = run(setup, 8, gen)
    assert b.status == JobStatus.FINISHED
    assert len(b.output_tokens) == 40
    assert a.output_tokens == b.output_tokens


def test_chunked_multislot(setup):
    config, params, vocab = setup
    gen = GenerateConfig(max_tokens=12, ctx_size=64, temp=0.0)
    solo = run(setup, 8, gen, prompt="hello")
    eng = Engine(config, params, vocab, slots=2, buckets=(16, 32, 64),
                 decode_chunk_size=8)
    a = eng.submit("hello", gen)
    b = eng.submit("world", gen)
    while a.status in ("queued", "processing") or b.status in ("queued", "processing"):
        eng.step()
    assert a.output_tokens == solo.output_tokens
    assert len(b.output_tokens) == 12
