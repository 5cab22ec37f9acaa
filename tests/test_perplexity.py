"""Perplexity harness tests: numpy cross-check, quantization deltas."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.eval.perplexity import perplexity

from conftest import random_ggjt_tensors
from reference_impl import forward_full


def quantize_params_entry(config, host):  # helper alias (see below)
    from llamago_tpu.ops.quant import quantize_params

    return quantize_params(config, host)


def setup(tiny_config, weight_dtype="float32"):
    config = tiny_config.replace(dtype="float32", weight_dtype=weight_dtype)
    tensors = random_ggjt_tensors(config, seed=21)
    host = host_parameters(config, tensors)
    if weight_dtype in ("int8", "int4"):
        params = quantize_params_entry(config, host)
    else:
        params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)), host)
    return config, tensors, params


def test_ppl_matches_numpy_oracle(tiny_config):
    config, tensors, params = setup(tiny_config)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, config.vocab_size, 64).astype(np.int32)

    got = perplexity(params, config, ids, ctx=32, min_context=4)
    assert got["n_windows"] == 2

    # numpy oracle: same windows, same masking
    total, count = 0.0, 0
    for w in range(2):
        window = ids[w * 32 : (w + 1) * 32]
        logits = forward_full(tensors, config, window)
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        nll = -logp[np.arange(31), window[1:]]
        start = 4  # every window skips min_context low-context positions
        total += nll[start:].sum()
        count += 31 - start
    want = math.exp(total / count)
    assert abs(got["ppl"] - want) / want < 1e-3


def test_ppl_random_model_near_uniform(tiny_config):
    # a random tiny model is near-uniform: ppl should be order vocab_size
    config, _, params = setup(tiny_config)
    ids = np.random.default_rng(1).integers(0, config.vocab_size, 128).astype(np.int32)
    got = perplexity(params, config, ids, ctx=64)
    assert 0.2 * config.vocab_size < got["ppl"] < 2.0 * config.vocab_size


def test_quantization_ppl_delta(tiny_config):
    """int8 ppl must sit within a small delta of f32; int4 within a larger
    one (the BASELINE.md quality gate, scaled to the tiny random model)."""
    ids = np.random.default_rng(2).integers(0, 512, 128).astype(np.int32)
    config32, _, params32 = setup(tiny_config, "float32")
    ppl32 = perplexity(params32, config32, ids, ctx=64)["ppl"]
    config8, _, params8 = setup(tiny_config, "int8")
    ppl8 = perplexity(params8, config8, ids, ctx=64)["ppl"]
    config4, _, params4 = setup(tiny_config, "int4")
    ppl4 = perplexity(params4, config4, ids, ctx=64)["ppl"]

    assert abs(ppl8 - ppl32) / ppl32 < 0.01, (ppl8, ppl32)
    assert abs(ppl4 - ppl32) / ppl32 < 0.10, (ppl4, ppl32)


def test_too_short_raises(tiny_config):
    config, _, params = setup(tiny_config)
    try:
        perplexity(params, config, np.arange(10, dtype=np.int32), ctx=64)
        raise AssertionError("should have raised")
    except ValueError as e:
        assert "at least" in str(e)
