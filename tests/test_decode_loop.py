"""On-device chunked decode + unrolled-layers path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.params import host_parameters, unstack_layer_params
from llamago_tpu.models.llama import forward
from llamago_tpu.ops.sampling import SamplerState
from llamago_tpu.runtime.decode_loop import decode_chunk
from llamago_tpu.runtime.kv_cache import KVCache

from conftest import random_ggjt_tensors


def setup(tiny_config, seed=11):
    config = tiny_config.replace(dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(config, seed=seed)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    return config, params


def host_greedy(params, config, prompt_ids, n):
    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    logits, cache = forward(
        params, jnp.asarray(prompt_ids[None]), cache, jnp.zeros(1, jnp.int32), config
    )
    toks = []
    pos = len(prompt_ids)
    tok = int(jnp.argmax(logits[0]))
    for _ in range(n):
        toks.append(tok)
        logits, cache = forward(
            params, jnp.asarray([[tok]], jnp.int32), cache,
            jnp.asarray([pos], jnp.int32), config,
        )
        tok = int(jnp.argmax(logits[0]))
        pos += 1
    return toks


def test_decode_chunk_matches_host_loop(tiny_config):
    config, params = setup(tiny_config)
    ids = np.array([1, 5, 42, 300], np.int32)
    want = host_greedy(params, config, ids, 8)

    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    logits, cache = forward(
        params, jnp.asarray(ids[None]), cache, jnp.zeros(1, jnp.int32), config
    )
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    toks, cache, pos, _, _ = decode_chunk(
        params, first, cache, jnp.array([len(ids)], jnp.int32), config, n_steps=8
    )
    got = [int(first[0])] + [int(t) for t in np.asarray(toks[0])][:-1]
    assert got == want
    assert int(pos[0]) == len(ids) + 8


def test_decode_chunk_sampled_reproducible(tiny_config):
    config, params = setup(tiny_config)
    cache = KVCache.create(config, batch=2, dtype=jnp.float32)
    first = jnp.array([5, 7], jnp.int32)
    pos = jnp.zeros(2, jnp.int32)
    def kw():
        # state/cache are donated buffers — fresh ones per call
        return dict(
            rngs=jax.vmap(jax.random.PRNGKey)(jnp.array([3, 4])),
            state=SamplerState.create(2, 16, config.vocab_size),
            temp=jnp.array([0.9, 0.9], jnp.float32),
            top_k=jnp.array([40, 40], jnp.int32),
            top_p=jnp.array([0.95, 0.95], jnp.float32),
            repeat_penalty=jnp.array([1.1, 1.1], jnp.float32),
            greedy=False,
        )

    t1, *_ = decode_chunk(params, first, cache, pos, config, n_steps=6, **kw())
    cache2 = KVCache.create(config, batch=2, dtype=jnp.float32)
    t2, *_ = decode_chunk(params, first, cache2, pos, config, n_steps=6, **kw())
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_unrolled_layers_matches_scan(tiny_config):
    config, params = setup(tiny_config, seed=12)
    unrolled = unstack_layer_params(params, config.n_layers)
    tokens = jnp.array([[1, 5, 42, 300]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    ref, rc = forward(
        params, tokens, KVCache.create(config, batch=1, dtype=jnp.float32), pos,
        config, return_all_logits=True,
    )
    got, gc = forward(
        unrolled, tokens, KVCache.create(config, batch=1, dtype=jnp.float32), pos,
        config, return_all_logits=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc.k), np.asarray(rc.k), rtol=1e-5, atol=1e-5)


def test_unrolled_quantized(tiny_config):
    from llamago_tpu.checkpoint.params import random_parameters

    config = tiny_config.replace(dtype="float32", weight_dtype="int8")
    params = random_parameters(config, seed=13)
    unrolled = unstack_layer_params(params, config.n_layers)
    tokens = jnp.array([[1, 2, 3]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    a, _ = forward(params, tokens, KVCache.create(config, batch=1, dtype=jnp.float32), pos, config)
    b, _ = forward(unrolled, tokens, KVCache.create(config, batch=1, dtype=jnp.float32), pos, config)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
