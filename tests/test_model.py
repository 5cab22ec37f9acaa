"""Model forward tests.

Parity tests run in float64 (via jax.experimental.enable_x64) against the
plain-numpy oracle in reference_impl.py, with tight tolerances — this
pins the SEMANTICS (rope convention, masking, cache indexing, GQA).
A float32 sanity test with loose tolerance guards the production dtype
path (f32 cross-shape reassociation noise is ~1e-3 here; measured, not a
bug — see commit history).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import enable_x64

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.models.llama import forward
from llamago_tpu.runtime.kv_cache import KVCache

from conftest import random_ggjt_tensors
from reference_impl import forward_full

TIGHT = dict(rtol=1e-6, atol=1e-6)


def setup(config, dtype, seed=1):
    config = config.replace(dtype=dtype, weight_dtype=dtype)
    tensors = random_ggjt_tensors(config, seed=seed)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, dtype)), host_parameters(config, tensors)
    )
    return config, tensors, params


def test_logits_parity_vs_numpy_oracle_f64(tiny_config):
    with enable_x64():
        config, tensors, params = setup(tiny_config, "float64")
        tokens = np.array([[1, 5, 42, 300, 7, 19]], np.int32)
        cache = KVCache.create(config, batch=1, dtype=jnp.float64)
        logits, _ = forward(
            params, jnp.asarray(tokens), cache, jnp.zeros(1, jnp.int32), config,
            return_all_logits=True,
        )
        ref = forward_full(tensors, config, tokens[0])
        np.testing.assert_allclose(np.asarray(logits[0], np.float64), ref, **TIGHT)


def test_gqa_parity_vs_oracle_f64(tiny_gqa_config):
    with enable_x64():
        config, tensors, params = setup(tiny_gqa_config, "float64", seed=2)
        assert config.kv_heads < config.n_heads
        tokens = np.array([[1, 9, 77, 123]], np.int32)
        cache = KVCache.create(config, batch=1, dtype=jnp.float64)
        logits, _ = forward(
            params, jnp.asarray(tokens), cache, jnp.zeros(1, jnp.int32), config,
            return_all_logits=True,
        )
        ref = forward_full(tensors, config, tokens[0])
        np.testing.assert_allclose(np.asarray(logits[0], np.float64), ref, **TIGHT)


def test_logits_parity_f32_sanity(tiny_config):
    config, tensors, params = setup(tiny_config, "float32")
    tokens = np.array([[1, 5, 42, 300, 7, 19]], np.int32)
    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    logits, _ = forward(
        params, jnp.asarray(tokens), cache, jnp.zeros(1, jnp.int32), config,
        return_all_logits=True,
    )
    ref = forward_full(tensors, config, tokens[0])
    np.testing.assert_allclose(np.asarray(logits[0]), ref, rtol=0, atol=5e-3)


def test_prefill_then_decode_matches_full_prefill(tiny_config):
    """Incremental decode through the KV cache == one-shot full forward."""
    with enable_x64():
        config, _, params = setup(tiny_config, "float64")
        ids = np.array([1, 5, 42, 300, 7, 19, 250, 33], np.int32)
        split = 5

        cache = KVCache.create(config, batch=1, dtype=jnp.float64)
        full_logits, _ = forward(
            params, jnp.asarray(ids[None, :]), cache, jnp.zeros(1, jnp.int32), config,
            return_all_logits=True,
        )
        full = np.asarray(full_logits[0])

        cache = KVCache.create(config, batch=1, dtype=jnp.float64)
        logits, cache = forward(
            params, jnp.asarray(ids[None, :split]), cache, jnp.zeros(1, jnp.int32), config
        )
        np.testing.assert_allclose(np.asarray(logits[0]), full[split - 1], **TIGHT)
        for i in range(split, len(ids)):
            logits, cache = forward(
                params, jnp.asarray(ids[None, i : i + 1]), cache,
                jnp.array([i], jnp.int32), config,
            )
            np.testing.assert_allclose(np.asarray(logits[0]), full[i], **TIGHT)


def test_batched_decode_independent_positions(tiny_config):
    """Per-slot write positions: sequences at different offsets decode as if
    alone (the continuous-batching invariant)."""
    with enable_x64():
        config, _, params = setup(tiny_config, "float64")

        # A alone
        cache = KVCache.create(config, batch=1, dtype=jnp.float64)
        _, cache = forward(
            params, jnp.array([[1, 5, 42]], jnp.int32), cache, jnp.zeros(1, jnp.int32), config
        )
        la, _ = forward(
            params, jnp.array([[7]], jnp.int32), cache, jnp.array([3], jnp.int32), config
        )

        # A (3 real tokens) + B (2 real + 1 pad) prefilled together; decode at
        # per-slot positions [3, 2]. B's decode overwrites its pad slot and
        # must ignore it.
        cache2 = KVCache.create(config, batch=2, dtype=jnp.float64)
        _, cache2 = forward(
            params, jnp.array([[1, 5, 42], [1, 300, 0]], jnp.int32), cache2,
            jnp.zeros(2, jnp.int32), config,
        )
        lab, _ = forward(
            params, jnp.array([[7], [9]], jnp.int32), cache2,
            jnp.array([3, 2], jnp.int32), config,
        )
        np.testing.assert_allclose(np.asarray(la[0]), np.asarray(lab[0]), **TIGHT)

        # B alone: prefill [1, 300], decode 9 at pos 2
        cache3 = KVCache.create(config, batch=1, dtype=jnp.float64)
        _, cache3 = forward(
            params, jnp.array([[1, 300]], jnp.int32), cache3, jnp.zeros(1, jnp.int32), config
        )
        lb, _ = forward(
            params, jnp.array([[9]], jnp.int32), cache3, jnp.array([2], jnp.int32), config
        )
        np.testing.assert_allclose(np.asarray(lb[0]), np.asarray(lab[1]), **TIGHT)


def test_logits_shape_modes(tiny_config):
    config, _, params = setup(tiny_config, "float32")
    cache = KVCache.create(config, batch=2, dtype=jnp.float32)
    toks = jnp.ones((2, 4), jnp.int32)
    pos = jnp.zeros(2, jnp.int32)
    last, _ = forward(params, toks, cache, pos, config)
    assert last.shape == (2, config.vocab_size)
    assert last.dtype == jnp.float32
    cache = KVCache.create(config, batch=2, dtype=jnp.float32)
    alllog, _ = forward(params, toks, cache, pos, config, return_all_logits=True)
    assert alllog.shape == (2, 4, config.vocab_size)


def test_bf16_runs(tiny_config):
    """The production dtype path compiles and produces finite logits."""
    config, _, params = setup(tiny_config, "float32")
    config = config.replace(dtype="bfloat16")
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    cache = KVCache.create(config, batch=1)
    logits, cache = forward(
        params, jnp.array([[1, 5, 42]], jnp.int32), cache, jnp.zeros(1, jnp.int32), config
    )
    assert logits.dtype == jnp.float32
    assert bool(jnp.isfinite(logits).all())


def test_fused_qkv_w13_matches_unfused(tiny_gqa_config):
    """fuse_layer_weights halves kernel dispatches; outputs must match."""
    import jax.numpy as jnp
    import numpy as np

    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights,
        random_parameters,
        unstack_layer_params,
    )
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_gqa_config.replace(dtype="float32", weight_dtype="float32")
    params = unstack_layer_params(random_parameters(config, seed=5),
                                  config.n_layers)
    tokens = jnp.asarray([[3, 9, 2, 7]], jnp.int32)
    wp = jnp.zeros(1, jnp.int32)

    ref, _ = forward_impl(params, tokens,
                          KVCache.create(config, batch=1, layered=True),
                          wp, config)
    fused = fuse_layer_weights(params)
    assert "wqkv" in fused["layers"][0] and "wq" not in fused["layers"][0]
    got, _ = forward_impl(fused, tokens,
                          KVCache.create(config, batch=1, layered=True),
                          wp, config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_weights_quantized(tiny_gqa_config):
    """Fusion concatenates quantized leaves blockwise-consistently."""
    import jax.numpy as jnp
    import numpy as np

    from llamago_tpu.checkpoint.params import fuse_layer_weights, random_parameters, unstack_layer_params
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_gqa_config.replace(dtype="float32", weight_dtype="int8")
    params = unstack_layer_params(random_parameters(config, seed=5), config.n_layers)
    tokens = jnp.asarray([[3, 9, 2]], jnp.int32)
    wp = jnp.zeros(1, jnp.int32)
    ref, _ = forward_impl(params, tokens, KVCache.create(config, batch=1, layered=True), wp, config)
    got, _ = forward_impl(fuse_layer_weights(params), tokens,
                          KVCache.create(config, batch=1, layered=True), wp, config)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_bf16_compute_with_dense_f32_weights():
    """A dense float32-weight checkpoint at bfloat16 compute must not
    promote the residual stream to f32 (rms_norm weight cast; the scan
    carry dtype is the compute dtype). Regression: library users passing
    read_ggjt's config (dtype=bf16 default, weight_dtype=f32 from ftype)
    straight to Engine/forward hit a scan carry TypeError."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.config import MODEL_PRESETS
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    config = MODEL_PRESETS["tiny"].replace(
        dtype="bfloat16", weight_dtype="float32", max_seq_len=32)
    params = random_parameters(config, seed=0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    cache = KVCache.create(config, batch=1)
    logits, _ = forward(params, jnp.ones((1, 4), jnp.int32), cache,
                        jnp.zeros(1, jnp.int32), config)
    assert logits.shape == (1, config.vocab_size)
