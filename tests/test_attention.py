"""Fused Pallas attention kernel vs the jnp reference path.

Runs the kernel in interpret mode on CPU (tests/conftest.py pins the CPU
backend) and checks exact-semantics parity with models/llama.py's jnp
attention for decode, tiled prefill, GQA grouping, and per-batch
positions."""

import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.config import ModelConfig
from llamago_tpu.models import llama
from llamago_tpu.ops import attention, kernels


@pytest.fixture(autouse=True)
def _interpret_kernels():
    kernels.FORCE_INTERPRET = True
    yield
    kernels.FORCE_INTERPRET = False


def _config(h, kv, hd):
    return ModelConfig(
        vocab_size=64, dim=h * hd, n_layers=1, n_heads=h, n_kv_heads=kv,
        multiple_of=16, max_seq_len=64,
    )


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype=dtype
    )


def _jnp_reference(config, q, k_cache, v_cache, positions):
    old = kernels.DISABLE_FUSED
    kernels.DISABLE_FUSED = True
    try:
        return llama._attention(config, q, k_cache, v_cache, positions)
    finally:
        kernels.DISABLE_FUSED = old


def _run_case(b, t, h, kv, hd, s, pos0, seed=0):
    config = _config(h, kv, hd)
    q = _rand((b, t, h, hd), seed)
    k_cache = _rand((b, kv, s, hd), seed + 1)
    v_cache = _rand((b, kv, s, hd), seed + 2)
    positions = jnp.asarray(pos0, jnp.int32)[:, None] + jnp.arange(t, dtype=jnp.int32)

    assert attention.can_fuse_attention(q, k_cache)
    got = llama._attention(config, q, k_cache, v_cache, positions)
    want = _jnp_reference(config, q, k_cache, v_cache, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_decode_mha():
    _run_case(b=2, t=1, h=4, kv=4, hd=16, s=32, pos0=[5, 31])


def test_decode_gqa():
    _run_case(b=2, t=1, h=8, kv=2, hd=16, s=32, pos0=[0, 17], seed=3)


def test_prefill_tiled():
    # t=16 with group 2 -> several q-tiles per (batch, head) grid row
    _run_case(b=1, t=16, h=4, kv=2, hd=16, s=64, pos0=[0], seed=5)


def test_prefill_mid_context():
    # prefill starting mid-cache (context-swap re-feed shape)
    _run_case(b=2, t=8, h=2, kv=2, hd=16, s=64, pos0=[12, 40], seed=7)


def test_bfloat16_io():
    config = _config(4, 4, 16)
    q = _rand((1, 1, 4, 16), 11, jnp.bfloat16)
    k_cache = _rand((1, 4, 32, 16), 12, jnp.bfloat16)
    v_cache = _rand((1, 4, 32, 16), 13, jnp.bfloat16)
    positions = jnp.full((1, 1), 20, jnp.int32)
    got = llama._attention(config, q, k_cache, v_cache, positions)
    assert got.dtype == jnp.bfloat16
    want = _jnp_reference(config, q, k_cache, v_cache, positions)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_guard_rejects_oversized_cache():
    # PREFILL-shaped (t > 32) S*hd beyond the VMEM budget must fall back
    # to the jnp path. (Decode shapes no longer hit this guard: the
    # length-aware kernel S-blocks the cache, so whole-S VMEM residency
    # is not required.)
    q = jnp.zeros((1, 64, 2, 256), jnp.float32)
    k_cache = jnp.zeros((1, 2, 8192, 256), jnp.float32)
    assert not attention.can_fuse_attention(q, k_cache)


def test_decode_lenaware_multiblock():
    # several S-blocks per (batch, head): positions straddle block
    # boundaries, including pos inside the first block (later blocks
    # are index-clamped + compute-skipped) and the exact block edge
    import os
    old = os.environ.get("LLAMAGO_ATTN_SB")
    try:
        for pos0 in ([3, 16], [15, 31], [0, 63]):
            _run_case(b=2, t=1, h=4, kv=4, hd=16, s=64, pos0=pos0, seed=11)
    finally:
        if old is None:
            os.environ.pop("LLAMAGO_ATTN_SB", None)


def test_decode_lenaware_blocked_gqa_multitoken():
    # t=4 (speculative verify window) x GQA g=4 across 4 S-blocks of 16
    sb_old = attention._SB
    attention._SB = 16
    try:
        _run_case(b=2, t=4, h=8, kv=2, hd=16, s=64, pos0=[7, 42], seed=13)
        _run_case(b=1, t=8, h=4, kv=4, hd=16, s=64, pos0=[55], seed=17)
    finally:
        attention._SB = sb_old


def test_end_to_end_forward_uses_kernel(tiny_gqa_config):
    """forward_impl with the kernel enabled matches the pure-jnp forward."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_gqa_config
    params = random_parameters(config, seed=0)
    tokens = jnp.asarray([[3, 9, 2, 7]], jnp.int32)
    cache = KVCache.create(config, batch=1)
    wp = jnp.zeros(1, jnp.int32)

    logits_fused, _ = forward_impl(params, tokens, cache, wp, config)
    kernels.DISABLE_FUSED = True
    try:
        cache2 = KVCache.create(config, batch=1)
        logits_ref, _ = forward_impl(params, tokens, cache2, wp, config)
    finally:
        kernels.DISABLE_FUSED = False
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_ref), atol=5e-4
    )


def test_fused_rms_norm_matches_jnp():
    """Opt-in fused RMSNorm Pallas kernel (interpret mode) vs ops/basic."""
    from llamago_tpu.ops import basic, kernels

    kernels.USE_FUSED_NORM = True
    try:
        x = _rand((2, 5, 64), 21)
        w = _rand((64,), 22)
        assert kernels.can_fuse_norm(x)
        got = basic.rms_norm(x, w)
        kernels.USE_FUSED_NORM = False
        want = basic.rms_norm(x, w)
    finally:
        kernels.USE_FUSED_NORM = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
