"""Fused Pallas kernels under GSPMD meshes (parallel/tp_kernels.py).

Each quantized matmul / attention runs the single-chip kernel PER SHARD
inside jax.shard_map (interpret mode on the CPU mesh), and must match the
jnp dequantize-then-dot / einsum reference path on global values.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.config import ModelConfig
from llamago_tpu.ops import kernels, quant
from llamago_tpu.parallel import make_mesh, param_shardings, cache_sharding
from llamago_tpu.parallel.tp_kernels import (
    maybe_tp_attention,
    maybe_tp_matmul,
    tp_kinds,
)


@contextlib.contextmanager
def active_mesh(mesh, interpret=True):
    """Set the process-global mesh + interpret flags, restoring and
    clearing jit caches afterwards (traces capture the globals)."""
    jax.clear_caches()
    kernels.ACTIVE_MESH = mesh
    old_interp = kernels.FORCE_INTERPRET
    kernels.FORCE_INTERPRET = interpret
    try:
        yield mesh
    finally:
        kernels.ACTIVE_MESH = None
        kernels.FORCE_INTERPRET = old_interp
        jax.clear_caches()


def _quant_pair(k, n, bits, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    return quant.quantize(w, bits)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("kind", ["col", "row"])
def test_tp_matmul_matches_reference(bits, kind):
    k, n, b = 128, 256, 4
    qw = _quant_pair(k, n, bits)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, 1, k)).astype(np.float32)
    )
    ref = jnp.dot(x, quant.dequantize(qw, jnp.float32))
    with active_mesh(make_mesh(tp=4, dp=2)):
        out = maybe_tp_matmul(x, qw, kind)
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_dp_only_mesh_runs_kernel_per_shard():
    k, n, b = 128, 256, 8
    qw = _quant_pair(k, n, 8)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, k)).astype(np.float32)
    )
    ref = jnp.dot(x, quant.dequantize(qw, jnp.float32))
    with active_mesh(make_mesh(tp=1, dp=8)):
        out = maybe_tp_matmul(x, qw, None)
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_global_fusion_refused_under_mesh():
    qw = _quant_pair(128, 256, 8)
    x = jnp.ones((1, 128), jnp.bfloat16)
    with active_mesh(make_mesh(tp=4, dp=2)):
        assert not kernels.can_fuse(x, qw)
        assert kernels.can_fuse_local(x, qw)
    # off-mesh on CPU: fusion needs FORCE_INTERPRET again
    assert not kernels.can_fuse(x, qw)
    kernels.FORCE_INTERPRET = True
    try:
        assert kernels.can_fuse(x, qw)
    finally:
        kernels.FORCE_INTERPRET = False


def test_fallbacks_return_none():
    qw = _quant_pair(128, 256, 8)
    x = jnp.ones((2, 128), jnp.float32)
    with active_mesh(make_mesh(tp=4, dp=2)):
        # Q4_1 affine leaves take the GSPMD jnp path
        affine = dict(_quant_pair(128, 256, 4), m=jnp.zeros((4, 256)))
        assert maybe_tp_matmul(x, affine, "col") is None
        # stacked (scan) leaves are pre-sliced by the caller
        stacked = {"q8": jnp.zeros((2, 128, 256), jnp.int8),
                   "s": jnp.zeros((2, 4, 256))}
        assert maybe_tp_matmul(x, stacked, "col") is None
    # non-dividing contraction dim for row-parallel: 128 % (32*8) != 0
    with active_mesh(make_mesh(tp=8, dp=1)):
        assert maybe_tp_matmul(x, qw, "row") is None


def test_tp_kinds_head_gating():
    cfg = ModelConfig(vocab_size=64, dim=64, n_layers=1, n_heads=4,
                      n_kv_heads=2, multiple_of=32, max_seq_len=32)
    mesh4 = make_mesh(tp=4, dp=1)
    kinds = tp_kinds(cfg, mesh4)
    # 4 q heads divide, 2 kv heads don't: wq/wo shard, wk/wv replicate
    assert kinds["wq"] == "col" and kinds["wo"] == "row"
    assert "wk" not in kinds and "wv" not in kinds
    assert kinds["w1"] == "col" and kinds["w2"] == "row"
    mesh2 = make_mesh(tp=2, dp=1)
    kinds2 = tp_kinds(cfg, mesh2)
    assert kinds2["wk"] == "col" and kinds2["wv"] == "col"
    assert tp_kinds(cfg, None) == {}
    assert tp_kinds(cfg, make_mesh(tp=1, dp=8)) == {}


def test_tp_attention_matches_reference():
    from llamago_tpu.models.llama import _attention_local, _attention_math

    b, t, h, kv, s, hd = 2, 1, 8, 4, 32, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32))
    pos = jnp.full((b, t), 7, jnp.int32)
    ref = _attention_math(q, kc, vc, pos)
    with active_mesh(make_mesh(tp=4, dp=2)):
        out = maybe_tp_attention(_attention_local, q, kc, vc, pos)
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("tp,dp", [(2, 1), (4, 2)])
def test_sharded_forward_fused_matches_single_device(tp, dp):
    """Full int8 forward under an active mesh (per-shard Pallas kernels
    via shard_map) vs the single-device fused path."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = ModelConfig(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                         n_kv_heads=4, multiple_of=32, max_seq_len=32,
                         dtype="float32", weight_dtype="int8")
    batch = max(2, dp)
    tokens = jnp.asarray(
        np.random.default_rng(4).integers(0, 256, (batch, 4)).astype(np.int32)
    )
    pos = jnp.zeros(batch, jnp.int32)

    # single-device fused reference (interpret kernels on CPU)
    jax.clear_caches()
    kernels.FORCE_INTERPRET = True
    try:
        params = random_parameters(config, seed=9)
        cache = KVCache.create(config, batch=batch, dtype=jnp.float32)
        ref, _ = forward_impl(params, tokens, cache, pos, config,
                              return_all_logits=True)
        ref = np.asarray(ref)
    finally:
        kernels.FORCE_INTERPRET = False
        jax.clear_caches()

    with active_mesh(make_mesh(tp=tp, dp=dp)) as mesh:
        shardings = param_shardings(config, mesh)
        params_s = random_parameters(config, seed=9, shardings=shardings)
        cache_s = KVCache.create(config, batch=batch, dtype=jnp.float32,
                                 sharding=cache_sharding(config, mesh))
        got, _ = forward_impl(params_s, tokens, cache_s, pos, config,
                              return_all_logits=True)
        got = np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_dequant_matmul_grad_matches_jnp():
    """The fused kernel's custom VJP (grad wrt x; weights frozen) matches
    the jnp dequantize-then-dot gradient."""
    k, n = 128, 256
    qw = _quant_pair(k, n, 8, seed=5)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, k)).astype(np.float32)
    )
    kernels.FORCE_INTERPRET = True
    try:
        gx = jax.grad(lambda x_: kernels.dequant_matmul(x_, qw).sum())(x)
    finally:
        kernels.FORCE_INTERPRET = False
    ref = jax.grad(
        lambda x_: jnp.dot(x_, quant.dequantize(qw, jnp.float32)).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tp,sp", [(2, 1), (2, 2)])
def test_engine_serves_on_sharded_params(tp, sp):
    """End-to-end --tp/--sp serving path: engine + sampler + prefill +
    decode on mesh-sharded quantized params with the shard_map kernels
    active (the exact CLI path under `--tp 2 [--sp 2] --weight-dtype
    int8`), including the sequence-sharded KV cache."""
    from conftest import make_test_vocab, random_ggjt_tensors

    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS
    from llamago_tpu.runtime.engine import Engine, JobStatus

    vocab = make_test_vocab()
    config = MODEL_PRESETS["tiny"].replace(
        vocab_size=len(vocab), dtype="float32", weight_dtype="int8",
        max_seq_len=64,
    )
    tensors = random_ggjt_tensors(config, seed=13)
    with active_mesh(make_mesh(tp=tp, dp=1, sp=sp)) as mesh:
        shardings = param_shardings(config, mesh)
        params = load_parameters(config, tensors, shardings=shardings)
        engine = Engine(config, params, vocab, slots=2, decode_chunk_size=1)
        engine.warmup()  # the wipe must preserve the mesh cache sharding
        assert engine.cache.k.sharding.is_equivalent_to(
            engine._cache_shard, engine.cache.k.ndim)
        gen = GenerateConfig(max_tokens=6, ctx_size=64, temp=0.0)
        jobs = [engine.submit("hello world", gen),
                engine.submit("hi there", gen)]
        for _ in range(200):
            engine.step()
            if all(j.status in (JobStatus.FINISHED, JobStatus.FAILED)
                   for j in jobs):
                break
        assert all(j.status == JobStatus.FINISHED for j in jobs), [
            (j.status, j.error) for j in jobs]
        assert all(len(j.output_tokens) > 0 for j in jobs)


def test_sp_attention_matches_reference():
    """Sequence-parallel attention (cache sharded along S, cross-shard
    softmax combine) must equal single-device attention."""
    from llamago_tpu.models.llama import _attention_local, _attention_math

    b, t, h, kv, s, hd = 2, 1, 4, 4, 64, 32
    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32))
    # mid-stream positions: some cache shards fully masked on high shards
    pos = jnp.full((b, t), 17, jnp.int32)
    ref = _attention_math(q, kc, vc, pos)
    with active_mesh(make_mesh(tp=1, dp=2, sp=4)):
        out = maybe_tp_attention(_attention_local, q, kc, vc, pos)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # composed with a tp head split
    with active_mesh(make_mesh(tp=2, dp=2, sp=2)):
        out2 = maybe_tp_attention(_attention_local, q, kc, vc, pos)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_sp_forward_matches_single_device():
    """Full forward with the KV cache sequence-sharded (sp=4) equals the
    single-device forward."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = ModelConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                         n_kv_heads=4, multiple_of=32, max_seq_len=64,
                         dtype="float32", weight_dtype="float32")
    tokens = jnp.asarray(
        np.random.default_rng(9).integers(0, 128, (2, 8)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)

    jax.clear_caches()
    params = random_parameters(config, seed=15)
    cache = KVCache.create(config, batch=2, dtype=jnp.float32)
    ref, _ = forward_impl(params, tokens, cache, pos, config,
                          return_all_logits=True)
    ref = np.asarray(ref)
    jax.clear_caches()

    with active_mesh(make_mesh(tp=1, dp=2, sp=4), interpret=False) as mesh:
        shardings = param_shardings(config, mesh)
        params_s = random_parameters(config, seed=15, shardings=shardings)
        cache_s = KVCache.create(config, batch=2, dtype=jnp.float32,
                                 sharding=cache_sharding(config, mesh))
        got, new_cache = forward_impl(params_s, tokens, cache_s, pos, config,
                                      return_all_logits=True)
        got = np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_tp_attention_quant_matches_reference():
    """Sharded attention over the INT8 cache (tp head split, dp batch
    split, sp sequence split) equals the global scale-folded math."""
    from llamago_tpu.ops.attention import attention_math
    from llamago_tpu.parallel.tp_kernels import maybe_tp_attention_quant
    from llamago_tpu.runtime.kv_cache import quantize_kv_rows

    b, t, h, kv, s, hd = 2, 1, 4, 4, 64, 32
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)).astype(np.float32))
    kq, ks = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32)))
    vq, vs = quantize_kv_rows(
        jnp.asarray(rng.standard_normal((b, kv, s, hd)).astype(np.float32)))
    pos = jnp.full((b, t), 41, jnp.int32)
    ref = attention_math(q, kq, vq, pos, ks, vs)

    for mesh_kw in ({"tp": 2, "dp": 2}, {"tp": 1, "dp": 2, "sp": 4},
                    {"tp": 2, "dp": 2, "sp": 2}):
        with active_mesh(make_mesh(**mesh_kw)):
            out = maybe_tp_attention_quant(q, kq, vq, pos, ks, vs)
        assert out is not None, mesh_kw
        # the non-sp bodies run the fused kernel (interpret mode), which
        # casts p and K/V to bf16 for the MXU — same tolerance as
        # tests/test_kv_quant.py's kernel-vs-math check
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_sharded_forward_quant_cache_matches_single_device():
    """Full forward with kv_dtype=int8 on a tp=2 dp=2 mesh equals the
    single-device int8-cache forward."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = ModelConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                         n_kv_heads=4, multiple_of=32, max_seq_len=64,
                         dtype="float32", weight_dtype="float32",
                         kv_dtype="int8")
    tokens = jnp.asarray(
        np.random.default_rng(22).integers(0, 128, (2, 8)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)

    jax.clear_caches()
    params = random_parameters(config, seed=23)
    cache = KVCache.create(config, batch=2)
    assert cache.quantized
    ref, _ = forward_impl(params, tokens, cache, pos, config,
                          return_all_logits=True)
    ref = np.asarray(ref)
    jax.clear_caches()

    with active_mesh(make_mesh(tp=2, dp=2), interpret=False) as mesh:
        shardings = param_shardings(config, mesh)
        params_s = random_parameters(config, seed=23, shardings=shardings)
        cache_s = KVCache.create(config, batch=2,
                                 sharding=cache_sharding(config, mesh))
        assert cache_s.quantized
        got, new_cache = forward_impl(params_s, tokens, cache_s, pos, config,
                                      return_all_logits=True)
        got = np.asarray(got)
        # scale buffers keep the cache sharding minus the head_dim axis
        assert new_cache.ks is not None
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sp_forward_quant_cache_matches_single_device():
    """Sequence-sharded (sp=4) forward with the int8 cache equals the
    single-device int8-cache forward."""
    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = ModelConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                         n_kv_heads=4, multiple_of=32, max_seq_len=64,
                         dtype="float32", weight_dtype="float32",
                         kv_dtype="int8")
    tokens = jnp.asarray(
        np.random.default_rng(24).integers(0, 128, (2, 8)).astype(np.int32))
    pos = jnp.zeros(2, jnp.int32)

    jax.clear_caches()
    params = random_parameters(config, seed=25)
    cache = KVCache.create(config, batch=2)
    ref, _ = forward_impl(params, tokens, cache, pos, config,
                          return_all_logits=True)
    ref = np.asarray(ref)
    jax.clear_caches()

    with active_mesh(make_mesh(tp=1, dp=2, sp=4), interpret=False) as mesh:
        shardings = param_shardings(config, mesh)
        params_s = random_parameters(config, seed=25, shardings=shardings)
        cache_s = KVCache.create(config, batch=2,
                                 sharding=cache_sharding(config, mesh))
        got, _ = forward_impl(params_s, tokens, cache_s, pos, config,
                              return_all_logits=True)
        got = np.asarray(got)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
