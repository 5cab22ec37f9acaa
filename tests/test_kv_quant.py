"""int8-quantized KV cache (runtime/kv_cache.py, ops/attention.py).

Covers the quantization math, the scale-folded jnp attention, the fused
quantized decode kernel (interpret mode), the full forward/decode paths,
and the engine end-to-end with kv_dtype="int8". The reference has no
cache quantization at all (its cache is F32, pkg/llama/llama.go:92-103);
this is a beyond-parity capability matching llama.cpp's cache-type-k/v.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import MODEL_PRESETS, GenerateConfig
from llamago_tpu.models.llama import forward, prefill_into_slot
from llamago_tpu.ops import attention, kernels
from llamago_tpu.runtime.engine import Engine, JobStatus
from llamago_tpu.runtime.kv_cache import KVCache, quantize_kv_rows

from conftest import make_test_vocab, random_ggjt_tensors


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype=dtype
    )


# ------------------------------------------------------- quantization math

def test_quantize_kv_rows_error_bound():
    x = _rand((3, 5, 4, 16), 0)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.float32
    deq = q.astype(jnp.float32) * s[..., None]
    # per-row symmetric absmax/127: error <= s/2 per element
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(s)[..., None] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_quantize_kv_rows_zero_row_is_exact():
    x = jnp.zeros((2, 2, 2, 8), jnp.float32)
    q, s = quantize_kv_rows(x)
    assert np.asarray(q).sum() == 0
    assert (np.asarray(s) == 1.0).all()  # unwritten rows dequantize to 0


# --------------------------------------------- scale-folded jnp attention

def test_attention_math_scale_fold_matches_dequant():
    b, t, h, kv, hd, s = 2, 3, 4, 2, 16, 32
    q = _rand((b, t, h, hd), 1)
    k_cache = _rand((b, kv, s, hd), 2)
    v_cache = _rand((b, kv, s, hd), 3)
    kq, ks = quantize_kv_rows(k_cache)
    vq, vs = quantize_kv_rows(v_cache)
    positions = jnp.asarray([[4, 5, 6], [20, 21, 22]], jnp.int32)

    got = attention.attention_math(q, kq, vq, positions, ks, vs)
    # reference: dequantize the cache element-wise, run the dense math
    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    want = attention.attention_math(q, k_deq, v_deq, positions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


# ------------------------------------------------- fused quantized kernel

@pytest.fixture
def _interpret_kernels():
    kernels.FORCE_INTERPRET = True
    yield
    kernels.FORCE_INTERPRET = False


@pytest.mark.parametrize(
    "b,t,h,kv,hd,s,pos0",
    [
        (2, 1, 4, 4, 16, 128, [5, 100]),   # MHA decode
        (2, 1, 8, 2, 16, 128, [63, 127]),  # GQA g=4 decode
        (1, 8, 8, 2, 16, 64, [20]),        # speculative verify window
    ],
)
def test_fused_quant_kernel_matches_math(_interpret_kernels,
                                         b, t, h, kv, hd, s, pos0):
    q = _rand((b, t, h, hd), 4)
    kq, ks = quantize_kv_rows(_rand((b, kv, s, hd), 5))
    vq, vs = quantize_kv_rows(_rand((b, kv, s, hd), 6))
    positions = (jnp.asarray(pos0, jnp.int32)[:, None]
                 + jnp.arange(t, dtype=jnp.int32))

    assert attention.can_fuse_attention_quant(q, kq)
    got = attention.flash_attention_quant(q, kq, vq, positions, ks, vs)
    want = attention.attention_math(q, kq, vq, positions, ks, vs)
    # kernel casts p and K/V to bf16 for the MXU; tolerance reflects that
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


# ------------------------------------------------------ full forward pass

@pytest.fixture(scope="module")
def tiny_setup():
    config = MODEL_PRESETS["tiny"].replace(dtype="float32",
                                           weight_dtype="float32")
    tensors = random_ggjt_tensors(config, seed=3)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    return config, params


@pytest.mark.parametrize("layered", [False, True])
def test_forward_int8_cache_matches_dense(tiny_setup, layered):
    config, params = tiny_setup
    if layered:
        # layered caches pair with unrolled per-layer weights (the
        # engine's production combination)
        from llamago_tpu.checkpoint.params import unstack_layer_params

        params = unstack_layer_params(params, config.n_layers)
    cfg_q = config.replace(kv_dtype="int8")
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, 500, (2, 9)), jnp.int32)
    wp = jnp.zeros(2, jnp.int32)

    cache_d = KVCache.create(config, batch=2, layered=layered)
    cache_q = KVCache.create(cfg_q, batch=2, layered=layered)
    assert cache_q.quantized and not cache_d.quantized

    ld, cache_d = forward(params, toks, cache_d, wp, config)
    lq, cache_q = forward(params, toks, cache_q, wp, cfg_q)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lq), atol=5e-3)

    # greedy decode stays token-identical for several steps
    pos = jnp.full((2,), 9, jnp.int32)
    td = jnp.argmax(ld, -1).astype(jnp.int32)
    tq = jnp.argmax(lq, -1).astype(jnp.int32)
    for _ in range(6):
        assert (np.asarray(td) == np.asarray(tq)).all()
        ld, cache_d = forward(params, td[:, None], cache_d, pos, config)
        lq, cache_q = forward(params, tq[:, None], cache_q, pos, cfg_q)
        td = jnp.argmax(ld, -1).astype(jnp.int32)
        tq = jnp.argmax(lq, -1).astype(jnp.int32)
        pos = pos + 1


def test_prefill_into_slot_quantized(tiny_setup):
    """Slot prefill slices/writes the scale buffers alongside K/V and
    leaves other slots untouched."""
    from llamago_tpu.checkpoint.params import unstack_layer_params

    config, params = tiny_setup
    params = unstack_layer_params(params, config.n_layers)
    cfg_q = config.replace(kv_dtype="int8")
    cache = KVCache.create(cfg_q, batch=3, layered=True)
    ids = np.random.default_rng(1).integers(1, 500, 7).tolist()
    padded = np.zeros((1, 16), np.int32)
    padded[0, : len(ids)] = ids

    logits, cache2 = prefill_into_slot(
        params, jnp.asarray(padded), cache,
        jnp.asarray(1, jnp.int32), jnp.asarray([0], jnp.int32),
        jnp.asarray([len(ids) - 1], jnp.int32), cfg_q,
    )
    assert logits.shape == (config.vocab_size,)
    # slot 1 written, slots 0/2 untouched (zero values AND zero scales,
    # which dequantize to exactly 0)
    k0 = np.asarray(cache2.k[0])
    s0 = np.asarray(cache2.ks[0])
    assert np.abs(k0[1]).sum() > 0
    assert np.abs(k0[0]).sum() == 0 and np.abs(k0[2]).sum() == 0
    assert (s0[0] == 0.0).all() and (s0[2] == 0.0).all()
    assert (s0[1, :, : len(ids)] > 0).all()

    # parity with a batch-1 forward on the same prompt
    solo = KVCache.create(cfg_q, batch=1, layered=True)
    want, _ = forward(params, jnp.asarray(padded), solo,
                      jnp.zeros(1, jnp.int32), cfg_q,
                      logit_index=jnp.asarray([len(ids) - 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want[0]),
                               atol=1e-4)


def test_decode_chunk_quantized(tiny_setup):
    """The on-device decode loop carries the scale buffers through the
    scan (runtime/decode_loop.py)."""
    from llamago_tpu.runtime.decode_loop import decode_chunk

    from llamago_tpu.checkpoint.params import unstack_layer_params

    config, params = tiny_setup
    params = unstack_layer_params(params, config.n_layers)
    cfg_q = config.replace(kv_dtype="int8")
    toks = jnp.asarray(
        np.random.default_rng(2).integers(1, 500, (2, 5)), jnp.int32)

    outs = {}
    for cfg in (config, cfg_q):
        cache = KVCache.create(cfg, batch=2, layered=True)
        logits, cache = forward(params, toks, cache,
                                jnp.zeros(2, jnp.int32), cfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((2,), 5, jnp.int32)
        emitted, cache, pos, _, _ = decode_chunk(
            params, tok, cache, pos, cfg, n_steps=8)
        outs[cfg.kv_dtype] = np.asarray(emitted)
    assert (outs["auto"] == outs["int8"]).all()


# ----------------------------------------------------- engine end-to-end

def test_engine_int8_cache_generates(tiny_setup):
    config, params = tiny_setup
    cfg_q = config.replace(kv_dtype="int8", max_seq_len=64)
    vocab = make_test_vocab()
    eng = Engine(cfg_q, params, vocab, slots=2, buckets=(16, 32, 64))
    gen = GenerateConfig(max_tokens=10, ctx_size=64, temp=0.0)
    job = eng.generate("hello world", gen)
    assert job.status == JobStatus.FINISHED
    assert len(job.output_tokens) == 10

    # greedy output matches the dense-cache engine on the same weights
    cfg_d = config.replace(max_seq_len=64)
    eng_d = Engine(cfg_d, params, vocab, slots=2, buckets=(16, 32, 64))
    job_d = eng_d.generate("hello world", gen)
    assert job.output_tokens == job_d.output_tokens


def test_speculative_decode_quantized(tiny_setup):
    """Speculative decode with the int8 cache emits the same greedy
    stream as with the dense cache (verify windows t<=32 run the
    scale-folded attention)."""
    from llamago_tpu.checkpoint.params import unstack_layer_params
    from llamago_tpu.runtime.speculative import speculative_decode_chunk

    config, params = tiny_setup
    params = unstack_layer_params(params, config.n_layers)
    toks = np.random.default_rng(5).integers(1, 500, (2, 6)).astype(np.int32)

    streams = {}
    for cfg in (config, config.replace(kv_dtype="int8")):
        cache = KVCache.create(cfg, batch=2, layered=True)
        logits, cache = forward(params, jnp.asarray(toks), cache,
                                jnp.zeros(2, jnp.int32), cfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = jnp.full((2,), 6, jnp.int32)
        hist = jnp.zeros((2, cfg.max_seq_len), jnp.int32)
        hist = hist.at[:, :6].set(toks)
        hist = jax.vmap(lambda h, t: h.at[6].set(t))(hist, tok)
        hlen = jnp.full((2,), 7, jnp.int32)
        out, counts, cache, pos, hist, hlen = speculative_decode_chunk(
            params, tok, cache, pos, hist, hlen, cfg,
            n_steps=4, draft_len=3)
        emitted = []
        o, c = np.asarray(out), np.asarray(counts)
        for b in range(2):
            emitted.append([int(o[b, i, j]) for i in range(c.shape[1])
                            for j in range(c[b, i])])
        streams[cfg.kv_dtype] = emitted
    assert streams["auto"] == streams["int8"]


def test_fused_cache_append_matches_dus(_interpret_kernels):
    """The fused quantize+append kernel (ops/cache_write.py) writes
    exactly what the quantize_kv_rows + dynamic_update_slice path writes,
    and leaves every other cache row untouched (r5: replaces 4*b per-row
    DUS chains per layer, ~1.5 ms/step at 7B b=8 decode)."""
    from llamago_tpu.models.llama import _update_cache, _update_scale
    from llamago_tpu.ops.cache_write import (
        cache_append_quant,
        can_fuse_cache_append,
    )

    B, KV, S, hd = 3, 4, 128, 128
    rng = np.random.default_rng(7)
    ck = jnp.asarray(rng.integers(-5, 5, (B, KV, S, hd)), jnp.int8)
    cv = jnp.asarray(rng.integers(-5, 5, (B, KV, S, hd)), jnp.int8)
    cks = jnp.asarray(rng.standard_normal((B, KV, S)), jnp.float32)
    cvs = jnp.asarray(rng.standard_normal((B, KV, S)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, 1, KV, hd)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((B, 1, KV, hd)), jnp.bfloat16)
    pos = jnp.asarray([0, 9, 127], jnp.int32)  # incl. both edges
    assert can_fuse_cache_append(kn, ck)

    k2, v2, ks2, vs2 = cache_append_quant(ck, cv, cks, cvs, kn, vn, pos)

    kq, ks_new = quantize_kv_rows(kn)
    vq, vs_new = quantize_kv_rows(vn)
    k_want = _update_cache(ck, kq, pos)
    v_want = _update_cache(cv, vq, pos)
    ks_want = _update_scale(cks, ks_new, pos)
    vs_want = _update_scale(cvs, vs_new, pos)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_want))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_want))
    np.testing.assert_allclose(np.asarray(ks2), np.asarray(ks_want),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_want),
                               rtol=1e-3)
    # gates: prefill (t>1) and non-quantized caches stay on the DUS path
    assert not can_fuse_cache_append(
        jnp.zeros((B, 4, KV, hd), jnp.bfloat16), ck)
    assert not can_fuse_cache_append(kn, ck.astype(jnp.bfloat16))
