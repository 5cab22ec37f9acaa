"""Quantization tests: Q8_0/Q4_0 roundtrip accuracy, packing, fused
Pallas kernel parity (interpret mode), quantized end-to-end decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.ops import kernels
from llamago_tpu.ops.quant import (
    QK,
    dequantize,
    is_quantized,
    quant_matmul,
    quantize,
    quantize_params,
    unpack_q4,
)


def rnd(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


def test_q8_roundtrip_error():
    w = jnp.asarray(rnd((256, 64)))
    q = quantize(w, bits=8)
    assert is_quantized(q)
    assert q["q8"].dtype == jnp.int8 and q["q8"].shape == (256, 64)
    assert q["s"].shape == (256 // QK, 64)
    deq = dequantize(q)
    # Q8_0: worst-case error is d/2 of the STORED (bf16, scale-aware
    # rounding) scale per element
    err = np.abs(np.asarray(deq) - np.asarray(w))
    d = np.asarray(q["s"], np.float32)
    bound = d / 2.0
    assert (err.reshape(8, QK, 64) <= bound[:, None, :] + 1e-6).all()


def test_q4_roundtrip_error():
    w = jnp.asarray(rnd((256, 64), seed=1))
    q = quantize(w, bits=4)
    assert q["q4"].dtype == jnp.uint8 and q["q4"].shape == (128, 64)
    deq = dequantize(q)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    d = np.asarray(q["s"], np.float32)
    # positive extreme can clip (ggml sign trick) -> worst case |d|;
    # bf16 scale rounding can shrink d by up to 2^-9 relative, letting
    # the clipped extreme overshoot by another 8*2^-9*|d|
    bound = np.abs(d) * (1.0 + 8.0 * 2.0**-9)
    assert (err.reshape(8, QK, 64) <= bound[:, None, :] + 1e-6).all()


def test_q4_pack_unpack_exact():
    w = jnp.asarray(rnd((64, 32), seed=2))
    q = quantize(w, bits=4)
    unpacked = np.asarray(unpack_q4(q["q4"]))
    assert unpacked.min() >= -8 and unpacked.max() <= 7
    # dequant of unpack matches direct dequantize
    scales = np.repeat(np.asarray(q["s"], np.float32), QK, axis=0)
    np.testing.assert_allclose(unpacked * scales, np.asarray(dequantize(q)), rtol=1e-6)


def test_layer_stacked_quantize():
    w = jnp.asarray(rnd((3, 64, 32), seed=3))
    q = quantize(w, bits=8)
    assert q["q8"].shape == (3, 64, 32)
    assert q["s"].shape == (3, 2, 32)
    np.testing.assert_allclose(
        np.asarray(dequantize(q)[1]),
        np.asarray(dequantize({"q8": q["q8"][1], "s": q["s"][1]})),
    )


@pytest.mark.parametrize("bits", [8, 4])
def test_fused_kernel_matches_reference(bits):
    """Pallas dequant-matmul (interpret mode on CPU) == dequantize+dot."""
    k, n, m = 128, 256, 3
    w = jnp.asarray(rnd((k, n), seed=4, scale=0.1))
    x = jnp.asarray(rnd((m, k), seed=5))
    q = quantize(w, bits=bits)
    ref = jnp.dot(x, dequantize(q))
    kernels.FORCE_INTERPRET = True
    try:
        assert kernels.can_fuse(x, q)
        got = kernels.dequant_matmul(x, q)
    finally:
        kernels.FORCE_INTERPRET = False
    # kernel computes in bf16 on the MXU: tolerance ~1e-2 relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_fused_kernel_3d_input():
    k, n = 64, 128
    w = jnp.asarray(rnd((k, n), seed=6, scale=0.1))
    x = jnp.asarray(rnd((2, 3, k), seed=7))
    q = quantize(w, bits=8)
    kernels.FORCE_INTERPRET = True
    try:
        got = kernels.dequant_matmul(x, q)
    finally:
        kernels.FORCE_INTERPRET = False
    ref = jnp.einsum("btk,kn->btn", x, dequantize(q))
    assert got.shape == (2, 3, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_quant_matmul_jnp_fallback():
    # can_fuse is False on CPU without FORCE_INTERPRET -> jnp path
    w = jnp.asarray(rnd((96, 48), seed=8))  # 96 % 32 == 0 but 48 has no tile
    q = quantize(w, bits=8)
    x = jnp.asarray(rnd((2, 96), seed=9))
    out = quant_matmul(x, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.dot(x, dequantize(q))), rtol=1e-5
    )


def test_quantized_params_end_to_end_decode(tiny_config):
    """int8 weights through the full forward: close to f32 logits."""
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    from conftest import random_ggjt_tensors

    config32 = tiny_config.replace(dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(config32, seed=10)
    host = host_parameters(config32, tensors)
    params32 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)), host)

    config8 = tiny_config.replace(dtype="float32", weight_dtype="int8")
    params8 = quantize_params(config8, host)
    assert is_quantized(params8["layers"]["wq"])
    assert is_quantized(params8["output"])
    assert not is_quantized(params8["tok_embeddings"])

    tokens = jnp.array([[1, 5, 42, 300]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    ref, _ = forward(params32, tokens, KVCache.create(config32, batch=1, dtype=jnp.float32), pos, config32)
    got, _ = forward(params8, tokens, KVCache.create(config8, batch=1, dtype=jnp.float32), pos, config8)
    # int8 weight quantization noise; logits must stay well correlated
    r = np.asarray(ref[0])
    g = np.asarray(got[0])
    assert np.corrcoef(r, g)[0, 1] > 0.999
    assert np.argmax(r) == np.argmax(g)


def test_plan_tiles_lane_aligned_non_pow2():
    """Decode shapes tile at full lane-aligned width (tn=6400 for the
    32000-wide lm head, the largest 128-aligned divisor under the cap)
    with tk=256 — the swept v5e winner; prefill falls back to the
    VMEM-modeled rungs."""
    assert kernels._plan_tiles(8, 4096, 32000, 8) == (256, 6400)
    assert kernels._plan_tiles(8, 4096, 4096, 4) == (256, 4096)
    assert kernels._plan_tiles(8, 8192, 7168, 4) == (256, 7168)
    # prefill (m > 32) keeps the VMEM-modeled generic path
    assert kernels._plan_tiles(512, 4096, 32000, 8) == (1024, 1280)
    # and the kernel is numerically right at a 640-divisible width
    k, n, m = 128, 640, 4
    w = jnp.asarray(rnd((k, n), seed=8, scale=0.1))
    x = jnp.asarray(rnd((m, k), seed=9))
    q = quantize(w, bits=8)
    kernels.FORCE_INTERPRET = True
    try:
        assert kernels._plan_tiles(m, k, n, 8)[1] == 640
        got = kernels.dequant_matmul(x, q)
    finally:
        kernels.FORCE_INTERPRET = False
    ref = jnp.dot(x, dequantize(q))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_lm_head_pad_and_slice_agree(tiny_config):
    """The int8 lm head pads to an aligned width (vocab 4000 -> 4096)
    and forward_impl slices logits back, so (a) logits come back
    vocab-wide, (b) an all-negative real-logit row can never argmax
    into a zero pad column, (c) padded and unpadded heads agree."""
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.models.llama import forward
    from llamago_tpu.ops.quant import lm_head_pad_cols, lm_head_padded_cols
    from llamago_tpu.runtime.kv_cache import KVCache

    from conftest import random_ggjt_tensors

    vocab = 4000
    assert lm_head_pad_cols(vocab) == 96
    assert lm_head_padded_cols(vocab) == 4096

    cfg = tiny_config.replace(dtype="float32", weight_dtype="int8",
                              vocab_size=vocab)
    tensors = random_ggjt_tensors(cfg, seed=11)
    host = host_parameters(cfg, tensors)
    params = quantize_params(cfg, host)
    assert params["output"]["q8"].shape[-1] == 4096  # padded
    assert params["output"]["s"].shape[-1] == 4096

    tokens = jnp.array([[1, 7, 99]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    got, _ = forward(params, tokens, KVCache.create(cfg, batch=1,
                                                    dtype=jnp.float32),
                     pos, cfg)
    assert got.shape[-1] == vocab  # sliced back before any consumer
    assert 0 <= int(jnp.argmax(got, -1)[0]) < vocab

    # numerics: padded head == unpadded head on the real columns
    import llamago_tpu.ops.quant as quant_mod
    orig = quant_mod.LM_HEAD_PAD
    try:
        quant_mod.LM_HEAD_PAD = 1  # effectively disables padding
        params_unpadded = quantize_params(cfg, host)
    finally:
        quant_mod.LM_HEAD_PAD = orig
    assert params_unpadded["output"]["q8"].shape[-1] == vocab
    ref, _ = forward(params_unpadded, tokens,
                     KVCache.create(cfg, batch=1, dtype=jnp.float32),
                     pos, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- w4x8
# int4 exec format (ops/quant.py quantize_w4x8 + ops/kernels.py
# _w4x8_* kernels): hardware-bitcast nibble layout, group-128 scales,
# W4A8 int8-MXU decode path.

from llamago_tpu.ops.quant import (  # noqa: E402
    G4X8,
    int4_exec_format,
    quantize_w4x8,
    unpack_w4x8,
    w4x8_from_leaf,
)


def test_w4x8_roundtrip_error():
    w = jnp.asarray(rnd((256, 64), seed=11))
    q = quantize_w4x8(w)
    assert is_quantized(q)
    assert q["q4x"].dtype == jnp.uint8 and q["q4x"].shape == (128, 64)
    assert q["s"].shape == (2 * (256 // G4X8), 64)  # dup rows
    deq = dequantize(q)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    d = np.abs(np.asarray(q["s"], np.float32))
    bound = d * (1.0 + 8.0 * 2.0**-9)  # same clip/bf16 analysis as Q4_0
    assert (err.reshape(4, G4X8 // 2, 64) <= bound[:, None, :] + 1e-6).all()


def test_w4x8_pack_matches_bitcast():
    """The interleaved packing must agree with pltpu.bitcast's sublane
    order — this is the load-time contract the decode kernel relies on
    (verified identical on real v5e and in interpret mode)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = jnp.asarray(rnd((128, 128), seed=12))
    q = quantize_w4x8(w)

    def kern(q_ref, o_ref):
        o_ref[:] = pltpu.bitcast(q_ref[:], jnp.int4).astype(jnp.int32)

    got = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(q["q4x"])
    ref = unpack_w4x8(q["q4x"]).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_w4x8_decode_kernel_matches_reference():
    """W4A8 decode path (m <= 16): activation int8 quantization bounds
    the error at ~1/127 relative per group."""
    k, n, m = 256, 256, 3
    w = jnp.asarray(rnd((k, n), seed=13, scale=0.1))
    x = jnp.asarray(rnd((m, k), seed=14))
    q = quantize_w4x8(w)
    ref = jnp.dot(x, dequantize(q))
    kernels.FORCE_INTERPRET = True
    try:
        assert kernels.can_fuse(x, q)
        got = kernels.dequant_matmul(x, q)
    finally:
        kernels.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_w4x8_stream_kernel_matches_reference():
    """Prefill path (m > 16): exact w4x8 numerics, f32 dequant chain."""
    k, n, m = 256, 256, 64
    w = jnp.asarray(rnd((k, n), seed=15, scale=0.1))
    x = jnp.asarray(rnd((m, k), seed=16))
    q = quantize_w4x8(w)
    ref = jnp.dot(x, dequantize(q))
    kernels.FORCE_INTERPRET = True
    try:
        assert kernels.can_fuse(x, q)
        got = kernels.dequant_matmul(x, q)
    finally:
        kernels.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_w4x8_from_q4_leaf():
    w = jnp.asarray(rnd((256, 64), seed=17))
    q4 = quantize(w, bits=4)
    q4x = w4x8_from_leaf(q4)
    assert "q4x" in q4x and q4x["s"].shape == (4, 64)
    # requantization error: bounded by the sum of both rounding steps
    err = np.abs(np.asarray(dequantize(q4x)) - np.asarray(dequantize(q4)))
    d = np.abs(np.asarray(q4x["s"], np.float32))
    assert (err.reshape(4, G4X8 // 2, 64) <= d[:, None, :] * 1.01 + 1e-6).all()
    # Q4_1 affine and odd-k leaves pass through untouched
    q41 = dict(q4, m=jnp.zeros_like(q4["s"]))
    assert w4x8_from_leaf(q41) is q41


def test_w4x8_exec_format_selection(tiny_config, monkeypatch):
    from llamago_tpu import config as cfgmod

    cfg = tiny_config
    params = {
        "tok_embeddings": rnd((cfg.vocab_size, cfg.dim), seed=18),
        "norm": rnd((cfg.dim,), seed=19),
        "output": rnd((cfg.dim, cfg.vocab_size), seed=20),
        "layers": {},
    }
    cfg4 = cfgmod.ModelConfig(**{**cfg.__dict__, "weight_dtype": "int4"})
    monkeypatch.setenv("LLAMAGO_INT4_EXEC", "w4x8")
    qp = quantize_params(cfg4, params)
    if cfg.dim % G4X8 == 0:
        assert "q4x" in qp["output"]
    monkeypatch.setenv("LLAMAGO_INT4_EXEC", "q4_0")
    qp = quantize_params(cfg4, params)
    assert "q4" in qp["output"] or not is_quantized(qp["output"])
    assert int4_exec_format() == "q4_0"


def test_w4x8_params_end_to_end_decode(monkeypatch):
    """int4/w4x8 exec through the full forward with the Pallas kernels
    (interpret mode): logits stay correlated with f32 and the engine
    generates deterministically."""
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.config import ModelConfig
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    from conftest import random_ggjt_tensors

    monkeypatch.setenv("LLAMAGO_INT4_EXEC", "w4x8")
    # dim 128 so every attention projection takes the w4x8 format (the
    # 352-wide ffn leaves keep Q4_0 — the realistic mixed ingest tree)
    cfg32 = ModelConfig(vocab_size=512, dim=128, n_layers=2, n_heads=4,
                        multiple_of=32, max_seq_len=128,
                        dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(cfg32, seed=21)
    host = host_parameters(cfg32, tensors)
    params32 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)), host)

    cfg4 = cfg32.replace(weight_dtype="int4")
    params4 = quantize_params(cfg4, host)
    assert "q4x" in params4["layers"]["wq"]

    tokens = jnp.array([[1, 5, 42, 300]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    ref, _ = forward(params32, tokens,
                     KVCache.create(cfg32, batch=1, dtype=jnp.float32),
                     pos, cfg32)
    kernels.FORCE_INTERPRET = True
    try:
        got, _ = forward(params4, tokens,
                         KVCache.create(cfg4, batch=1, dtype=jnp.float32),
                         pos, cfg4)
    finally:
        kernels.FORCE_INTERPRET = False
    r, g = np.asarray(ref[0]), np.asarray(got[0])
    # int4 on a tiny random model is noisy by nature: the exact-ggml
    # q4_0 exec measures corr 0.988 here and w4x8's group-32->128
    # requant costs a little more (0.973 at this seed) — mirrored by
    # the quality gate's +0.099 ppl w4x8-ingest row on the real proxy
    assert np.corrcoef(r, g)[0, 1] > 0.95
    assert np.argmax(r) == np.argmax(g)
