"""Native C++ kernels (parity vs numpy) and Q8_0/Q4_0 ggjt file flow."""

import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu import native
from llamago_tpu.checkpoint.ggjt import read_ggjt, write_ggjt
from llamago_tpu.checkpoint.quant_file import (
    QuantTensor,
    dequantize_rows,
    quantize_array,
    quantize_ggjt,
    quantize_rows_q4_0,
    quantize_rows_q8_0,
    to_device_leaf,
)

from conftest import make_test_vocab, random_ggjt_tensors


def rnd(shape, seed=0):
    return (np.random.default_rng(seed).standard_normal(shape) * 0.1).astype(np.float32)


# ----------------------------------------------------------------- native

def test_native_builds():
    assert native.build(), "g++ build of libggjt.so failed"
    assert native.available()


def test_native_fp16_bit_exact():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.standard_normal(4096).astype(np.float16),
        np.array([0, -0, np.inf, -np.inf, np.nan, 6.1e-5, 5.9e-8], np.float16),
    ])
    got = native.fp16_to_fp32(vals)
    want = vals.astype(np.float32)
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=12345), np.nan_to_num(want, nan=12345)
    )


@pytest.mark.parametrize("kind", ["q8_0", "q4_0"])
def test_native_quantize_matches_numpy(kind):
    x = rnd((64, 128), seed=1)
    fn = native.quantize_rows(kind)
    assert fn is not None
    got = fn(x)
    want = quantize_rows_q8_0(x) if kind == "q8_0" else quantize_rows_q4_0(x)
    # scales may differ in the last ULP of f16; compare dequantized values
    g = dequantize_rows(QuantTensor(kind, got, (64, 128)))
    w = dequantize_rows(QuantTensor(kind, want, (64, 128)))
    np.testing.assert_allclose(g, w, rtol=0, atol=2e-3)
    # and the vast majority of bytes should be identical
    assert (got == want).mean() > 0.99


def test_native_transpose():
    x = rnd((100, 70), seed=2)
    got = native.transpose_f32(x)
    np.testing.assert_array_equal(got, x.T)


# ------------------------------------------------------------- file format

@pytest.mark.parametrize("kind", ["q8_0", "q4_0"])
def test_quant_block_roundtrip(kind):
    x = rnd((16, 64), seed=3)
    qt = quantize_array(x, kind)
    deq = dequantize_rows(qt)
    bound = np.abs(x).reshape(16, 2, 32).max(axis=-1, keepdims=True) / (
        120 if kind == "q8_0" else 7.0
    )
    err = np.abs(deq - x).reshape(16, 2, 32)
    assert (err <= bound + 1e-6).all()


def test_device_leaf_matches_runtime_quantizer():
    """File blocks -> device leaf must equal ops.quant.quantize of the
    transposed weight (same packing, same scales up to f16 rounding)."""
    from llamago_tpu.ops.quant import dequantize as deq_dev

    x = rnd((32, 64), seed=4)  # [out, in]
    qt = quantize_array(x, "q4_0")
    leaf = to_device_leaf(qt)  # [in, out] layout
    deq_file = np.asarray(deq_dev(leaf))  # [in, out]
    np.testing.assert_allclose(deq_file.T, dequantize_rows(qt), rtol=0, atol=1e-6)


def test_quantize_ggjt_end_to_end(tmp_path, tiny_config):
    """f32 ggjt -> quantize tool -> load -> decode; logits close to dense."""
    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_config.replace(dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(config, seed=5)
    vocab = make_test_vocab()
    tokens = list(vocab.tokens)
    while len(tokens) < config.vocab_size:
        tokens.append((f"<pad{len(tokens)}>".encode(), -10000.0))
    from llamago_tpu.tokenizer import Vocab

    vocab = Vocab(tokens[: config.vocab_size])

    f32_path = str(tmp_path / "tiny-f32.bin")
    write_ggjt(f32_path, config, vocab, tensors)
    q8_path = quantize_ggjt(f32_path, str(tmp_path / "tiny-q8.bin"), "q8_0")

    ckpt = read_ggjt(q8_path)
    assert ckpt.ftype == 7
    assert ckpt.config.weight_dtype == "int8"
    assert isinstance(ckpt.tensors["layers.0.attention.wq.weight"], QuantTensor)
    assert ckpt.tensors["norm.weight"].dtype == np.float32

    qconfig = ckpt.config.replace(dtype="float32", max_seq_len=64)
    qparams = load_parameters(qconfig, ckpt.tensors)

    dense = load_parameters(config.replace(max_seq_len=64), tensors)
    toks = jnp.array([[1, 5, 42, 300]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)
    ref, _ = forward(dense, toks,
                     KVCache.create(config, batch=1, max_seq=64, dtype=jnp.float32),
                     pos, config.replace(max_seq_len=64))
    got, _ = forward(qparams, toks,
                     KVCache.create(qconfig, batch=1, dtype=jnp.float32),
                     pos, qconfig)
    r, g = np.asarray(ref[0]), np.asarray(got[0])
    assert np.corrcoef(r, g)[0, 1] > 0.999
    assert np.argmax(r) == np.argmax(g)


def test_q4_1_file_roundtrip_and_device_leaf():
    """Q4_1 affine blocks: quantize -> dequantize error bound, device
    leaf dequant parity, ggjt write/read roundtrip."""
    import numpy as np

    from llamago_tpu.checkpoint.quant_file import (
        QuantTensor,
        dequantize_rows,
        quantize_array,
        row_bytes,
        to_device_leaf,
    )
    from llamago_tpu.ops.quant import dequantize

    rng = np.random.default_rng(9)
    x = (rng.standard_normal((64, 128)) * 0.05).astype(np.float32)
    qt = quantize_array(x, "q4_1")
    assert qt.kind == "q4_1"
    assert qt.raw.shape == (64, row_bytes("q4_1", 128))

    deq = dequantize_rows(qt)
    # Q4_1 error bound: d/2 per element (affine covers the full range)
    blocks = x.reshape(64, 4, 32)
    d = (blocks.max(-1) - blocks.min(-1)) / 15.0
    err = np.abs(deq - x).reshape(64, 4, 32)
    assert (err <= d[..., None] / 2 + np.abs(x).max() * 2**-10 + 1e-7).all()

    # device leaf: XLA dequant path matches the numpy reference
    leaf = to_device_leaf(qt)
    assert set(leaf) == {"q4", "s", "m"}
    dev = np.asarray(dequantize(leaf))
    np.testing.assert_allclose(dev, deq.T, rtol=1e-5, atol=1e-6)


def test_q4_1_end_to_end_forward(tiny_config, test_vocab, tmp_path):
    """quantize a ggjt to Q4_1, load it, decode — matches Q4_1-dequant
    forward within quantization noise (exercises ftype=3 loader path)."""
    import jax.numpy as jnp
    import numpy as np

    from conftest import random_ggjt_tensors
    from test_ggjt import padded_vocab

    from llamago_tpu.checkpoint import load_parameters, read_ggjt, write_ggjt
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt
    from llamago_tpu.models.llama import forward_impl
    from llamago_tpu.runtime.kv_cache import KVCache

    config = tiny_config.replace(dtype="float32", weight_dtype="float32",
                                 max_seq_len=32)
    vocab = padded_vocab(test_vocab, config.vocab_size)
    tensors = random_ggjt_tensors(config, seed=5)
    src = str(tmp_path / "f32.bin")
    dst = str(tmp_path / "q41.bin")
    write_ggjt(src, config, vocab, tensors)
    quantize_ggjt(src, dst, kind="q4_1")

    ckpt = read_ggjt(dst, max_seq_len=32)
    assert ckpt.ftype == 3
    qconfig = ckpt.config.replace(dtype="float32", max_seq_len=32)
    params = load_parameters(qconfig, ckpt.tensors)
    tokens = jnp.asarray([[3, 9, 2]], jnp.int32)
    logits, _ = forward_impl(
        params, tokens, KVCache.create(qconfig, batch=1, dtype=jnp.float32),
        jnp.zeros(1, jnp.int32), qconfig,
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_quantize_skips_non_block_aligned_tensors(tmp_path):
    """A matmul whose in-dim doesn't divide the 32-element block (e.g. a
    176-wide FFN) must stay DENSE through quantize + reload — quantizing
    it would silently truncate the trailing elements, and the loader
    used to re-quantize such leaves and assert."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.gguf import read_checkpoint
    from llamago_tpu.checkpoint.ggjt import write_ggjt
    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.config import MODEL_PRESETS
    from llamago_tpu.ops.quant import is_quantized

    vocab = make_test_vocab()
    config = dataclasses.replace(
        MODEL_PRESETS["tiny"], vocab_size=len(vocab), ffn_dim=176,
        max_seq_len=64, dtype="float32",
    )
    tensors = random_ggjt_tensors(config, seed=14)
    src = str(tmp_path / "odd-ffn.bin")
    write_ggjt(src, config, vocab, tensors, ftype=0)
    out = quantize_ggjt(src, str(tmp_path / "odd-ffn-q8.bin"), "q8_0")
    ckpt = read_checkpoint(out, max_seq_len=64)
    # w1 (in=64) quantized; w2 (in=176) stays dense
    assert isinstance(ckpt.tensors["layers.0.feed_forward.w1.weight"], QuantTensor)
    w2 = ckpt.tensors["layers.0.feed_forward.w2.weight"]
    assert not isinstance(w2, QuantTensor)
    params = load_parameters(
        ckpt.config.replace(dtype="float32"), ckpt.tensors)
    assert is_quantized(params["layers"]["w1"])
    assert not is_quantized(params["layers"]["w2"])
    jax.block_until_ready(jnp.asarray(params["layers"]["w2"]))
