"""GGUF reader (checkpoint/gguf.py): llama.cpp-ecosystem files load into
the same checkpoint structure as ggjt, bit-identical quantized blocks
included, and drive the same forward."""

import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.ggjt import write_ggjt
from llamago_tpu.checkpoint.gguf import is_gguf, read_checkpoint, write_gguf
from llamago_tpu.checkpoint.params import load_parameters
from llamago_tpu.checkpoint.quant_file import quantize_array
from llamago_tpu.models.llama import forward
from llamago_tpu.runtime.kv_cache import KVCache
from llamago_tpu.tokenizer import tokenize

from conftest import random_ggjt_tensors, make_test_vocab


def _fixture(tmp_path, quant=None):
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny-gqa"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64,
        rope_theta=123456.0,
    )
    vocab = make_test_vocab()
    config = config.replace(vocab_size=len(vocab))
    tensors = random_ggjt_tensors(config, seed=6)
    if quant:
        qnames = ("attention.wq", "attention.wk", "attention.wv",
                  "attention.wo", "feed_forward.w1", "feed_forward.w2",
                  "feed_forward.w3")
        tensors = {
            name: (quantize_array(np.asarray(arr, np.float32), quant)
                   if any(q in name for q in qnames) or name == "output.weight"
                   else arr)
            for name, arr in tensors.items()
        }
    path = str(tmp_path / "model.gguf")
    write_gguf(path, config, vocab, tensors)
    return path, config, vocab, tensors


def test_gguf_roundtrip_f32(tmp_path):
    path, config, vocab, tensors = _fixture(tmp_path)
    assert is_gguf(path)
    ckpt = read_checkpoint(path, max_seq_len=64)
    assert ckpt.config.dim == config.dim
    assert ckpt.config.kv_heads == 2  # GQA via head_count_kv metadata
    assert ckpt.config.rope_theta == 123456.0
    assert len(ckpt.vocab) == len(vocab)
    for name, arr in tensors.items():
        np.testing.assert_array_equal(
            np.asarray(ckpt.tensors[name]), np.asarray(arr), err_msg=name)


def test_gguf_quantized_blocks_bit_identical(tmp_path):
    path, config, vocab, tensors = _fixture(tmp_path, quant="q8_0")
    ckpt = read_checkpoint(path, max_seq_len=64)
    assert ckpt.config.weight_dtype == "int8"
    qt = ckpt.tensors["layers.0.attention.wq.weight"]
    ref = tensors["layers.0.attention.wq.weight"]
    assert qt.kind == "q8_0"
    np.testing.assert_array_equal(np.asarray(qt.raw), np.asarray(ref.raw))


def test_gguf_forward_matches_ggjt(tmp_path):
    """The SAME model written as GGUF and as ggjt produces identical
    logits through the full load + forward pipeline."""
    path, config, vocab, tensors = _fixture(tmp_path)
    gpath = str(tmp_path / "model.bin")
    write_ggjt(gpath, config, vocab,
               {k: np.asarray(v, np.float32) for k, v in tensors.items()},
               ftype=0)

    ids = np.array([[1, 9, 33, 7]], np.int32)
    outs = []
    for p in (path, gpath):
        ckpt = read_checkpoint(p, max_seq_len=64)
        cfg = ckpt.config.replace(dtype="float32", weight_dtype="float32",
                                  rope_theta=config.rope_theta)
        params = load_parameters(cfg, ckpt.tensors)
        cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
        logits, _ = forward(params, jnp.asarray(ids), cache,
                            jnp.zeros(1, jnp.int32), cfg,
                            return_all_logits=True)
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)


def test_gguf_vocab_tokenizes(tmp_path):
    path, config, vocab, _ = _fixture(tmp_path)
    ckpt = read_checkpoint(path, max_seq_len=64)
    ids_a = tokenize(vocab, " hello", bos=True)
    ids_b = tokenize(ckpt.vocab, " hello", bos=True)
    assert ids_a == ids_b


def test_quantize_gguf_input(tmp_path):
    """`quantize` accepts a GGUF f32 model and emits a Q8_0 ggjt file."""
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt

    path, config, vocab, tensors = _fixture(tmp_path)
    out = quantize_ggjt(path, str(tmp_path / "q8.bin"), "q8_0")
    ckpt = read_checkpoint(out, max_seq_len=64)
    assert ckpt.config.weight_dtype == "int8"
    qt = ckpt.tensors["layers.0.attention.wq.weight"]
    assert qt.kind == "q8_0"


def test_quantize_to_gguf_output(tmp_path):
    """ggjt f32 in -> Q4_0 GGUF out -> loads back with identical blocks."""
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt

    path, config, vocab, tensors = _fixture(tmp_path)
    out = quantize_ggjt(path, str(tmp_path / "q4.gguf"), "q4_0")
    assert is_gguf(out)
    ckpt = read_checkpoint(out, max_seq_len=64)
    assert ckpt.config.weight_dtype == "int4"
    assert ckpt.tensors["layers.0.attention.wq.weight"].kind == "q4_0"


def test_unknown_tokenizer_model_rejected(tmp_path):
    """An unrecognized tokenizer.ggml.model fails fast instead of
    tokenizing garbage (gpt2 byte-level BPE IS supported —
    tests/test_tokenizer_bpe.py)."""
    import pytest

    from llamago_tpu.checkpoint.gguf import _T_STRING

    path, config, vocab, tensors = _fixture(tmp_path)
    bad = str(tmp_path / "bad.gguf")
    write_gguf(bad, config, vocab, tensors,
               extra_meta={"tokenizer.ggml.model": (_T_STRING, b"wordpiece")})
    with pytest.raises(ValueError, match="wordpiece"):
        read_checkpoint(bad)


def test_tied_embeddings_alias(tmp_path):
    """A GGUF without output.weight (tied-embedding export, e.g.
    LLaMA-3.2 1B/3B llama.cpp files) aliases the embedding table as the
    lm head instead of KeyError-ing later in the loader."""
    path, config, vocab, tensors = _fixture(tmp_path)
    untied = {k: v for k, v in tensors.items() if k != "output.weight"}
    tied_path = str(tmp_path / "tied.gguf")
    write_gguf(tied_path, config, vocab, untied)
    ckpt = read_checkpoint(tied_path, max_seq_len=64)
    np.testing.assert_array_equal(
        np.asarray(ckpt.tensors["output.weight"]),
        np.asarray(ckpt.tensors["tok_embeddings.weight"]),
    )
    # and the full loader path works end-to-end
    params = load_parameters(ckpt.config, ckpt.tensors)
    assert params["output"].shape == params["tok_embeddings"].shape[::-1]


def test_missing_tensor_rejected(tmp_path):
    """A GGUF missing a required layer tensor fails at read time with a
    message naming the tensor (read_ggjt parity)."""
    import pytest

    path, config, vocab, tensors = _fixture(tmp_path)
    broken = {k: v for k, v in tensors.items()
              if k != "layers.0.feed_forward.w2.weight"}
    bad = str(tmp_path / "missing.gguf")
    write_gguf(bad, config, vocab, broken)
    with pytest.raises(ValueError, match="missing tensors"):
        read_checkpoint(bad, max_seq_len=64)
