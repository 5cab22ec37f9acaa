"""ggjt v1 format roundtrip + layout tests (reference: pkg/llama/llama.go:712-976)."""

import numpy as np
import pytest

from llamago_tpu.checkpoint import read_ggjt, write_ggjt
from llamago_tpu.checkpoint.ggjt import GGJT_MAGIC, expected_tensor_names
from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.tokenizer import Vocab

from conftest import make_test_vocab, random_ggjt_tensors


def padded_vocab(vocab: Vocab, size: int) -> Vocab:
    tokens = list(vocab.tokens)
    while len(tokens) < size:
        tokens.append((f"<pad{len(tokens)}>".encode(), -10000.0))
    return Vocab(tokens[:size])


@pytest.fixture(scope="module")
def tiny_ckpt_path(tmp_path_factory):
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"]
    vocab = padded_vocab(make_test_vocab(), config.vocab_size)
    tensors = random_ggjt_tensors(config)
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny-f32.bin")
    write_ggjt(path, config, vocab, tensors)
    return path, config, vocab, tensors


def test_roundtrip_header_and_vocab(tiny_ckpt_path):
    path, config, vocab, _ = tiny_ckpt_path
    ckpt = read_ggjt(path)
    assert ckpt.config.vocab_size == config.vocab_size
    assert ckpt.config.dim == config.dim
    assert ckpt.config.n_layers == config.n_layers
    assert ckpt.config.n_heads == config.n_heads
    assert ckpt.config.multiple_of == config.multiple_of
    assert ckpt.config.ffn_hidden == config.ffn_hidden
    assert len(ckpt.vocab) == len(vocab)
    assert ckpt.vocab.tokens[:300] == vocab.tokens[:300]


def test_roundtrip_tensors_exact(tiny_ckpt_path):
    path, config, _, tensors = tiny_ckpt_path
    ckpt = read_ggjt(path)
    assert set(ckpt.tensors) == set(expected_tensor_names(config.n_layers))
    for name, arr in tensors.items():
        np.testing.assert_array_equal(ckpt.tensors[name], arr)


def test_fp16_file(tmp_path):
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"]
    vocab = padded_vocab(make_test_vocab(), config.vocab_size)
    tensors = random_ggjt_tensors(config)
    # converter coerces 1-D tensors to f32, 2-D to f16 when ftype=1
    # (reference: scripts/convert-pth-to-ggml.py:152-157)
    t16 = {
        k: (v.astype(np.float16) if v.ndim == 2 else v) for k, v in tensors.items()
    }
    path = str(tmp_path / "tiny-f16.bin")
    write_ggjt(path, config, vocab, t16)
    ckpt = read_ggjt(path)
    assert ckpt.ftype == 1
    assert ckpt.tensors["tok_embeddings.weight"].dtype == np.float16
    assert ckpt.tensors["norm.weight"].dtype == np.float32


def test_magic_check(tmp_path):
    p = tmp_path / "bogus.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_ggjt(str(p))
    assert GGJT_MAGIC == 0x67676A74


def test_host_parameters_layout(tiny_ckpt_path):
    path, config, _, tensors = tiny_ckpt_path
    ckpt = read_ggjt(path)
    params = host_parameters(config, ckpt.tensors)
    d, v, f, n = config.dim, config.vocab_size, config.ffn_hidden, config.n_layers
    assert params["tok_embeddings"].shape == (v, d)
    assert params["output"].shape == (d, v)
    assert params["layers"]["wq"].shape == (n, d, d)
    assert params["layers"]["w1"].shape == (n, d, f)
    assert params["layers"]["w2"].shape == (n, f, d)
    # transposition correctness: params[in, out] == file[out, in].T
    np.testing.assert_array_equal(
        params["layers"]["wq"][0], tensors["layers.0.attention.wq.weight"].T
    )
    np.testing.assert_array_equal(params["output"], tensors["output.weight"].T)


def test_vocab_padded_to_header(tmp_path):
    """A header vocab_size larger than the tokenizer list (padded-vocab
    GGUF inputs) emits filler pieces so the file round-trips instead of
    misparsing; a vocab LONGER than the header fails fast."""
    import pytest

    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"].replace(dtype="float32",
                                           weight_dtype="float32")
    vocab = make_test_vocab()
    config = config.replace(vocab_size=len(vocab) + 5)
    tensors = random_ggjt_tensors(config)
    path = str(tmp_path / "padded.bin")
    write_ggjt(path, config, vocab, tensors)
    ckpt = read_ggjt(path)
    assert len(ckpt.vocab) == config.vocab_size
    assert ckpt.vocab.tokens[-1][1] <= -1e8  # filler pieces unreachable

    with pytest.raises(ValueError, match="cannot represent"):
        write_ggjt(str(tmp_path / "overflow.bin"),
                   config.replace(vocab_size=len(vocab) - 1), vocab, tensors)
