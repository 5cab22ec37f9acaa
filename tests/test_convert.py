"""Converter tests: Meta .pth conversion, TP-shard reassembly rules,
HF un-permutation, sp_model protobuf roundtrip — and an end-to-end logits
parity check against HuggingFace transformers as an external oracle."""

import json
import os

import numpy as np
import pytest

from llamago_tpu.checkpoint.convert import (
    convert,
    split_dim_for,
    unpermute_hf_rope,
    vocab_from_sp_model,
)
from llamago_tpu.checkpoint.ggjt import read_ggjt
from llamago_tpu.checkpoint.sp_model import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePiece,
    read_sp_model,
    write_sp_model,
)


def make_sp_model(path, extra=()):
    pieces = [
        SentencePiece("<unk>", 0.0, UNKNOWN),
        SentencePiece("<s>", 0.0, CONTROL),
        SentencePiece("</s>", 0.0, CONTROL),
    ]
    pieces += [SentencePiece(f"<0x{b:02X}>", -1000.0, BYTE) for b in range(256)]
    pieces += [SentencePiece(p, s, NORMAL) for p, s in extra]
    write_sp_model(path, pieces)
    return pieces


def test_sp_model_roundtrip(tmp_path):
    path = str(tmp_path / "tokenizer.model")
    pieces = make_sp_model(path, extra=[("▁hello", -1.5), ("wo", -2.0)])
    back = read_sp_model(path)
    assert len(back) == len(pieces)
    assert back[0].is_unknown and back[1].is_control
    assert back[3].is_byte and back[3].byte_value() == 0
    assert back[-2].piece == "▁hello"
    assert abs(back[-2].score - (-1.5)) < 1e-6


def test_vocab_piece_conventions(tmp_path):
    path = str(tmp_path / "tokenizer.model")
    make_sp_model(path, extra=[("▁the", -1.0)])
    vocab = vocab_from_sp_model(path)
    assert vocab.id_to_piece(0) == " ⁇ ".encode()   # unknown
    assert vocab.id_to_piece(1) == b""               # control -> empty
    assert vocab.id_to_piece(3 + 0x41) == b"A"       # byte piece -> raw byte
    assert vocab.id_to_piece(len(vocab) - 1) == b" the"  # U+2581 -> space


def test_split_dim_rules():
    # reference: scripts/convert-pth-to-ggml.py:161-188
    assert split_dim_for("output.weight") == 0
    assert split_dim_for("layers.3.attention.wq.weight") == 0
    assert split_dim_for("layers.0.feed_forward.w3.weight") == 0
    assert split_dim_for("tok_embeddings.weight") == 1
    assert split_dim_for("layers.5.attention.wo.weight") == 1
    assert split_dim_for("layers.2.feed_forward.w2.weight") == 1


def test_unpermute_hf_roundtrip():
    rng = np.random.default_rng(0)
    h, hd, d = 4, 16, 64
    w = rng.standard_normal((h * hd, d)).astype(np.float32)
    # the HF permutation (as done when Meta weights are converted TO hf)
    permuted = w.reshape(h, hd // 2, 2, d).swapaxes(1, 2).reshape(h * hd, d)
    restored = unpermute_hf_rope(permuted, h)
    np.testing.assert_array_equal(restored, w)


def _make_meta_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    dim, layers, heads = 4096, 1, 4  # dim 4096 => n_parts 1
    d = tmp_path / "7B"
    d.mkdir()
    (d / "params.json").write_text(json.dumps(
        {"dim": dim, "n_heads": heads, "n_layers": layers,
         "multiple_of": 256, "vocab_size": -1}
    ))
    make_sp_model(str(tmp_path / "tokenizer.model"), extra=[("▁hi", -1.0)])
    rng = np.random.default_rng(1)
    # a *small* fake state dict (converter must not care about exact shapes)
    state = {
        "tok_embeddings.weight": torch.from_numpy(
            rng.standard_normal((260, 8)).astype(np.float32)),
        "norm.weight": torch.ones(8),
        "output.weight": torch.from_numpy(
            rng.standard_normal((260, 8)).astype(np.float32)),
        "rope.freqs": torch.ones(4),  # must be skipped
    }
    for i in range(layers):
        for suffix, shape in [
            ("attention_norm.weight", (8,)), ("ffn_norm.weight", (8,)),
            ("attention.wq.weight", (8, 8)), ("attention.wk.weight", (8, 8)),
            ("attention.wv.weight", (8, 8)), ("attention.wo.weight", (8, 8)),
            ("feed_forward.w1.weight", (16, 8)),
            ("feed_forward.w2.weight", (8, 16)),
            ("feed_forward.w3.weight", (16, 8)),
        ]:
            state[f"layers.{i}.{suffix}"] = torch.from_numpy(
                rng.standard_normal(shape).astype(np.float32))
    torch.save(state, str(d / "consolidated.00.pth"))
    return d, state


def test_meta_convert_roundtrip(tmp_path):
    d, state = _make_meta_checkpoint(tmp_path)
    out = convert(str(d), ftype=0, fmt="meta")
    ckpt = read_ggjt(out)
    assert "rope.freqs" not in ckpt.tensors
    np.testing.assert_allclose(
        ckpt.tensors["layers.0.attention.wq.weight"],
        state["layers.0.attention.wq.weight"].numpy(),
    )
    # f16 mode: 2-D f16, 1-D stays f32 (reference :152-157)
    out16 = convert(str(d), out_path=str(d / "f16.bin"), ftype=1, fmt="meta")
    ck16 = read_ggjt(out16)
    assert ck16.tensors["output.weight"].dtype == np.float16
    assert ck16.tensors["norm.weight"].dtype == np.float32


def test_hf_logits_parity(tmp_path):
    """End-to-end external-oracle test: convert a tiny HF LLaMA and compare
    our forward's logits against transformers'."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from llamago_tpu.checkpoint.convert import load_hf_checkpoint
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.config import ModelConfig
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    hf_config = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=176,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf_model = transformers.LlamaForCausalLM(hf_config).eval()
    d = tmp_path / "hf"
    hf_model.save_pretrained(str(d))

    hparams, tensors = load_hf_checkpoint(str(d))
    config = ModelConfig(
        vocab_size=hparams["vocab_size"], dim=hparams["dim"],
        n_layers=hparams["n_layers"], n_heads=hparams["n_heads"],
        n_kv_heads=hparams["n_kv_heads"], ffn_dim=hparams["ffn_dim"],
        max_seq_len=32, dtype="float32", weight_dtype="float32",
    )
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    ids = np.array([[1, 17, 99, 4, 55, 101]], np.int32)
    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    ours, _ = forward(
        params, jnp.asarray(ids), cache, jnp.zeros(1, jnp.int32), config,
        return_all_logits=True,
    )
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=0, atol=5e-3)


def _make_multipart_meta_checkpoint(tmp_path, n_parts=2):
    """Synthetic 2-part Meta checkpoint (dim 5120 => n_parts 2): each part
    holds its TP shard, split along the reference's per-tensor rules."""
    torch = pytest.importorskip("torch")
    d = tmp_path / "13B"
    d.mkdir()
    (d / "params.json").write_text(json.dumps(
        {"dim": 5120, "n_heads": 4, "n_layers": 1,
         "multiple_of": 256, "vocab_size": -1}
    ))
    make_sp_model(str(tmp_path / "tokenizer.model"), extra=[("▁hi", -1.0)])
    rng = np.random.default_rng(7)
    full = {
        "tok_embeddings.weight": rng.standard_normal((260, 16)).astype(np.float32),
        "norm.weight": np.ones(8, np.float32),
        "output.weight": rng.standard_normal((260, 8)).astype(np.float32),
        "layers.0.attention_norm.weight": np.ones(8, np.float32),
        "layers.0.ffn_norm.weight": np.ones(8, np.float32),
        "layers.0.attention.wq.weight": rng.standard_normal((8, 8)).astype(np.float32),
        "layers.0.attention.wk.weight": rng.standard_normal((8, 8)).astype(np.float32),
        "layers.0.attention.wv.weight": rng.standard_normal((8, 8)).astype(np.float32),
        "layers.0.attention.wo.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "layers.0.feed_forward.w1.weight": rng.standard_normal((16, 8)).astype(np.float32),
        "layers.0.feed_forward.w2.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "layers.0.feed_forward.w3.weight": rng.standard_normal((16, 8)).astype(np.float32),
    }
    for p in range(n_parts):
        state = {}
        for name, arr in full.items():
            split = split_dim_for(name)
            if arr.ndim != 2:
                state[name] = torch.from_numpy(arr)  # replicated
            elif split == 0:
                rows = arr.shape[0] // n_parts
                state[name] = torch.from_numpy(arr[p * rows:(p + 1) * rows].copy())
            else:
                cols = arr.shape[1] // n_parts
                state[name] = torch.from_numpy(arr[:, p * cols:(p + 1) * cols].copy())
        state["rope.freqs"] = torch.ones(4)
        torch.save(state, str(d / f"consolidated.{p:02d}.pth"))
    return d, full


def test_streaming_multipart_convert(tmp_path):
    """The streaming converter reassembles 2-part TP shards into exactly
    the full tensors, for both split dims and both ftypes."""
    d, full = _make_multipart_meta_checkpoint(tmp_path)
    out = convert(str(d), ftype=0, fmt="meta")
    ckpt = read_ggjt(out)
    assert "rope.freqs" not in ckpt.tensors
    for name, arr in full.items():
        np.testing.assert_array_equal(
            np.asarray(ckpt.tensors[name]), arr, err_msg=name)

    out16 = convert(str(d), out_path=str(d / "f16.bin"), ftype=1, fmt="meta")
    ck16 = read_ggjt(out16)
    assert ck16.tensors["output.weight"].dtype == np.float16
    assert ck16.tensors["norm.weight"].dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(ck16.tensors["layers.0.attention.wo.weight"], np.float32),
        full["layers.0.attention.wo.weight"], rtol=1e-3, atol=1e-3)


def test_streaming_matches_in_ram_loader(tmp_path):
    """stream_meta_to_ggjt output == write_ggjt(load_meta_checkpoint) output
    tensor-for-tensor (single-part path shares the same code)."""
    from llamago_tpu.checkpoint.convert import load_meta_checkpoint

    d, _ = _make_multipart_meta_checkpoint(tmp_path)
    _, ram = load_meta_checkpoint(str(d))
    out = convert(str(d), out_path=str(d / "s.bin"), ftype=0, fmt="meta")
    ckpt = read_ggjt(out)
    assert set(ram) == set(ckpt.tensors)
    for name in ram:
        np.testing.assert_array_equal(
            np.asarray(ckpt.tensors[name]), ram[name], err_msg=name)


def test_gqa_rope_theta_file_roundtrip(tmp_path):
    """GQA + non-default rope_theta survive the ggjt FILE round-trip
    (the v1 header can't carry them: kv_heads/ffn are inferred from
    tensor shapes, rope_theta rides the sidecar). Logits through the
    reloaded file must match transformers exactly like the direct path."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax
    import jax.numpy as jnp

    from llamago_tpu.checkpoint.convert import load_hf_checkpoint
    from llamago_tpu.checkpoint.ggjt import read_ggjt, write_ggjt, write_meta_sidecar
    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.config import ModelConfig
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache
    from llamago_tpu.tokenizer import Vocab

    hf_config = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=176,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=500000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf_model = transformers.LlamaForCausalLM(hf_config).eval()
    d = tmp_path / "hf"
    hf_model.save_pretrained(str(d))

    hparams, tensors = load_hf_checkpoint(str(d))
    config = ModelConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=176, rope_theta=500000.0, max_seq_len=32,
        dtype="float32", weight_dtype="float32",
    )
    vocab = Vocab([(b"t%d" % i, -float(i)) for i in range(128)])
    path = str(tmp_path / "gqa.bin")
    write_ggjt(path, config, vocab,
               {k: np.asarray(v, np.float32) for k, v in tensors.items()},
               ftype=0)
    write_meta_sidecar(path, config)

    ckpt = read_ggjt(path, max_seq_len=32)
    # inferred + sidecar fields
    assert ckpt.config.kv_heads == 2
    assert ckpt.config.ffn_hidden == 176
    assert ckpt.config.rope_theta == 500000.0

    cfg = ckpt.config.replace(dtype="float32", weight_dtype="float32")
    params = load_parameters(cfg, ckpt.tensors)
    ids = np.array([[1, 17, 99, 4]], np.int32)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ours, _ = forward(params, jnp.asarray(ids), cache,
                      jnp.zeros(1, jnp.int32), cfg, return_all_logits=True)
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=0, atol=5e-3)


def test_hf_streaming_convert_logits_parity(tmp_path):
    """The constant-memory HF safetensors conversion (config.json parse +
    per-tensor safe_open streaming, no transformers model load) produces
    a file whose logits match transformers exactly."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from llamago_tpu.checkpoint.convert import _hf_safetensor_files
    from llamago_tpu.checkpoint.ggjt import read_ggjt
    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache

    hf_config = transformers.LlamaConfig(
        vocab_size=262, hidden_size=64, intermediate_size=176,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=123456.0,
        tie_word_embeddings=True,  # exercise the lm-head re-read
    )
    torch.manual_seed(3)
    hf_model = transformers.LlamaForCausalLM(hf_config).eval()
    d = tmp_path / "hf"
    hf_model.save_pretrained(str(d), safe_serialization=True)
    make_sp_model(str(d / "tokenizer.model"), extra=[("▁hi", -1.0)])
    assert _hf_safetensor_files(str(d)), "fixture must be safetensors"

    out = convert(str(d), out_path=str(tmp_path / "hf.bin"), ftype=0, fmt="hf")
    ckpt = read_ggjt(out, max_seq_len=32)
    assert ckpt.config.kv_heads == 2
    assert ckpt.config.rope_theta == 123456.0  # via the sidecar

    cfg = ckpt.config.replace(dtype="float32", weight_dtype="float32")
    params = load_parameters(cfg, ckpt.tensors)
    ids = np.array([[1, 17, 99, 4, 55]], np.int32)
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    ours, _ = forward(params, jnp.asarray(ids), cache,
                      jnp.zeros(1, jnp.int32), cfg, return_all_logits=True)
    with torch.no_grad():
        theirs = hf_model(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=0, atol=5e-3)


def test_convert_cli_out_and_vocab_only(tmp_path):
    """`convert --out` is honored and `--vocab-only` is reachable from the
    CLI (reference: scripts/convert-pth-to-ggml.py:77-82,243-252)."""
    import argparse

    from llamago_tpu.checkpoint.convert import convert_cli

    d, _ = _make_meta_checkpoint(tmp_path)
    out = str(tmp_path / "custom-name.bin")
    args = argparse.Namespace(model=str(d), out=out, dtype="float32",
                              vocab_only=False)
    assert convert_cli(args) == 0
    assert os.path.exists(out)
    read_ggjt(out)

    vout = str(tmp_path / "vocab-only.bin")
    args = argparse.Namespace(model=str(d), out=vout, dtype="float32",
                              vocab_only=True)
    assert convert_cli(args) == 0
    ckpt = read_ggjt(vout)
    assert ckpt.tensors == {}
    assert len(ckpt.vocab) > 0


def test_hf_vocab_only_convert(tmp_path):
    """--vocab-only on an HF checkpoint: hparams still load from
    config.json so the header carries real dims (regression: dim=0 /
    n_heads=0 crashed head_dim with ZeroDivisionError)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from llamago_tpu.checkpoint.ggjt import read_ggjt

    hf_config = transformers.LlamaConfig(
        vocab_size=262, hidden_size=64, intermediate_size=176,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(4)
    transformers.LlamaForCausalLM(hf_config).eval().save_pretrained(
        str(tmp_path / "hf"), safe_serialization=True)
    make_sp_model(str(tmp_path / "hf" / "tokenizer.model"),
                  extra=[("▁hi", -1.0)])

    out = convert(str(tmp_path / "hf"), out_path=str(tmp_path / "v.bin"),
                  ftype=0, fmt="hf", vocab_only=True)
    ckpt = read_ggjt(out)
    assert ckpt.tensors == {}
    assert len(ckpt.vocab) > 0
    assert ckpt.config.dim == 64  # real dims, not zeros

    # and a zero-tensor checkpoint fails CLEARLY at parameter assembly
    from llamago_tpu.checkpoint.params import host_parameters

    with pytest.raises(ValueError, match="no model tensors"):
        host_parameters(ckpt.config, ckpt.tensors)
