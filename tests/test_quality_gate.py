"""Checkpoint export (params -> ggjt) and the quantization quality gate
harness (eval/quality_gate.py): train -> export -> file-quantize ->
reload through the serving loader -> perplexity."""

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.ggjt import read_ggjt, write_ggjt
from llamago_tpu.checkpoint.params import (
    export_ggjt_tensors,
    host_parameters,
    load_parameters,
)
from llamago_tpu.eval.quality_gate import run_gate

from conftest import random_ggjt_tensors


def test_export_roundtrips_host_parameters(tiny_config, tmp_path):
    config = tiny_config.replace(dtype="float32", weight_dtype="float32")
    tensors = random_ggjt_tensors(config, seed=3)
    host = host_parameters(config, tensors)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)), host)

    out = export_ggjt_tensors(config, params)
    assert set(out) == set(tensors) - {"rope.freqs"} if "rope.freqs" in tensors \
        else set(out) == set(tensors)
    for name, arr in tensors.items():
        np.testing.assert_allclose(out[name], np.asarray(arr), rtol=1e-6,
                                   err_msg=name)

    # and through a real file write/read/load cycle
    from llamago_tpu.tokenizer import Vocab

    vocab = Vocab([(b"t%d" % i, -float(i)) for i in range(config.vocab_size)])
    path = str(tmp_path / "exported.bin")
    write_ggjt(path, config, vocab, out, ftype=0)
    ckpt = read_ggjt(path)
    reloaded = load_parameters(
        ckpt.config.replace(dtype="float32", weight_dtype="float32"),
        ckpt.tensors,
    )
    np.testing.assert_allclose(
        np.asarray(reloaded["layers"]["wq"]), np.asarray(params["layers"]["wq"]),
        rtol=1e-6,
    )


def test_quality_gate_end_to_end(tmp_path):
    """Few-step gate run: all four ppl numbers finite, quantized deltas
    small relative to fp32 (the real artifact uses many more steps).
    fused=True also exercises the device-path rows (bf16 compute with
    quantized leaves — Pallas on TPU, jnp dequant at bf16 here on CPU)."""
    # dim=128 so the w4x8 exec rows actually engage (k % 128 == 0)
    r = run_gate(steps=8, batch=2, ctx=64, dim=128, n_layers=2,
                 tmp_dir=str(tmp_path), fused=True)
    assert set(r["ppl"]) == {"fp32", "q8_0", "q4_0", "q4_1", "kv_int8"}
    for k, v in r["ppl"].items():
        assert np.isfinite(v) and 1.0 < v < 400.0, (k, v)
    # int8 is near-lossless even on a barely-trained model
    assert abs(r["ppl_delta_vs_fp32"]["q8_0"]) < 0.5 * r["ppl"]["fp32"]
    # int8 KV-cache row (dense weights, quantized cache) is near-lossless
    assert abs(r["ppl_delta_vs_fp32"]["kv_int8"]) < 0.5 * r["ppl"]["fp32"]
    f = r["fused"]
    assert f["compute_dtype"] == "bfloat16"
    assert set(f["ppl"]) == {"dense_bf16", "q8_0", "q4_0", "q4_1",
                             "w4x8", "w4x8_a8", "w4x8_direct"}
    # w4x8's group-128 requant of the Q4_0 blocks stays in q4_0's
    # error neighborhood even on a barely-trained model
    assert abs(f["ppl_delta_vs_dense_bf16"]["w4x8"]) < 0.5 * f["ppl"]["dense_bf16"]
    assert abs(f["ppl_delta_vs_dense_bf16"]["w4x8_a8"]) < 0.5 * f["ppl"]["dense_bf16"]
    for k, v in f["ppl"].items():
        assert np.isfinite(v) and 1.0 < v < 400.0, (k, v)
    # the fused deltas isolate quantization error at bf16 compute: the
    # dense-bf16 baseline keeps bf16-vs-f32 compute error out of them
    assert abs(f["ppl_delta_vs_dense_bf16"]["q8_0"]) < 0.5 * f["ppl"]["dense_bf16"]


def test_quality_gate_eval_set_has_teeth():
    """VERDICT r2 #4: the held-out eval must be >=20k tokens so the
    <=0.1-ppl gate can actually detect an INT4 regression."""
    from llamago_tpu.eval.quality_gate import _byte_ids, _corpus

    _, eval_text = _corpus()
    assert len(_byte_ids(eval_text)) >= 20_000


def test_quality_gate_on_real_checkpoint(tiny_config, tmp_path):
    """--model escape hatch: gate an arbitrary dense ggjt through
    quantize -> reload -> perplexity with the checkpoint's own
    tokenizer."""
    from llamago_tpu.eval.quality_gate import run_gate_on_checkpoint

    from conftest import make_test_vocab

    config = tiny_config.replace(dtype="float32", weight_dtype="float32")
    vocab = make_test_vocab()
    tensors = random_ggjt_tensors(config, seed=5)
    path = str(tmp_path / "real.bin")
    write_ggjt(path, config, vocab, tensors, ftype=0)

    r = run_gate_on_checkpoint(path, ctx=64, tmp_dir=str(tmp_path),
                               kinds=("q8_0",), fused=False)
    assert r["metric"] == "quantization_ppl_gate_real"
    assert np.isfinite(r["ppl"]["dense"]) and np.isfinite(r["ppl"]["q8_0"])
    assert r["eval_tokens"] > 0

    # quantized inputs are rejected with a clear error
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt

    qpath = str(tmp_path / "real-q8.bin")
    quantize_ggjt(path, qpath, kind="q8_0")
    import pytest

    with pytest.raises(ValueError, match="dense"):
        run_gate_on_checkpoint(qpath, ctx=64, tmp_dir=str(tmp_path))
