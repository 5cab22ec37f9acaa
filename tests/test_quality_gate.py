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
    small relative to fp32 (the real artifact uses many more steps)."""
    r = run_gate(steps=8, batch=2, ctx=64, tmp_dir=str(tmp_path))
    assert set(r["ppl"]) == {"fp32", "q8_0", "q4_0", "q4_1"}
    for k, v in r["ppl"].items():
        assert np.isfinite(v) and 1.0 < v < 400.0, (k, v)
    # int8 is near-lossless even on a barely-trained model
    assert abs(r["ppl_delta_vs_fp32"]["q8_0"]) < 0.5 * r["ppl"]["fp32"]
