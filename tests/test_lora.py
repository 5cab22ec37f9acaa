"""LoRA / QLoRA fine-tuning tests: adapter wrapping, frozen-base
training, merge, save/restore round-trip (models/lora.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import (
    random_parameters,
    unstack_layer_params,
)
from llamago_tpu.models.llama import forward
from llamago_tpu.models.lora import (
    apply_lora_state,
    extract_lora,
    init_lora,
    init_lora_opt_state,
    is_lora,
    lora_train_step,
    merge_lora,
)
from llamago_tpu.ops.quant import is_quantized
from llamago_tpu.runtime.kv_cache import KVCache


@pytest.fixture(scope="module")
def cfg():
    from llamago_tpu.config import MODEL_PRESETS

    return MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=32)


def _params(cfg, quant=None):
    if quant:
        from llamago_tpu.checkpoint.params import random_quantized_parameters

        qcfg = cfg.replace(weight_dtype=quant)
        return random_quantized_parameters(qcfg, seed=0, layered=True)
    params = random_parameters(cfg, seed=0)
    params = unstack_layer_params(params, cfg.n_layers)
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)


def _logits(params, cfg, tokens):
    cache = KVCache.create(cfg, batch=1, dtype=jnp.float32)
    logits, _ = forward(params, tokens, cache, jnp.zeros(1, jnp.int32), cfg)
    return np.asarray(logits)


def test_init_is_identity(cfg):
    """B=0 at init: wrapped model == base model bit-for-bit."""
    params = _params(cfg)
    tokens = jnp.asarray([[1, 5, 9, 3]], jnp.int32)
    base_logits = _logits(params, cfg, tokens)
    wrapped = init_lora(params, rank=4)
    assert any(is_lora(leaf) for leaf in wrapped["layers"][0].values())
    np.testing.assert_array_equal(_logits(wrapped, cfg, tokens), base_logits)


def test_train_decreases_loss_and_freezes_base(cfg):
    from llamago_tpu.models.training import loss_fn

    params = init_lora(_params(cfg), rank=4)
    before = jax.tree.map(np.asarray, params)
    opt = init_lora_opt_state(params, lr=1e-2)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(3, cfg.vocab_size, (2, 16)),
        jnp.int32)
    loss0 = float(loss_fn(params, tokens, cfg))
    for _ in range(5):
        params, opt, loss = lora_train_step(params, opt, tokens, cfg, lr=1e-2)
    assert float(loss) < loss0

    lp0, lp0_before = params["layers"][0], before["layers"][0]
    # adapters moved...
    assert not np.allclose(np.asarray(lp0["wq"]["lora_b"]),
                           lp0_before["wq"]["lora_b"])
    # ...every base leaf is bit-identical (dense bases incl. untargeted
    # w1/w2/w3, embeddings, norms)
    np.testing.assert_array_equal(np.asarray(lp0["wq"]["base"]),
                                  lp0_before["wq"]["base"])
    np.testing.assert_array_equal(np.asarray(lp0["w2"]), lp0_before["w2"])
    np.testing.assert_array_equal(np.asarray(params["tok_embeddings"]),
                                  before["tok_embeddings"])
    np.testing.assert_array_equal(np.asarray(params["output"]),
                                  before["output"])


def test_qlora_trains_through_quantized_base(cfg):
    """int8 base: training runs through the dequant path (weight
    cotangents are symbolic zeros), adapters learn, q8 bytes unchanged."""
    from llamago_tpu.models.training import loss_fn

    params = init_lora(_params(cfg, quant="int8"), rank=4)
    assert is_quantized(params["layers"][0]["wq"]["base"])
    q8_before = np.asarray(params["layers"][0]["wq"]["base"]["q8"])
    opt = init_lora_opt_state(params, lr=1e-2)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(3, cfg.vocab_size, (2, 16)),
        jnp.int32)
    loss0 = float(loss_fn(params, tokens, cfg))
    for _ in range(5):
        params, opt, loss = lora_train_step(params, opt, tokens, cfg, lr=1e-2)
    assert float(loss) < loss0
    np.testing.assert_array_equal(
        np.asarray(params["layers"][0]["wq"]["base"]["q8"]), q8_before)


def test_merge_dense_exact(cfg):
    """Dense-base merge folds A B * scale exactly: merged forward ==
    adapter forward."""
    params = init_lora(_params(cfg), rank=4)
    # move B off zero so the merge is non-trivial
    lp = params["layers"][0]["wq"]
    params["layers"][0]["wq"] = {
        **lp, "lora_b": jnp.asarray(
            np.random.default_rng(2).standard_normal(lp["lora_b"].shape) * 0.02,
            jnp.float32)}
    tokens = jnp.asarray([[1, 7, 2, 11]], jnp.int32)
    with_adapters = _logits(params, cfg, tokens)
    merged = merge_lora(params)
    assert not any(is_lora(v) for v in merged["layers"][0].values())
    np.testing.assert_allclose(_logits(merged, cfg, tokens), with_adapters,
                               rtol=1e-4, atol=1e-4)


def test_merge_quantized_requantizes(cfg):
    """Quantized-base merge requantizes at the same width; output stays
    within the quantization error envelope of the adapter forward."""
    params = init_lora(_params(cfg, quant="int8"), rank=4)
    lp = params["layers"][0]["wq"]
    params["layers"][0]["wq"] = {
        **lp, "lora_b": jnp.asarray(
            np.random.default_rng(3).standard_normal(lp["lora_b"].shape) * 0.02,
            jnp.float32)}
    tokens = jnp.asarray([[1, 7, 2, 11]], jnp.int32)
    with_adapters = _logits(params, cfg, tokens)
    merged = merge_lora(params)
    assert is_quantized(merged["layers"][0]["wq"])  # same width, q8
    np.testing.assert_allclose(_logits(merged, cfg, tokens), with_adapters,
                               rtol=0.15, atol=0.15)


def test_extract_apply_roundtrip(cfg):
    params = init_lora(_params(cfg), rank=4)
    adapters = extract_lora(params)
    assert "base" not in jax.tree_util.tree_leaves_with_path(adapters)[0]
    # zero out in the tree, then restore from the extracted copy
    zeroed = apply_lora_state(
        params, jax.tree.map(jnp.zeros_like, adapters))
    restored = apply_lora_state(zeroed, adapters)
    np.testing.assert_array_equal(
        np.asarray(restored["layers"][0]["wq"]["lora_a"]),
        np.asarray(params["layers"][0]["wq"]["lora_a"]))


def test_finetune_cli_roundtrip(tmp_path):
    """`finetune` subcommand trains adapters on a tiny ggjt model and the
    main flow serves with `--lora` (merged at load)."""
    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu import cli
    from llamago_tpu.checkpoint.ggjt import write_ggjt
    from llamago_tpu.config import MODEL_PRESETS

    cfg = MODEL_PRESETS["tiny"].replace(max_seq_len=64)
    model = str(tmp_path / "m.bin")
    write_ggjt(model, cfg, make_test_vocab(), random_ggjt_tensors(cfg, seed=7))
    data = tmp_path / "data.txt"
    data.write_text("hello world " * 200)
    adapters = str(tmp_path / "ad.npz")

    # --tp 1: stay on the single-chip path (the conftest's 8 virtual CPU
    # devices would otherwise activate a global mesh that leaks into
    # later tests via kernels.ACTIVE_MESH)
    from llamago_tpu.parallel.tp_kernels import activate_mesh

    try:
        rc = cli.main(["finetune", "--model", model, "--file", str(data),
                       "--steps", "3", "--seq", "16", "--train-batch", "2",
                       "--context", "64", "--silent", "--out", adapters,
                       "--tp", "1"])
        assert rc == 0
        import os
        assert os.path.exists(adapters)

        rc = cli.main(["--model", model, "--lora", adapters, "--prompt",
                       "hello", "--predict", "4", "--context", "64",
                       "--silent", "--tp", "1"])
        assert rc == 0
    finally:
        activate_mesh(None)
