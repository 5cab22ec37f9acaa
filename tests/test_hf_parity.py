"""Logits parity against HuggingFace transformers' LLaMA.

The reference's only correctness oracle was manual output comparison
against llama.cpp (SURVEY.md §4, README.md:26). This is the systematic
equivalent: the same random weights loaded into HF's canonical LlamaModel
must produce the same logits as our forward pass — validating the RoPE
convention (Meta interleaved pairs vs HF rotate-half with permuted
projections), GQA grouping, norm placement, and SwiGLU wiring against an
independent implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import ModelConfig
from llamago_tpu.models.llama import forward_impl
from llamago_tpu.runtime.kv_cache import KVCache

from conftest import random_ggjt_tensors


def _hf_permute(w: np.ndarray, n_heads: int, dim1: int, dim2: int) -> np.ndarray:
    """Meta interleaved-pair RoPE weights -> HF rotate-half layout
    (the inverse of transformers' convert_llama_weights permute)."""
    return (
        w.reshape(n_heads, dim1 // n_heads // 2, 2, dim2)
        .swapaxes(1, 2)
        .reshape(dim1, dim2)
    )


def _build_hf(config: ModelConfig, tensors: dict) -> "transformers.LlamaForCausalLM":
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.dim,
        intermediate_size=config.ffn_hidden,
        num_hidden_layers=config.n_layers,
        num_attention_heads=config.n_heads,
        num_key_value_heads=config.kv_heads,
        rms_norm_eps=config.norm_eps,
        rope_theta=config.rope_theta,
        max_position_embeddings=config.max_seq_len,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg)
    sd = model.state_dict()

    def put(key, arr):
        sd[key] = torch.from_numpy(np.ascontiguousarray(arr)).to(sd[key].dtype)

    put("model.embed_tokens.weight", tensors["tok_embeddings.weight"])
    put("model.norm.weight", tensors["norm.weight"])
    put("lm_head.weight", tensors["output.weight"])
    kvd = config.kv_heads * config.head_dim
    for i in range(config.n_layers):
        p = f"layers.{i}."
        h = f"model.layers.{i}."
        put(h + "input_layernorm.weight", tensors[p + "attention_norm.weight"])
        put(h + "post_attention_layernorm.weight", tensors[p + "ffn_norm.weight"])
        put(h + "self_attn.q_proj.weight",
            _hf_permute(tensors[p + "attention.wq.weight"],
                        config.n_heads, config.dim, config.dim))
        put(h + "self_attn.k_proj.weight",
            _hf_permute(tensors[p + "attention.wk.weight"],
                        config.kv_heads, kvd, config.dim))
        put(h + "self_attn.v_proj.weight", tensors[p + "attention.wv.weight"])
        put(h + "self_attn.o_proj.weight", tensors[p + "attention.wo.weight"])
        put(h + "mlp.gate_proj.weight", tensors[p + "feed_forward.w1.weight"])
        put(h + "mlp.down_proj.weight", tensors[p + "feed_forward.w2.weight"])
        put(h + "mlp.up_proj.weight", tensors[p + "feed_forward.w3.weight"])
    model.load_state_dict(sd)
    model.eval()
    return model


@pytest.mark.parametrize("preset", ["tiny", "tiny-gqa"])
def test_logits_match_huggingface(preset):
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS[preset].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=13)
    hf = _build_hf(config, tensors)

    ids = np.array([[1, 5, 42, 7, 9, 3, 11, 2]], np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids).long()).logits.numpy()  # [1, T, V]

    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    ours, _ = forward_impl(
        params, jnp.asarray(ids),
        KVCache.create(config, batch=1, dtype=jnp.float32),
        jnp.zeros(1, jnp.int32), config, return_all_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours), hf_logits, rtol=2e-4, atol=2e-4
    )


def test_decode_matches_huggingface_incremental():
    """KV-cached single-token decode must match HF's full-sequence logits
    position by position (cache write/read + RoPE offsets)."""
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny-gqa"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=17)
    hf = _build_hf(config, tensors)
    ids = np.array([[1, 9, 33, 4, 27, 6]], np.int32)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids).long()).logits.numpy()

    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    cache = KVCache.create(config, batch=1, dtype=jnp.float32)
    for t in range(ids.shape[1]):
        logits, cache = forward_impl(
            params, jnp.asarray(ids[:, t:t + 1]), cache,
            jnp.full((1,), t, jnp.int32), config,
        )
        np.testing.assert_allclose(
            np.asarray(logits)[0], hf_logits[0, t], rtol=3e-4, atol=3e-4,
            err_msg=f"position {t}",
        )
