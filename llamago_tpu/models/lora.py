"""LoRA / QLoRA fine-tuning: low-rank adapters over a frozen base.

The reference's training story is a vestigial, never-executed backward
pass and an unchecked V3 roadmap item (reference: pkg/ml/ml.go:1118-1340,
README.md:61). models/training.py provides full-weight training; this
module provides the fine-tuning mode that actually fits accelerator
memory for 7B+ models: the base weights stay FROZEN — and can stay
block-QUANTIZED, streaming through the fused dequant-matmul Pallas
kernel whose custom VJP was built for exactly this contract (weight
cotangents are symbolic zeros, activation gradients flow;
ops/kernels.py:dequant_matmul) — while rank-r adapters A[in,r]·B[r,out]
train on top (QLoRA recipe: arXiv 2305.14314, public method).

Leaf format: a targeted weight leaf becomes
    {"base": <dense array | quantized {q8|q4, s}>,
     "lora_a": f32[in, r], "lora_b": f32[r, out], "lora_scale": f32[]}
and ops/basic.py:linear dispatches it as base(x) + (x A) B * scale.
A is Kaiming-normal, B zero -> the wrapped model is EXACTLY the base
model at step 0. Optimizer state exists only for adapter leaves
(optax.masked), so a 7B int8 base + r=8 adapters trains in well under
one chip's HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llamago_tpu.config import ModelConfig
from llamago_tpu.models.training import loss_fn
from llamago_tpu.ops.quant import QK, dequantize, is_quantized, quantize

# layer leaves eligible for adapters; fused projections included so
# fuse_layer_weights'd params wrap cleanly
DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "wqkv")

LORA_KEYS = ("lora_a", "lora_b", "lora_scale")


def is_lora(leaf) -> bool:
    return isinstance(leaf, dict) and "lora_a" in leaf


def _leaf_dims(leaf) -> tuple[tuple, int, int]:
    """(lead, in, out) of a dense or quantized matmul leaf; `lead` is the
    layer-stack prefix for scan-path params (adapters stack with it)."""
    if is_quantized(leaf):
        if "q8" in leaf:
            k = leaf["q8"].shape[-2]
        elif "q4x" in leaf:
            k = leaf["q4x"].shape[-2] * 2
        else:
            k = leaf["q4"].shape[-2] * 2
        return leaf["s"].shape[:-2], k, leaf["s"].shape[-1]
    return leaf.shape[:-2], leaf.shape[-2], leaf.shape[-1]


def init_lora(
    params,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple[str, ...] = DEFAULT_TARGETS,
    seed: int = 0,
):
    """Wrap targeted layer leaves with zero-initialized adapters.

    Returns a NEW params tree (leaves shared with the input; only the
    targeted leaves are replaced by wrapper dicts). Forward output is
    bit-identical to the base model until training moves B off zero.
    """
    rng = np.random.default_rng(seed)

    def wrap(leaf):
        lead, k, n = _leaf_dims(leaf)
        a = rng.standard_normal((*lead, k, rank)) * (1.0 / np.sqrt(k))
        return {
            "base": leaf,
            "lora_a": jnp.asarray(a, jnp.float32),
            "lora_b": jnp.zeros((*lead, rank, n), jnp.float32),
            # scale carries the layer-stack lead dims so lax.scan can
            # slice it per layer on the stacked (mesh) path; fresh array
            # per leaf — donate_argnames rejects shared buffers
            "lora_scale": jnp.full(lead, alpha / rank, jnp.float32),
        }

    out = dict(params)
    out["layers"] = [
        {key: (wrap(leaf) if key in targets else leaf)
         for key, leaf in lp.items()}
        for lp in params["layers"]
    ] if isinstance(params["layers"], (list, tuple)) else {
        key: (wrap(leaf) if key in targets else leaf)
        for key, leaf in params["layers"].items()
    }
    return out


TRAINABLE_KEYS = ("lora_a", "lora_b")  # scale is a constant


def extract_lora(params, keys: tuple[str, ...] = LORA_KEYS):
    """The small adapter-only subtree: full LORA_KEYS for orbax save /
    distribution, or ("lora_a", "lora_b") for the trainable partition."""
    def walk(node):
        if is_lora(node):
            return {k: node[k] for k in keys}
        if isinstance(node, dict):
            sub = {k: walk(v) for k, v in node.items()}
            return {k: v for k, v in sub.items() if v is not None}
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        return None

    return walk(params)


def apply_lora_state(params, adapters):
    """Merge adapter values (a subtree from extract_lora) back into a
    wrapped params tree; keys absent from the subtree keep their value."""
    def walk(node, ad):
        if is_lora(node):
            return {**node, **{k: jnp.asarray(v) for k, v in ad.items()}}
        if isinstance(node, dict):
            return {k: (walk(v, ad[k]) if k in (ad or {}) else v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, a) for v, a in zip(node, ad)]
        return node

    return walk(params, adapters)


def merge_lora(params):
    """Fold adapters into the base weights and unwrap.

    Dense bases merge exactly (w + A B * scale); quantized bases are
    dequantized, merged, and REQUANTIZED at the same bit-width — the
    merged model re-enters the fused-kernel serving path at the cost of
    one extra quantization rounding.
    """
    def unwrap(node):
        if is_lora(node):
            base = node["base"]
            # scale broadcasts over the trailing [in, out] dims (it may
            # carry a layer-stack lead dim)
            delta = (node["lora_a"] @ node["lora_b"]) * jnp.asarray(
                node["lora_scale"])[..., None, None]
            if is_quantized(base):
                bits = 8 if "q8" in base else 4
                dense = dequantize(base, jnp.float32) + delta
                if dense.shape[-2] % QK == 0 and "m" not in base:
                    return quantize(dense, bits)
                return dense  # Q4_1 / odd dims: stay dense
            return (base.astype(jnp.float32) + delta).astype(base.dtype)
        if isinstance(node, dict):
            return {k: unwrap(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [unwrap(v) for v in node]
        return node

    return unwrap(params)


def save_lora(path: str, params) -> None:
    """Write the adapter subtree as a flat .npz ("layers/0/wq/lora_a"
    keys) — dependency-free, and ~rank/dim the size of the model."""
    flat: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(extract_lora(params), "")
    np.savez(path, **flat)


def load_lora(path: str):
    """Inverse of save_lora: flat .npz -> nested adapter subtree."""
    with np.load(path) as z:
        items = {k: z[k] for k in z.files}

    root: dict = {}
    for key, arr in items.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def _count_lora(node) -> int:
    if isinstance(node, dict):
        if "lora_a" in node:
            return 1
        return sum(_count_lora(v) for v in node.values())
    if isinstance(node, (list, tuple)):
        return sum(_count_lora(v) for v in node)
    return 0


def attach_lora(params, adapters):
    """Wrap base params with SAVED adapters (the serve-time inverse of
    extract_lora): leaves addressed by the adapter subtree become LoRA
    leaves carrying the file's A/B/scale.

    Layer layout is normalized: adapters trained on the stacked (mesh)
    path attach to layered (single-chip) params and vice versa. A leaf
    mismatch (e.g. adapters for wq/wk/wv against fused-wqkv params)
    raises instead of silently dropping adapters.
    """
    la = adapters.get("layers") if isinstance(adapters, dict) else None
    lp = params.get("layers")
    if isinstance(lp, (list, tuple)) and isinstance(la, dict):
        n = len(lp)
        adapters = {**adapters, "layers": [
            {k: {kk: vv[i] for kk, vv in v.items()} for k, v in la.items()}
            for i in range(n)]}
    elif isinstance(lp, dict) and isinstance(la, (list, tuple)):
        adapters = {**adapters, "layers": {
            k: {kk: np.stack([layer[k][kk] for layer in la])
                for kk in la[0][k]}
            for k in la[0]}}

    def walk(node, ad):
        if isinstance(ad, dict) and "lora_a" in ad:
            return {"base": node,
                    **{k: jnp.asarray(ad[k]) for k in LORA_KEYS}}
        if isinstance(node, dict):
            return {k: (walk(v, ad[k]) if k in (ad or {}) else v)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, a) for v, a in zip(node, ad)]
        return node

    out = walk(params, adapters)
    want, got = _count_lora(adapters), _count_lora(out)
    if got < want:
        raise ValueError(
            f"only {got}/{want} adapters attached — the adapter file's "
            "leaf names do not match this model's (fused wqkv/w13 vs "
            "split projections?). Fine-tune and serve with the same "
            "topology, or re-export the adapters.")
    return out


def init_lora_opt_state(params, lr: float = 1e-3):
    """AdamW state over the trainable adapter subtree ONLY — no moments
    are ever allocated for the (possibly 7B-quantized) base."""
    return optax.adamw(lr).init(extract_lora(params, TRAINABLE_KEYS))


@partial(jax.jit, static_argnames=("config", "lr"),
         donate_argnames=("params", "opt_state"))
def lora_train_step(params, opt_state, tokens: jnp.ndarray,
                    config: ModelConfig, lr: float = 1e-3):
    """One adapter-only SPMD training step over the standard LM loss.

    Differentiates the extracted A/B subtree alone — the backward pass
    never materializes base-weight gradients at all (cheaper than a
    masked full-tree grad, and immune to optax.masked's pass-through of
    raw gradients on frozen leaves).
    """
    trainable = extract_lora(params, TRAINABLE_KEYS)

    def loss_of(tr):
        return loss_fn(apply_lora_state(params, tr), tokens, config)

    loss, grads = jax.value_and_grad(loss_of)(trainable)
    updates, opt_state = optax.adamw(lr).update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return apply_lora_state(params, trainable), opt_state, loss
