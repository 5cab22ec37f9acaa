"""Checkpoint tensors -> device parameter pytree.

The reference keeps weights as a flat name->Tensor map inside a
LLaMA-shaped struct (reference: pkg/llama/llama.go:181-193,819-863). Here
the parameters are a pytree designed for XLA:

  * per-layer weights are STACKED along a leading layer axis so the
    transformer runs as one `lax.scan` over layers (one compiled block,
    not n_layers copies);
  * 2-D weights are transposed from the checkpoint's [out, in] to
    [in, out] so the forward pass is plain `x @ w` (row-major MXU feed);
  * everything is cast to the configured compute/storage dtype on upload
    (the reference upconverts FP16 files to FP32 scalars at load,
    llama.go:938-941 — here the cast happens once, on device).

Layout:
  tok_embeddings [V, D]      norm [D]        output [D, V]
  layers/attention_norm [L, D]   layers/ffn_norm [L, D]
  layers/wq [L, D, H*hd]  wk [L, D, KV*hd]  wv [L, D, KV*hd]  wo [L, H*hd, D]
  layers/w1 [L, D, F]     w2 [L, F, D]      w3 [L, D, F]
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.config import ModelConfig

Params = dict[str, Any]

_LAYER_KEYS = {
    "attention_norm": "attention_norm.weight",
    "wq": "attention.wq.weight",
    "wk": "attention.wk.weight",
    "wv": "attention.wv.weight",
    "wo": "attention.wo.weight",
    "ffn_norm": "ffn_norm.weight",
    "w1": "feed_forward.w1.weight",
    "w2": "feed_forward.w2.weight",
    "w3": "feed_forward.w3.weight",
}


def _is_file_quant(x) -> bool:
    return hasattr(x, "kind") and hasattr(x, "raw")  # quant_file.QuantTensor


def _qt_to_host_leaf(qt) -> dict:
    """File-quantized tensor -> host-side device-layout leaf {q8|q4, s}
    (transpose of blocks; see checkpoint/quant_file.py)."""
    from llamago_tpu.checkpoint.quant_file import split_blocks

    parts = split_blocks(qt)
    q, d = parts[0], parts[1]
    key = "q8" if qt.kind == "q8_0" else "q4"
    leaf = {key: np.ascontiguousarray(q.T), "s": np.ascontiguousarray(d.T)}
    if qt.kind == "q4_1":
        leaf["m"] = np.ascontiguousarray(parts[2].T)
    return leaf


def _stack_layers(tensors: dict[str, np.ndarray], n_layers: int, key: str):
    suffix = _LAYER_KEYS[key]
    mats = [tensors[f"layers.{i}.{suffix}"] for i in range(n_layers)]
    if _is_file_quant(mats[0]):
        leaves = [_qt_to_host_leaf(m) for m in mats]
        return {k: np.stack([lf[k] for lf in leaves]) for k in leaves[0]}
    out = np.stack([np.asarray(m) for m in mats])
    if out.ndim == 3:
        # [L, out, in] -> [L, in, out]
        out = out.transpose(0, 2, 1)
    return out


def host_parameters(config: ModelConfig, tensors: dict[str, np.ndarray]) -> Params:
    """Assemble the host-side (numpy) parameter pytree from checkpoint
    tensors. Pre-quantized (Q8_0/Q4_0 file) tensors become device-layout
    quantized leaves; embeddings are dequantized if a foreign file
    quantized them (the runtime needs a dense lookup table)."""
    from llamago_tpu.checkpoint.quant_file import dequantize_rows

    if "tok_embeddings.weight" not in tensors:
        # zero-tensor checkpoints parse fine (vocab-only files are legal,
        # and a download truncated right after the vocab looks identical)
        # — fail HERE with a diagnosis instead of a deep KeyError
        raise ValueError(
            "checkpoint carries no model tensors (vocab-only file, or a "
            "download truncated after the vocab section) — it can "
            "provide a tokenizer but cannot be loaded as a model")
    emb = tensors["tok_embeddings.weight"]
    emb = dequantize_rows(emb) if _is_file_quant(emb) else np.asarray(emb)
    out_w = tensors["output.weight"]
    out_w = _qt_to_host_leaf(out_w) if _is_file_quant(out_w) else np.asarray(out_w).T
    layers = {k: _stack_layers(tensors, config.n_layers, k) for k in _LAYER_KEYS}
    return {
        "tok_embeddings": emb,
        "norm": np.asarray(tensors["norm.weight"]),
        "output": out_w,
        "layers": layers,
    }


def load_parameters(
    config: ModelConfig,
    tensors: dict[str, np.ndarray],
    shardings: Params | None = None,
) -> Params:
    """Upload checkpoint tensors to device in the configured dtypes.

    `shardings` is an optional pytree of jax.sharding.Sharding matching the
    params structure (see parallel/sharding.py); None = single device.
    """
    host = host_parameters(config, tensors)
    return _place(config, host, shardings)


def _place(config: ModelConfig, host: Params, shardings: Params | None) -> Params:
    from llamago_tpu.ops.quant import is_quantized

    has_prequant = any(
        isinstance(l, dict) for l in jax.tree.leaves(host, is_leaf=is_quantized)
    )
    if config.weight_dtype in ("int8", "int4") or has_prequant:
        from llamago_tpu.ops.quant import quantize_params

        return quantize_params(config, host, shardings)
    dtype = jnp.dtype(config.weight_dtype)

    def put(leaf, shard):
        arr = jnp.asarray(leaf, dtype=dtype)
        return jax.device_put(arr, shard) if shard is not None else arr

    if shardings is None:
        return jax.tree.map(lambda a: put(a, None), host)
    return jax.tree.map(put, host, shardings)


def unstack_layer_params(params: Params, n_layers: int) -> Params:
    """Convert stacked layer weights [L, ...] into a tuple of per-layer
    pytrees (one-time slicing cost at load). The unrolled forward path
    (models/llama.py) uses this so Pallas kernels read each layer's
    quantized weights straight from HBM instead of through a per-step
    scan slice."""
    layers = params["layers"]

    def leaf_at(v, i):
        if isinstance(v, dict):
            return {k: a[i] for k, a in v.items()}
        return v[i]

    per_layer = tuple(
        {k: leaf_at(v, i) for k, v in layers.items()} for i in range(n_layers)
    )
    return {**params, "layers": per_layer}


def export_ggjt_tensors(config: ModelConfig, params: Params) -> dict[str, np.ndarray]:
    """Inverse of host_parameters for DENSE params: device-layout pytree
    -> ggjt-named tensors in the file's row-major [out, in] layout,
    ready for checkpoint/ggjt.py:write_ggjt. Used by the checkpoint
    export path (e.g. saving a trained model; the reference has no
    trainer and hence no exporter — SURVEY.md §2 C16)."""
    def host2d(a):  # [in, out] device layout -> [out, in] file layout
        return np.ascontiguousarray(np.asarray(jax.device_get(a)).T)

    tensors: dict[str, np.ndarray] = {
        "tok_embeddings.weight": np.asarray(jax.device_get(params["tok_embeddings"])),
        "norm.weight": np.asarray(jax.device_get(params["norm"])),
        "output.weight": host2d(params["output"]),
    }
    layers = params["layers"]
    for i in range(config.n_layers):
        for key, suffix in _LAYER_KEYS.items():
            leaf = (layers[i][key] if isinstance(layers, (list, tuple))
                    else jax.tree.map(lambda a: a[i], layers[key]))
            if isinstance(leaf, dict):
                raise ValueError("export_ggjt_tensors handles dense params; "
                                 "quantize the FILE via checkpoint/quant_file.py")
            arr = np.asarray(jax.device_get(leaf))
            tensors[f"layers.{i}.{suffix}"] = (
                np.ascontiguousarray(arr.T) if arr.ndim == 2 else arr
            )
    return tensors


def random_parameters(
    config: ModelConfig,
    seed: int = 0,
    scale: float = 0.02,
    shardings: Params | None = None,
) -> Params:
    """Random-init parameters, generated ON DEVICE.

    Used by tests and by bench.py: for benchmark-sized models (7B+) this
    avoids materializing gigabytes on the host and pushing them through a
    (possibly tunneled) transfer — each leaf is created by a jitted
    normal() directly in HBM.
    """
    dtype = jnp.dtype(
        config.weight_dtype if config.weight_dtype not in ("int8", "int4") else "bfloat16"
    )
    d, v, f = config.dim, config.vocab_size, config.ffn_hidden
    h, kv, hd, layers = config.n_heads, config.kv_heads, config.head_dim, config.n_layers
    shapes = {
        "tok_embeddings": (v, d),
        "norm": (d,),
        "output": (d, v),
        "layers": {
            "attention_norm": (layers, d),
            "ffn_norm": (layers, d),
            "wq": (layers, d, h * hd),
            "wk": (layers, d, kv * hd),
            "wv": (layers, d, kv * hd),
            "wo": (layers, h * hd, d),
            "w1": (layers, d, f),
            "w2": (layers, f, d),
            "w3": (layers, d, f),
        },
    }

    quant_bits = {"int8": 8, "int4": 4}.get(config.weight_dtype)
    if quant_bits is not None:
        from llamago_tpu.ops.quant import (
            QUANT_LEAVES,
            int4_exec_format,
            quantize,
            quantize_w4x8,
        )

        use_w4x8 = quant_bits == 4 and int4_exec_format() == "w4x8"

    leaves, treedef = jax.tree.flatten(shapes, is_leaf=lambda x: isinstance(x, tuple))
    paths = [
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree.flatten_with_path(
            shapes, is_leaf=lambda x: isinstance(x, tuple)
        )[0]
    ]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))

    from functools import partial

    @partial(jax.jit, static_argnames=("shape",))
    def make(key, shape):
        if len(shape) == 1:
            return jnp.ones(shape, dtype)  # norm gains
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    # Leaf-at-a-time generation (+ immediate quantization) keeps peak HBM at
    # one dense leaf above the final footprint — bench-sized (7B+) models
    # are created entirely on device without a 2x dense transient.
    out_leaves = []
    for key, shape, path in zip(keys, leaves, paths):
        leaf = make(key, shape)
        name = path.rsplit("/", 1)[-1]
        if quant_bits is not None and name in QUANT_LEAVES:
            if use_w4x8 and shape[-2] % 128 == 0:
                leaf = quantize_w4x8(leaf)
            else:
                leaf = quantize(leaf, quant_bits)
            if name == "output" and shardings is None:
                # stride-align the int8 lm head, same policy as
                # quantize_params / random_quantized_parameters
                from llamago_tpu.ops.quant import pad_lm_head

                leaf = pad_lm_head(leaf, vocab_size=v)
        out_leaves.append(leaf)
    params = treedef.unflatten(out_leaves)
    if shardings is not None:
        from llamago_tpu.ops.quant import _shard_quantized, is_quantized

        def place(p, s):
            if is_quantized(p):
                return _shard_quantized(p, s)
            return jax.device_put(p, s) if s is not None else p

        params = jax.tree.map(place, params, shardings, is_leaf=is_quantized)
    return params


def random_quantized_parameters(
    config: ModelConfig, seed: int = 0, layered: bool = True
) -> Params:
    """Benchmark-grade random parameters with quantized leaves created
    DIRECTLY as int8/int4 + scales — no dense f32 transient, no quantize
    pass. Numerically meaningless weights (uniform ints, constant scales)
    at exactly the production memory layout and bandwidth footprint;
    bench.py uses this so a 7B-model setup takes seconds, not minutes.
    """
    from functools import partial

    from llamago_tpu.ops.quant import QK, QUANT_LEAVES, int4_exec_format

    bits = {"int8": 8, "int4": 4}[config.weight_dtype]
    # int4 leaves are created in the runtime exec format (w4x8 on TPU:
    # interleaved nibbles + duplicated group-64 scale rows, ops/quant.py)
    # so benches exercise the kernels real weights would hit
    w4x8 = bits == 4 and int4_exec_format() == "w4x8"
    dtype = jnp.bfloat16
    d, v, f = config.dim, config.vocab_size, config.ffn_hidden
    h, kv, hd, layers = config.n_heads, config.kv_heads, config.head_dim, config.n_layers

    key_iter = iter(jax.random.split(jax.random.PRNGKey(seed), 16 * (layers + 1)))

    # One threefry program fills a byte pool; every quantized leaf is a
    # salted view of it. Distinct-shape threefry compiles (~10s each for
    # GB-sized leaves) would otherwise dominate bench setup.
    qshapes = [(d, h * hd), (d, kv * hd), (h * hd, d), (d, f), (f, d), (d, v)]
    pool_els = max((k if bits == 8 else k // 2) * n for k, n in qshapes)
    pool = jax.random.bits(jax.random.PRNGKey(seed + 1), (pool_els,), jnp.uint8)
    salt_iter = iter(range(1, 4096))

    @partial(jax.jit, static_argnames=("shape",))
    def qleaf_from_pool(pool, salt, shape):
        *lead, k, n = shape
        rows = k if bits == 8 else k // 2
        total = rows * n
        for l in lead:
            total *= l
        reps = (total + pool.shape[0] - 1) // pool.shape[0]
        src = jnp.tile(pool, reps)[:total] if reps > 1 else pool[:total]
        q = (src ^ salt).reshape(*lead, rows, n)
        if bits == 8:
            body = {"q8": q.astype(jnp.int8)}
        elif w4x8 and k % 128 == 0:
            return {"q4x": q,
                    "s": jnp.full((*lead, k // 64, n), 0.01, jnp.bfloat16)}
        else:
            body = {"q4": q}
        return {**body, "s": jnp.full((*lead, k // QK, n), 0.01, jnp.bfloat16)}

    def qleaf(key, shape):
        del key
        salt = jnp.uint8(next(salt_iter) % 251 + 1)
        return qleaf_from_pool(pool, salt, shape)

    @partial(jax.jit, static_argnames=("shape",))
    def dense(key, shape):
        if len(shape) == 1:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    def mat(name, shape):
        if name in QUANT_LEAVES:
            return qleaf(next(key_iter), shape)
        return dense(next(key_iter), shape)

    layer_shapes = {
        "attention_norm": (d,), "ffn_norm": (d,),
        "wq": (d, h * hd), "wk": (d, kv * hd), "wv": (d, kv * hd),
        "wo": (h * hd, d), "w1": (d, f), "w2": (f, d), "w3": (d, f),
    }
    if layered:
        layer_leaves = tuple(
            {k: mat(k, s) for k, s in layer_shapes.items()} for _ in range(layers)
        )
    else:
        # stacked leaves generated directly (restacking 32 per-layer
        # arrays costs minutes of copies/compiles at 7B scale); norm
        # gains stay ones
        layer_leaves = {
            k: (jnp.ones((layers, *s), dtype) if len(s) == 1
                else mat(k, (layers, *s)))
            for k, s in layer_shapes.items()
        }
    from llamago_tpu.ops.quant import pad_lm_head

    return {
        "tok_embeddings": dense(next(key_iter), (v, d)),
        "norm": dense(next(key_iter), (d,)),
        # stride-align the int8 lm head (ops/quant.py pad_lm_head) —
        # single-chip layout, matching quantize_params' loader path
        "output": pad_lm_head(mat("output", (d, v)), vocab_size=v),
        "layers": layer_leaves,
    }


def _concat_weights(ws, axis=-1):
    """Concatenate dense or quantized leaves along the output dim,
    dropping source references as they are consumed."""
    if isinstance(ws[0], dict):
        # every quantized sub-leaf concatenates along the out dim: q blocks,
        # scales, and (Q4_1) the per-block mins "m" — dropping "m" would
        # silently dequantize an affine checkpoint with Q4_0 semantics
        qk = "q8" if "q8" in ws[0] else ("q4x" if "q4x" in ws[0] else "q4")
        keys = [qk, "s"] + (["m"] if "m" in ws[0] else [])
        out: dict = {}
        for key in keys:
            parts = [w.pop(key) for w in ws]
            out[key] = jnp.concatenate(parts, axis=axis)
            del parts
        return out
    return jnp.concatenate(list(ws), axis=axis)


def fuse_layer_weights(params: Params) -> Params:
    """Fuse wq/wk/wv -> wqkv and w1/w3 -> w13 (shared input, so one
    streamed matmul instead of three/two — fewer kernel dispatches and
    larger, better-pipelined weight reads). The forward pass splits the
    outputs (models/llama.py). Not applied under tensor parallelism:
    concatenated outputs would shard across segment boundaries.

    CONSUMES the input: source leaves are popped as they are fused so
    the old device buffers free immediately — holding both trees would
    double peak HBM and OOM a 13B int8 model on one 16 GB chip.
    """

    def fuse_one(lp: dict) -> dict:
        out = {k: v for k, v in lp.items()
               if k not in ("wq", "wk", "wv", "w1", "w3")}
        out["wqkv"] = _concat_weights([lp.pop("wq"), lp.pop("wk"), lp.pop("wv")])
        out["w13"] = _concat_weights([lp.pop("w1"), lp.pop("w3")])
        return out

    layers = params["layers"]
    if isinstance(layers, (list, tuple)):
        layers = tuple(fuse_one(lp) for lp in layers)
    else:
        layers = fuse_one(layers)
    return {**params, "layers": layers}
