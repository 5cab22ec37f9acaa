"""Core compute ops (jnp/XLA path).

These are the TPU equivalents of the reference's forward kernels
(reference: pkg/ml/ml.go — RMSNorm ml.go:1753-1812, RoPE ml.go:2253-2328,
SiLU ml.go:2599, MulMat ml.go:1976-2091). XLA fuses the elementwise ops
into surrounding matmuls; `linear` is the seam where block-quantized
weights dispatch into the fused dequant-matmul Pallas kernel (ops/quant.py)
— the analogue of the reference's single `vdot` assembly call site
(reference: pkg/ml/floats_avx.go:28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm, eps=1e-5 like the reference hardcodes (ml.go:1764).

    Reduction in float32 regardless of compute dtype (the reference runs
    everything in f32; in bf16 compute the f32 reduction is what preserves
    its numerics).
    """
    from llamago_tpu.ops import kernels

    if kernels.can_fuse_norm(x):
        return kernels.fused_rms_norm(x, weight, eps)
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    rms = jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    # weight cast to the activation dtype: a dense-f32-weights model at
    # bf16 compute must not promote the residual stream to f32 (the scan
    # carry dtype is the compute dtype)
    return ((xf / rms).astype(x.dtype)) * weight.astype(x.dtype)


def apply_rope(
    x: jnp.ndarray,  # [B, T, H, hd]
    positions: jnp.ndarray,  # [B, T] absolute positions
    theta: float = 10000.0,
) -> jnp.ndarray:
    """Rotary embedding over ADJACENT pairs (x[2i], x[2i+1]).

    This is the ggml/Meta-checkpoint convention the reference implements
    (reference: pkg/ml/ml.go:2253-2328: pairwise rotation with
    theta = 10000^(-i0/dims), i0 stepping by 2) — NOT the HuggingFace
    rotate-half layout, which requires permuted wq/wk.

    Angles are computed in float32. Unlike the reference — which re-applies
    RoPE to the ENTIRE cached K prefix every step (llama.go:290-297,
    O(ctx) redundant work) — rotated K is cached once (see models/llama.py).
    """
    b, t, h, hd = x.shape
    half = hd // 2
    f = jnp.promote_types(x.dtype, jnp.float32)
    freqs = theta ** (jnp.arange(0, half, dtype=f) * (-2.0 / hd))  # [half]
    angles = positions.astype(f)[:, :, None] * freqs  # [B, T, half]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, T, 1, half]
    sin = jnp.sin(angles)[:, :, None, :]
    xf = x.astype(f).reshape(b, t, h, half, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(b, t, h, hd).astype(x.dtype)


def linear(x: jnp.ndarray, w, compute_dtype=None, tp_kind=None) -> jnp.ndarray:
    """x @ w with the quantized-weight dispatch seam.

    `w` is either a dense [in, out] array or a quantized leaf
    {"q": int8/packed, "s": scales} produced by ops/quant.py. `tp_kind`
    ("col"/"row"/None) is the leaf's Megatron partition kind, used under
    an active mesh to run the fused kernel per-shard (parallel/tp_kernels).
    """
    if isinstance(w, dict):
        if "lora_a" in w:
            # LoRA-wrapped leaf (models/lora.py): frozen base + low-rank
            # update. stop_gradient freezes a DENSE base's weights while
            # activation gradients still flow (quantized bases are frozen
            # by dequant_matmul's VJP already — weight cotangents are
            # symbolic zeros, the QLoRA contract, ops/kernels.py).
            base_w = w["base"]
            if not isinstance(base_w, dict):
                base_w = jax.lax.stop_gradient(base_w)
            base = linear(x, base_w, compute_dtype=compute_dtype,
                          tp_kind=tp_kind)
            a = w["lora_a"].astype(x.dtype)
            b = w["lora_b"].astype(x.dtype)
            delta = (x @ a) @ b * w["lora_scale"].astype(x.dtype)
            return base + delta.astype(base.dtype)
        from llamago_tpu.ops.quant import quant_matmul

        return quant_matmul(x, w, tp_kind=tp_kind)
    dtype = compute_dtype or x.dtype
    return jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=dtype)


def swiglu(x: jnp.ndarray, w1, w2, w3, kinds=None) -> jnp.ndarray:
    """SwiGLU FFN: w2 @ (silu(w1 x) * (w3 x)) (reference: llama.go:354-363)."""
    kinds = kinds or {}
    gate = jax.nn.silu(
        linear(x, w1, tp_kind=kinds.get("w1")).astype(jnp.float32)
    ).astype(x.dtype)
    up = linear(x, w3, tp_kind=kinds.get("w3"))
    return linear(gate * up, w2, tp_kind=kinds.get("w2"))
