"""Plain-numpy LLaMA forward — the logits-parity oracle.

Implements the reference's Eval semantics (reference: pkg/llama/llama.go:211-426)
directly in float64 numpy over the FULL sequence (no KV cache, no batching):
interleaved-pair RoPE with theta=10000^(-2i/d) (ml.go:2253-2328), RMSNorm
eps=1e-5 (ml.go:1764), causal softmax, SwiGLU. Used only by tests.
"""

import numpy as np


def rms_norm(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True) + eps) * w


def rope(x, positions, theta=10000.0):
    # x: [T, H, hd]; interleaved pairs
    t, h, hd = x.shape
    half = hd // 2
    freqs = theta ** (-2.0 * np.arange(half) / hd)
    ang = positions[:, None] * freqs  # [T, half]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    x0, x1 = x[..., 0::2], x[..., 1::2]
    out = np.empty_like(x)
    out[..., 0::2] = x0 * cos - x1 * sin
    out[..., 1::2] = x0 * sin + x1 * cos
    return out


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def silu(x):
    return x / (1.0 + np.exp(-x))


def forward_full(tensors, config, token_ids):
    """Full-sequence forward from ggjt-layout tensors ([out, in] matrices).

    Returns logits [T, V] in float64.
    """
    d = config.dim
    h, kv, hd = config.n_heads, config.kv_heads, config.head_dim
    t = len(token_ids)
    positions = np.arange(t, dtype=np.float64)

    def w(name):
        return np.asarray(tensors[name], np.float64)

    x = w("tok_embeddings.weight")[token_ids]  # [T, D]

    for i in range(config.n_layers):
        p = f"layers.{i}."
        hnorm = rms_norm(x, w(p + "attention_norm.weight"))
        q = (hnorm @ w(p + "attention.wq.weight").T).reshape(t, h, hd)
        k = (hnorm @ w(p + "attention.wk.weight").T).reshape(t, kv, hd)
        v = (hnorm @ w(p + "attention.wv.weight").T).reshape(t, kv, hd)
        q, k = rope(q, positions, config.rope_theta), rope(k, positions, config.rope_theta)

        # GQA: repeat kv heads
        g = h // kv
        kk = np.repeat(k, g, axis=1)  # [T, H, hd]
        vv = np.repeat(v, g, axis=1)

        scores = np.einsum("thd,shd->hts", q, kk) / np.sqrt(hd)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask[None, :, :], scores, -np.inf)
        probs = softmax(scores, axis=-1)
        attn = np.einsum("hts,shd->thd", probs, vv).reshape(t, h * hd)

        x = x + attn @ w(p + "attention.wo.weight").T

        hnorm = rms_norm(x, w(p + "ffn_norm.weight"))
        gate = silu(hnorm @ w(p + "feed_forward.w1.weight").T)
        up = hnorm @ w(p + "feed_forward.w3.weight").T
        x = x + (gate * up) @ w(p + "feed_forward.w2.weight").T

    x = rms_norm(x, w("norm.weight"))
    return x @ w("output.weight").T
