"""LLaMA transformer as a pure function.

Functional re-design of the reference's per-step graph construction
(reference: Eval, pkg/llama/llama.go:211-426). Where the reference
rebuilds an op graph from scratch every token (llama.go:232) and runs it
on a goroutine pool, this is a single traced function — jitted once per
(batch, seq-bucket) shape — with:

  * `lax.scan` over layers (stacked weights; one compiled block);
  * a static-shape KV cache written via `lax.dynamic_update_slice`
    (vs. the reference's float-offset View1D+Copy, llama.go:274-278);
  * RoPE applied ONCE to new K before caching — the reference
    re-ropes the entire cached K prefix every step (llama.go:290-297);
  * GQA (n_kv_heads < n_heads) support the reference lacks;
  * bf16 matmuls on the MXU with f32 softmax/norm reductions.

Architecture parity, per layer (reference: llama.go:246-369):
  x += wo @ attn(rope(q), rope(k), v)  over RMSNorm(x)*attention_norm
  x += w2 @ (silu(w1 h) * (w3 h))      over RMSNorm(x)*ffn_norm
final: logits = output @ (RMSNorm(x)*norm)   (llama.go:374-384)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig
from llamago_tpu.ops.attention import (
    attention_math as _attention_math,
    can_fuse_attention,
    flash_attention,
)
from llamago_tpu.ops.basic import apply_rope, linear, rms_norm, swiglu
from llamago_tpu.runtime.kv_cache import KVCache, quantize_kv_rows

# Elimination probes for perf bisection (scripts/batch_trunk.py): bypass
# the KV-cache writes / the attention reads while preserving the data
# dependences, so the rest of the step is timed unchanged. Measurement
# aids only — NEVER set in production.
import os as _os

_BYPASS_CACHE = _os.environ.get("LLAMAGO_BYPASS_CACHE", "0") == "1"
_BYPASS_ATTN = _os.environ.get("LLAMAGO_BYPASS_ATTN", "0") == "1"

NEG_INF = float("-inf")


def _update_cache(cache_layer: jnp.ndarray, new: jnp.ndarray, write_pos: jnp.ndarray):
    """Write new [B, T, KV, hd] into cache [B, KV, S, hd] at per-batch offsets.

    Unrolled over batch rows: a vmapped dynamic_update_slice with
    per-batch start offsets lowers to a scatter, which costs ~4 ms/step
    at 7B decode for any b >= 2 (measured, scripts/batch_trunk.py — the
    whole batch-scaling anomaly). Per-row updates with a STATIC batch
    index and one dynamic seq offset stay in-place aliased; decode
    batches are small (<= pods) so the unroll is bounded."""
    new = new.transpose(0, 2, 1, 3)  # [B, KV, T, hd]; T is small, cheap
    b = cache_layer.shape[0]
    zero = jnp.zeros((), write_pos.dtype)
    if b == 1:
        return jax.lax.dynamic_update_slice(
            cache_layer, new, (zero, zero, write_pos[0], zero))
    out = cache_layer
    for i in range(b):
        out = jax.lax.dynamic_update_slice(
            out, new[i : i + 1], (jnp.asarray(i, write_pos.dtype), zero,
                                  write_pos[i], zero))
    return out


def _update_scale(scale_layer: jnp.ndarray, new: jnp.ndarray, write_pos: jnp.ndarray):
    """Write new per-row scales [B, T, KV] into the scale buffer
    [B, KV, S] at per-batch offsets (same unroll rationale as
    _update_cache above)."""
    new = new.transpose(0, 2, 1).astype(scale_layer.dtype)  # [B, KV, T]
    b = scale_layer.shape[0]
    zero = jnp.zeros((), write_pos.dtype)
    if b == 1:
        return jax.lax.dynamic_update_slice(
            scale_layer, new, (zero, zero, write_pos[0]))
    out = scale_layer
    for i in range(b):
        out = jax.lax.dynamic_update_slice(
            out, new[i : i + 1], (jnp.asarray(i, write_pos.dtype), zero,
                                  write_pos[i]))
    return out


def _attention(
    config: ModelConfig,
    q: jnp.ndarray,  # [B, T, H, hd] (roped)
    k_cache: jnp.ndarray,  # [B, KV, S, hd] (roped)
    v_cache: jnp.ndarray,  # [B, KV, S, hd]
    positions: jnp.ndarray,  # [B, T] absolute query positions
    k_scale: jnp.ndarray | None = None,  # [B, KV, S] (int8 cache only)
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Causal attention of new queries against the full cache buffer.

    The mask `slot <= query_pos` covers exactly the written prefix because
    cache slot j always holds the token at absolute position j (the
    context-swap eviction rewrites from the keep-point, preserving this
    invariant — see runtime/engine.py). Equivalent to the reference's
    DiagMaskInf + SoftMax (llama.go:307-313) without materializing -inf
    into a full [ctx, ctx] pass.
    """
    if k_scale is not None:
        # int8-quantized cache: fused kernel with per-column scale folding
        # when the decode geometry allows, scale-folded jnp math otherwise
        # (incl. prefill and GSPMD/TP — scales fold into the score einsum,
        # the cache is never dequantized element-wise in HBM).
        from llamago_tpu.ops import kernels as _k
        from llamago_tpu.ops.attention import (
            can_fuse_attention_quant,
            flash_attention_quant,
        )

        if can_fuse_attention_quant(q, k_cache):
            return flash_attention_quant(q, k_cache, v_cache, positions,
                                         k_scale, v_scale)
        if _k.ACTIVE_MESH is not None:
            from llamago_tpu.parallel.tp_kernels import (
                maybe_tp_attention_quant,
            )

            out = maybe_tp_attention_quant(q, k_cache, v_cache, positions,
                                           k_scale, v_scale)
            if out is not None:
                return out
        return _attention_math(q, k_cache, v_cache, positions,
                               k_scale, v_scale)
    if can_fuse_attention(q, k_cache):
        # Fused Pallas path: scores never leave VMEM, K/V stream through
        # once per (batch, head) — see ops/attention.py.
        return flash_attention(q, k_cache, v_cache, positions)

    from llamago_tpu.ops import kernels as _k

    if _k.ACTIVE_MESH is not None:
        from llamago_tpu.parallel.tp_kernels import maybe_tp_attention

        out = maybe_tp_attention(_attention_local, q, k_cache, v_cache,
                                 positions)
        if out is not None:
            return out

    return _attention_math(q, k_cache, v_cache, positions)


def _attention_local(q, k_cache, v_cache, positions):
    """Shard-local attention dispatch (called inside shard_map): fused
    Pallas kernel when the LOCAL geometry allows, jnp math otherwise."""
    from llamago_tpu.ops.attention import can_fuse_attention_local

    if can_fuse_attention_local(q, k_cache):
        return flash_attention(q, k_cache, v_cache, positions)
    return _attention_math(q, k_cache, v_cache, positions)


def forward_impl(
    params,
    tokens: jnp.ndarray,  # [B, T] int32
    cache: KVCache,
    write_pos: jnp.ndarray,  # [B] int32 — first cache slot to write
    config: ModelConfig,
    return_all_logits: bool = False,
    logit_index: jnp.ndarray | None = None,  # [B] int32 — per-batch position
    return_embedding: bool = False,
    remat: bool = False,  # rematerialize per-layer activations (training)
):
    """One transformer step (prefill when T>1, decode when T=1).

    Returns (logits, new_cache): logits [B, T, V] if return_all_logits
    (needed for perplexity), else [B, V] at `logit_index` (for
    right-padded bucketed prefill) or the last position — parity with the
    reference copying only the last row out (llama.go:394-401).
    With return_embedding, a third element [B, D] is appended: the
    final-RMSNorm'd hidden state at the last (or logit_index) position —
    parity with the reference's embeddings extraction (llama.go:412-419,
    `embeddings.Data[embdSize*(N-1):]`).
    """
    b, t = tokens.shape
    dtype = jnp.dtype(config.dtype)

    # Megatron partition kinds per weight leaf (empty off-mesh). Lets the
    # quantized matmuls run the fused Pallas kernel PER SHARD via
    # shard_map instead of falling back to jnp dequantize-then-dot under
    # GSPMD (parallel/tp_kernels.py).
    from llamago_tpu.ops import kernels as _kernels
    from llamago_tpu.parallel.tp_kernels import tp_kinds

    kinds = tp_kinds(config, _kernels.ACTIVE_MESH)

    positions = write_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # [B, T]

    # Embedding lookup (reference: GetRows, llama.go:244). NOTE
    # (negative result, measured): replacing this gather with per-row
    # dynamic slices at decode changed nothing at b=1 and lost ~2% at
    # b=2 — the batched-decode step-cost growth is the serial
    # token->embed->...->argmax dependence, not the gather's lowering.
    x = params["tok_embeddings"][tokens].astype(dtype)  # [B, T, D]

    q_dim = config.n_heads * config.head_dim
    kv_dim = config.kv_heads * config.head_dim

    def block(x, lp, k_layer, v_layer, ks_l=None, vs_l=None):
        # --- attention (reference: llama.go:250-345)
        h = rms_norm(x, lp["attention_norm"], config.norm_eps)
        if "wqkv" in lp:
            # fused QKV projection (checkpoint/params.py:fuse_layer_weights)
            qkv = linear(h, lp["wqkv"])
            q = qkv[..., :q_dim]
            k = qkv[..., q_dim:q_dim + kv_dim]
            v = qkv[..., q_dim + kv_dim:]
        else:
            q, k, v = (linear(h, lp["wq"], tp_kind=kinds.get("wq")),
                       linear(h, lp["wk"], tp_kind=kinds.get("wk")),
                       linear(h, lp["wv"], tp_kind=kinds.get("wv")))
        q = q.reshape(b, t, config.n_heads, config.head_dim)
        k = k.reshape(b, t, config.kv_heads, config.head_dim)
        v = v.reshape(b, t, config.kv_heads, config.head_dim)

        q = apply_rope(q, positions, config.rope_theta)
        k = apply_rope(k, positions, config.rope_theta)

        if not _BYPASS_CACHE:  # elimination probe, see module foot
            if ks_l is not None:
                from llamago_tpu.ops.cache_write import (
                    cache_append_quant,
                    can_fuse_cache_append,
                )

                if can_fuse_cache_append(k, k_layer):
                    # decode: ONE fused quantize+append kernel replaces
                    # 4*b per-row dynamic_update_slice chains per layer
                    # (~1.5 ms/step at 7B b=8 — r5 elimination probe)
                    k_layer, v_layer, ks_l, vs_l = cache_append_quant(
                        k_layer, v_layer, ks_l, vs_l, k, v, write_pos)
                else:
                    # prefill / speculative windows / meshes: per-row
                    # quantize + DUS (runtime/kv_cache.py)
                    kq, ks_new = quantize_kv_rows(k)
                    vq, vs_new = quantize_kv_rows(v)
                    k_layer = _update_cache(k_layer, kq, write_pos)
                    v_layer = _update_cache(v_layer, vq, write_pos)
                    ks_l = _update_scale(ks_l, ks_new, write_pos)
                    vs_l = _update_scale(vs_l, vs_new, write_pos)
            else:
                k_layer = _update_cache(k_layer, k.astype(k_layer.dtype),
                                        write_pos)
                v_layer = _update_cache(v_layer, v.astype(v_layer.dtype),
                                        write_pos)

        if _BYPASS_ATTN:  # data-dependence-preserving stand-in
            attn = (q + jnp.pad(k, [(0, 0)] * 2 + [(0, config.n_heads
                    - config.kv_heads), (0, 0)])).reshape(b, t, q_dim)
        else:
            attn = _attention(config, q, k_layer, v_layer, positions,
                              ks_l, vs_l)
        x = x + linear(attn, lp["wo"], tp_kind=kinds.get("wo"))

        # --- FFN (reference: llama.go:340-369)
        h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
        if "w13" in lp:
            h13 = linear(h, lp["w13"])
            gate, up = h13[..., :config.ffn_hidden], h13[..., config.ffn_hidden:]
            gate = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype)
            x = x + linear(gate * up, lp["w2"])
        else:
            x = x + swiglu(h, lp["w1"], lp["w2"], lp["w3"], kinds=kinds)
        return x, k_layer, v_layer, ks_l, vs_l

    if remat:
        # Training: rematerialize each layer's activations in the
        # backward pass instead of keeping them live — a 7B b=4 seq=512
        # QLoRA step needs 19.8 GB of HBM without this (OOM on a 16 GB
        # chip) and fits comfortably with it. Inference never pays.
        block = jax.checkpoint(block)

    layers = params["layers"]
    n_l = config.n_layers
    ks_in = cache.ks if cache.ks is not None else (
        (None,) * n_l if cache.layered else None)
    vs_in = cache.vs if cache.vs is not None else (
        (None,) * n_l if cache.layered else None)
    if isinstance(layers, (list, tuple)):
        # Unrolled path: per-layer weight pytrees feed Pallas kernels
        # directly from HBM with no per-step layer-slice materialization
        # (a lax.scan over stacked weights must copy each layer's slice
        # before a custom call can read it). Compile time scales with
        # n_layers; used for the production decode path on TPU.
        if cache.layered:
            k_new_l, v_new_l, ks_new_l, vs_new_l = [], [], [], []
            for lp, k_l, v_l, ks_l, vs_l in zip(
                    layers, cache.k, cache.v, ks_in, vs_in):
                x, k_l, v_l, ks_l, vs_l = block(x, lp, k_l, v_l, ks_l, vs_l)
                k_new_l.append(k_l)
                v_new_l.append(v_l)
                ks_new_l.append(ks_l)
                vs_new_l.append(vs_l)
            k_new, v_new = tuple(k_new_l), tuple(v_new_l)
            ks_new = tuple(ks_new_l) if cache.quantized else None
            vs_new = tuple(vs_new_l) if cache.quantized else None
        else:
            k_new, v_new = cache.k, cache.v
            ks_new, vs_new = cache.ks, cache.vs
            for il, lp in enumerate(layers):
                x, k_l, v_l, ks_l, vs_l = block(
                    x, lp, k_new[il], v_new[il],
                    None if ks_new is None else ks_new[il],
                    None if vs_new is None else vs_new[il])
                k_new = k_new.at[il].set(k_l)
                v_new = v_new.at[il].set(v_l)
                if ks_l is not None:
                    ks_new = ks_new.at[il].set(ks_l)
                    vs_new = vs_new.at[il].set(vs_l)
    else:
        def scan_block(x, layer):
            lp, k_layer, v_layer, ks_l, vs_l = layer
            x, k_layer, v_layer, ks_l, vs_l = block(
                x, lp, k_layer, v_layer, ks_l, vs_l)
            return x, (k_layer, v_layer, ks_l, vs_l)

        # None scale entries are empty pytree subtrees, so the same scan
        # serves both the dense and the quantized cache.
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            scan_block, x, (layers, cache.k, cache.v, ks_in, vs_in))

    # --- final norm + lm head (reference: llama.go:374-384)
    x = rms_norm(x, params["norm"], config.norm_eps)
    if not return_all_logits:
        if logit_index is None:
            x = x[:, -1, :]
        else:
            x = jnp.take_along_axis(x, logit_index[:, None, None], axis=1)[:, 0, :]
    logits = linear(
        x, params["output"], compute_dtype=dtype, tp_kind=kinds.get("output")
    ).astype(jnp.float32)
    # The int8 lm head may be column-padded to a 512-byte-aligned row
    # stride (ops/quant.py pad_lm_head: 32000 -> 32768 streams ~80%
    # faster on v5e). Slice BEFORE anything consumes logits: the pad
    # columns dequantize to exactly 0, which would beat negative real
    # logits under argmax. Slice ONLY the width pad_lm_head produces —
    # converted checkpoints can legitimately carry more head columns
    # than the header vocab, and those logits must survive.
    from llamago_tpu.ops.quant import lm_head_padded_cols

    if (logits.shape[-1] != config.vocab_size
            and logits.shape[-1] == lm_head_padded_cols(config.vocab_size)):
        logits = logits[..., : config.vocab_size]

    new_cache = KVCache(k=k_new, v=v_new, ks=ks_new, vs=vs_new)
    if return_embedding:
        emb = (x[:, -1, :] if return_all_logits else x).astype(jnp.float32)
        return logits, new_cache, emb
    return logits, new_cache


forward = partial(jax.jit,
                  static_argnames=("config", "return_all_logits",
                                   "return_embedding", "remat"),
                  donate_argnames=("cache",))(forward_impl)


@partial(jax.jit, static_argnames=("config",), donate_argnames=("cache",))
def prefill_into_slot(
    params,
    tokens: jnp.ndarray,  # [1, T] int32 (right-padded to a bucket)
    cache: KVCache,  # full engine cache, batch = n_slots
    slot: jnp.ndarray,  # scalar int32
    write_pos: jnp.ndarray,  # [1] int32
    logit_index: jnp.ndarray,  # [1] int32 — last REAL prompt position
    config: ModelConfig,
):
    """Prefill one decode slot of a multi-slot cache.

    Slices the slot's cache out, runs the forward pass at batch 1, and
    writes it back — so admitting a job into a continuously-batched engine
    costs one prompt-sized prefill, not a full-batch one. (The reference's
    equivalent is each pod owning a private context, server.go:110-151.)

    Handles both cache layouts: stacked [L, B, KV, S, hd] (scan path) and
    layered tuples of [B, KV, S, hd] (unrolled path — the engine default,
    where per-layer weights feed the fused Pallas kernels directly).
    """
    stacked = not cache.layered
    zero = jnp.zeros((), slot.dtype)

    def slot_start(arr):
        # batch axis is 0 in layered arrays, 1 in stacked [L, B, ...]
        if stacked:
            return (zero, slot) + (zero,) * (arr.ndim - 2)
        return (slot,) + (zero,) * (arr.ndim - 1)

    def slot_sizes(arr):
        if stacked:
            return (arr.shape[0], 1) + arr.shape[2:]
        return (1,) + arr.shape[1:]

    def fmap(f, *trees):
        def ap(*xs):
            if xs[0] is None:
                return None
            if isinstance(xs[0], tuple):
                return tuple(f(*e) for e in zip(*xs))
            return f(*xs)
        return KVCache(*(ap(*[getattr(t, fld) for t in trees])
                         for fld in ("k", "v", "ks", "vs")))

    sub = fmap(lambda a: jax.lax.dynamic_slice(a, slot_start(a), slot_sizes(a)),
               cache)
    logits, sub = forward_impl(
        params, tokens, sub, write_pos, config, logit_index=logit_index
    )
    return logits[0], fmap(
        lambda a, s: jax.lax.dynamic_update_slice(a, s, slot_start(a)),
        cache, sub)
