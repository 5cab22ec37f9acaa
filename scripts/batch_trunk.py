"""Batch-scaling anomaly bisection (VERDICT r3 #3).

bench_artifacts/decode_7b_int8_b2.json: b=2 decode is 1.33x b=1 where
weight-bandwidth-bound decode should be ~1.9x; per-step time doubles
b=1 -> b=4 then flattens. Elimination probes (docs/QUANTIZATION.md)
ruled out KV writes and attention (~8% each) — the cost sits in the
matmul+elementwise trunk even though every dequant kernel runs identical
tm=8 tiles for all b <= 8. Device profiling wedges this TPU transport,
so this script attributes the cost empirically: it times isolated
component stacks at b in {1, 2, 4, 8} and prints ms/step per component.
Whichever component's time tracks the full step's doubling is the
culprit; a flat component is exonerated.

Components (all at decode shapes, T=1, chained through a lax.scan over
steps so dispatch cost is amortized exactly like production decode):
  linears   - the four per-layer projections only (wqkv/wo/w13/w2)
  wqkv/wo/w13/w2 - each projection alone, x32 layers
  trunk     - linears + rms_norms + silu*up + residuals + rope (no
              attention, no cache)
  ew        - the elementwise set alone (no matmuls)
  lmhead    - final norm + output projection + argmax
  fwd       - real forward_impl via decode_chunk (greedy), the baseline

Run: python scripts/batch_trunk.py [component ...]
Env: BT_MODEL (7B), BT_WEIGHT_DTYPE (int8), BT_STEPS (32), BT_BATCHES.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(a):
    return np.asarray(jax.tree.leaves(a)[0].reshape(-1)[:1])


def build(config, params):
    from llamago_tpu.ops.basic import apply_rope, linear, rms_norm

    d = config.dim
    q_dim = config.n_heads * config.head_dim
    kv_dim = config.kv_heads * config.head_dim
    ffn = config.ffn_hidden
    layers = params["layers"]
    lp0 = layers[0]
    has_fused = "wqkv" in lp0

    def layer_linears(x, lp):
        # chained like production minus attention: each output feeds the
        # next projection so XLA cannot dead-code or reorder across them
        if has_fused:
            qkv = linear(x, lp["wqkv"])
        else:
            qkv = jnp.concatenate(
                [linear(x, lp["wq"]), linear(x, lp["wk"]), linear(x, lp["wv"])],
                axis=-1)
        x = linear(qkv[..., :q_dim], lp["wo"])
        if "w13" in lp:
            h13 = linear(x, lp["w13"])
            gate, up = h13[..., :ffn], h13[..., ffn:]
        else:
            gate, up = linear(x, lp["w1"]), linear(x, lp["w3"])
        return linear((gate + up)[..., :ffn], lp["w2"])

    def one_proj(name):
        def step(x, lp):
            if name == "wqkv":
                w = lp["wqkv"] if has_fused else lp["wq"]
                return linear(x, w)[..., :d]
            if name == "wo":
                return linear(x, lp["wo"])
            if name == "w13":
                w = lp.get("w13", lp["w1"])
                o = linear(x, w)
                return o[..., :d]
            if name == "w2":
                # w2 contracts over ffn: widen x by tiling (cheap, counted
                # in ew's budget not here)
                xin = jnp.concatenate([x] * (ffn // d + 1), axis=-1)[..., :ffn]
                return linear(xin, lp["w2"])
            raise ValueError(name)
        return step

    def layer_ew(x, lp):
        # the elementwise set with shape-preserving stand-ins for matmuls
        h = rms_norm(x, lp["attention_norm"], config.norm_eps)
        b, t = h.shape[:2]
        q = h[..., :q_dim].reshape(b, t, config.n_heads, config.head_dim)
        pos = jnp.zeros((b, t), jnp.int32)
        q = apply_rope(q, pos, config.rope_theta).reshape(b, t, q_dim)
        k = h[..., :kv_dim].reshape(b, t, config.kv_heads, config.head_dim)
        k = apply_rope(k, pos, config.rope_theta).reshape(b, t, kv_dim)
        x = x + q[..., :d] * 1.0001 + jnp.pad(k, [(0, 0)] * 2 + [(0, d - kv_dim)])
        h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
        gate = jnp.concatenate([h] * (ffn // d + 1), axis=-1)[..., :ffn]
        up = gate * 1.0001
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
        return x + act[..., :d]

    def layer_trunk(x, lp):
        h = rms_norm(x, lp["attention_norm"], config.norm_eps)
        if has_fused:
            qkv = linear(h, lp["wqkv"])
            q = qkv[..., :q_dim]
        else:
            q = linear(h, lp["wq"])
        b, t = q.shape[:2]
        pos = jnp.zeros((b, t), jnp.int32)
        qh = q.reshape(b, t, config.n_heads, config.head_dim)
        qh = apply_rope(qh, pos, config.rope_theta)
        x = x + linear(qh.reshape(b, t, q_dim), lp["wo"])
        h = rms_norm(x, lp["ffn_norm"], config.norm_eps)
        if "w13" in lp:
            h13 = linear(h, lp["w13"])
            gate, up = h13[..., :ffn], h13[..., ffn:]
        else:
            gate, up = linear(h, lp["w1"]), linear(h, lp["w3"])
        gate = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype)
        return x + linear(gate * up, lp["w2"])

    def lmhead(x, lp):
        h = rms_norm(x, lp["norm"], config.norm_eps)
        logits = linear(h[:, -1, :], lp["output"],
                        compute_dtype=x.dtype).astype(jnp.float32)
        tok = jnp.argmax(logits, -1)
        return x + (tok[:, None, None] % 3).astype(x.dtype) * 1e-6

    comps = {
        "linears": (layer_linears, True),
        "wqkv": (one_proj("wqkv"), True),
        "wo": (one_proj("wo"), True),
        "w13": (one_proj("w13"), True),
        "w2": (one_proj("w2"), True),
        "ew": (layer_ew, True),
        "trunk": (layer_trunk, True),
        "lmhead": (lmhead, False),
    }
    return comps


def time_component(name, fn, per_layer, params, config, b, steps):
    d = config.dim
    layers = (params["layers"] if per_layer
              else {"norm": params["norm"], "output": params["output"]})
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

    # layers MUST be a jit argument: closing over the params list embeds
    # ~7 GB of weights as compile-time constants (device copies + glacial
    # lowering — observed 6.88 GB captured-constants warning).
    def one_step(x, lys):
        if per_layer:
            for lp in lys:
                o = fn(x, lp)
                x = (x + o[..., :d] * 1e-3).astype(dtype)
        else:
            x = fn(x, lys).astype(dtype)
        return x

    @jax.jit
    def run(x, lys):
        def body(x, _):
            return one_step(x, lys), None
        x, _ = jax.lax.scan(body, x, None, length=steps)
        return x

    x0 = jnp.ones((b, 1, d), dtype)
    x = run(x0, layers)
    _sync(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        x = run(x, layers)
        _sync(x)
        best = min(best, (time.time() - t0) / steps)
    return best * 1e3  # ms/step


def time_attn(params, config, b, steps):
    """The attention block alone (rope + cache write + production
    _attention dispatch, so the flash kernel engages exactly as in
    forward_impl), per-layer caches carried through the scan."""
    from llamago_tpu.models.llama import _attention, _update_cache
    from llamago_tpu.ops.basic import apply_rope

    d = config.dim
    kv, hd, h_n = config.kv_heads, config.head_dim, config.n_heads
    s = config.max_seq_len
    n_l = config.n_layers
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32

    caches = tuple(jnp.zeros((b, kv, s, hd), dtype) for _ in range(2 * n_l))

    @jax.jit
    def run(x, caches, pos):
        def body(carry, _):
            x, caches, pos = carry
            positions = pos[:, None]
            new = []
            for li in range(n_l):
                k_l, v_l = caches[2 * li], caches[2 * li + 1]
                q = x.reshape(b, 1, h_n, hd)
                knew = x.reshape(b, 1, h_n, hd)[:, :, :kv, :]
                q = apply_rope(q, positions, config.rope_theta)
                knew = apply_rope(knew, positions, config.rope_theta)
                k_l = _update_cache(k_l, knew.astype(dtype), pos)
                v_l = _update_cache(v_l, (knew * 1.0001).astype(dtype), pos)
                attn = _attention(config, q, k_l, v_l, positions)
                x = (x + attn.reshape(b, 1, d) * 1e-3).astype(dtype)
                new += [k_l, v_l]
            return (x, tuple(new), pos + 1), None
        (x, caches, pos), _ = jax.lax.scan(
            body, (x, caches, pos), None, length=steps)
        return x, caches, pos

    x0 = jnp.ones((b, 1, d), dtype)
    pos0 = jnp.zeros((b,), jnp.int32)
    x, caches, pos = run(x0, caches, pos0)
    _sync(x)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        x, caches, pos = run(x, caches, pos - steps)
        _sync(x)
        best = min(best, (time.time() - t0) / steps)
    return best * 1e3


def time_fwd(params, config, b, steps):
    from llamago_tpu.runtime.decode_loop import decode_chunk
    from llamago_tpu.runtime.kv_cache import KVCache

    cache = KVCache.create(config, batch=b, layered=True)
    tok = jnp.ones((b,), jnp.int32)
    pos = jnp.zeros((b,), jnp.int32)
    from llamago_tpu.ops.sampling import SamplerState

    st = SamplerState.create(b, 1, config.vocab_size)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.zeros(b, jnp.int32))
    toks, cache, pos, st, rngs = decode_chunk(
        params, tok, cache, pos, config, steps, rngs=rngs, state=st)
    _sync(toks)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        toks, cache, pos, st, rngs = decode_chunk(
            params, toks[:, -1], cache, pos, config, steps, rngs=rngs, state=st)
        _sync(toks)
        best = min(best, (time.time() - t0) / steps)
        pos = pos - steps  # stay inside the ctx window
    return best * 1e3


def main():
    on_tpu = jax.default_backend() == "tpu"
    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights, random_quantized_parameters)
    from llamago_tpu.config import MODEL_PRESETS

    model = os.environ.get("BT_MODEL", "7B" if on_tpu else "tiny")
    wd = os.environ.get("BT_WEIGHT_DTYPE", "int8")
    steps = int(os.environ.get("BT_STEPS", "32" if on_tpu else "4"))
    batches = [int(s) for s in os.environ.get("BT_BATCHES", "1,2,4,8").split(",")]
    ctx = int(os.environ.get("BT_CTX", "512" if on_tpu else "128"))
    config = MODEL_PRESETS[model].replace(
        dtype="bfloat16" if on_tpu else "float32", weight_dtype=wd,
        max_seq_len=ctx)
    params = random_quantized_parameters(config, seed=0, layered=True)
    if os.environ.get("BT_FUSE", "1") == "1":
        params = fuse_layer_weights(params)
    _sync(params)

    comps = build(config, params)
    names = sys.argv[1:] or ["fwd", "trunk", "linears", "ew", "lmhead"]
    print(f"backend={jax.default_backend()} model={model} {wd} steps={steps}")
    print(f"{'component':>10s} " + " ".join(f"b={b:<7d}" for b in batches)
          + " (ms/step; x-vs-b1 in parens)")
    for nm in names:
        row = []
        base = None
        for b in batches:
            if nm == "fwd":
                ms = time_fwd(params, config, b, steps)
            elif nm == "attn":
                ms = time_attn(params, config, b, steps)
            else:
                fn, per_layer = comps[nm]
                ms = time_component(nm, fn, per_layer, params, config, b, steps)
            base = base or ms
            row.append(f"{ms:6.2f} ({ms / base:4.2f}x)")
        print(f"{nm:>10s} " + " ".join(row))


if __name__ == "__main__":
    main()
