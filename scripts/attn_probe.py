"""Isolate the b>=2 decode-step cost that scripts/batch_trunk.py proved
is NOT in the matmul/elementwise trunk (all flat b=1..8) but appears in
the real decode_chunk (11.5 -> 15.6 ms/step at b=2).

Times, at 7B attention geometry with the cache as a real scan carry:
  write    - rope + _update_cache only (cache write path)
  read     - attention_math over a static cache (no writes)
  rw       - write + read (the full attention block, no matmuls)
  gather   - token-embedding gather + sampler-ish argmax plumbing

Run: python scripts/attn_probe.py [component ...]   (env: AP_BATCHES)
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llamago_tpu.config import MODEL_PRESETS  # noqa: E402
from llamago_tpu.models.llama import _update_cache  # noqa: E402
from llamago_tpu.ops.attention import attention_math  # noqa: E402
from llamago_tpu.ops.basic import apply_rope  # noqa: E402


def _sync(a):
    return np.asarray(jax.tree.leaves(a)[0].reshape(-1)[:1])


CFG = MODEL_PRESETS[os.environ.get("AP_MODEL", "7B")]
L = CFG.n_layers
KV, HD, H = CFG.kv_heads, CFG.head_dim, CFG.n_heads
S = int(os.environ.get("AP_CTX", "512"))
STEPS = int(os.environ.get("AP_STEPS", "32"))
D = CFG.dim


def make(component, b):
    caches = tuple(jnp.zeros((b, KV, S, HD), jnp.bfloat16) for _ in range(L))
    vcaches = tuple(jnp.zeros((b, KV, S, HD), jnp.bfloat16) for _ in range(L))
    emb = jnp.zeros((CFG.vocab_size, D), jnp.bfloat16)

    def step(carry, _):
        x, ks, vs, pos = carry
        new_ks, new_vs = [], []
        for li in range(L):
            k, v = ks[li], vs[li]
            if component in ("write", "rw"):
                nk = x.reshape(b, 1, H, HD)[:, :, :KV, :]
                nk = apply_rope(nk, pos[:, None], CFG.rope_theta)
                nv = x.reshape(b, 1, H, HD)[:, :, :KV, :] * 1.0001
                k = _update_cache(k, nk.astype(k.dtype), pos)
                v = _update_cache(v, nv.astype(v.dtype), pos)
            if component in ("read", "rw"):
                q = x.reshape(b, 1, H, HD)
                q = apply_rope(q, pos[:, None], CFG.rope_theta)
                o = attention_math(q, k, v, pos[:, None])  # [b,1,H*hd]
                x = (x + o.reshape(b, 1, D) * 1e-3).astype(x.dtype)
            else:
                x = (x + k[:, 0, 0, :1].reshape(b, 1, 1) * 1e-3).astype(x.dtype)
            new_ks.append(k)
            new_vs.append(v)
        if component == "gather":
            tok = jnp.argmax(x[:, -1, :CFG.vocab_size % D + 128], -1)
            x = emb[tok][:, None, :] * 1e-3 + x
        pos = pos + 1
        return (x, tuple(new_ks), tuple(new_vs), pos), None

    @jax.jit
    def run(x, ks, vs, pos):
        (x, ks, vs, pos), _ = jax.lax.scan(
            step, (x, ks, vs, pos), None, length=STEPS)
        return x, ks, vs, pos

    x0 = jnp.ones((b, 1, D), jnp.bfloat16)
    pos0 = jnp.zeros((b,), jnp.int32)
    return run, (x0, caches, vcaches, pos0)


def main():
    batches = [int(s) for s in os.environ.get("AP_BATCHES", "1,2,4").split(",")]
    names = sys.argv[1:] or ["rw", "write", "read", "gather"]
    print(f"backend={jax.default_backend()} L={L} KV={KV} S={S} steps={STEPS}")
    for nm in names:
        row, base = [], None
        for b in batches:
            run, args = make(nm, b)
            out = run(*args)
            _sync(out[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = run(out[0], out[1], out[2], args[3])
                _sync(out[0])
                best = min(best, (time.time() - t0) / STEPS)
            ms = best * 1e3
            base = base or ms
            row.append(f"b={b}: {ms:6.2f} ({ms / base:4.2f}x)")
        print(f"{nm:>7s}  " + "  ".join(row))


if __name__ == "__main__":
    main()
