"""Measure the fused flash-attention decode kernel's achieved bandwidth.

The decode step's non-weight cost is dominated by KV-cache reads; this
probe times `flash_attention` (ops/attention.py) standing alone at real
decode geometries and reports GB/s against the cache bytes it touches,
so kernel changes (length-aware tiling, quantized cache) can be A/B'd
without running the full model.

Run: python scripts/flash_probe.py   (env: FP_BATCHES, FP_CTX, FP_MODEL,
     FP_POSFRAC — position as a fraction of ctx, default 1.0 = full)
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
from llamago_tpu.ops import attention as A  # noqa: E402

CFG = MODEL_PRESETS[os.environ.get("FP_MODEL", "7B")]
KV, HD, H = CFG.kv_heads, CFG.head_dim, CFG.n_heads
REPS = int(os.environ.get("FP_REPS", "50"))


def bench(b, s, t, posfrac):
    q = jnp.ones((b, t, H, HD), jnp.bfloat16)
    k = jnp.ones((b, KV, s, HD), jnp.bfloat16)
    v = jnp.ones((b, KV, s, HD), jnp.bfloat16)
    pos_val = max(t, int(s * posfrac)) - t  # first query position
    pos = jnp.full((b, t), pos_val, jnp.int32) + jnp.arange(t)[None, :]

    if not A.can_fuse_attention(q, k):
        return None, None

    @jax.jit
    def run(q, k, v, pos):
        # chain REPS calls so per-call dispatch amortizes like in a scan
        def body(x, _):
            o = A.flash_attention(x, k, v, pos)
            return (x + o.reshape(b, t, H, HD) * 1e-6).astype(x.dtype), None
        x, _ = jax.lax.scan(body, q, None, length=REPS)
        return x

    out = run(q, k, v, pos)
    np.asarray(out[0, 0, 0, :1])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = run(q, k, v, pos)
        np.asarray(out[0, 0, 0, :1])
        best = min(best, (time.time() - t0) / REPS)
    full_bytes = 2 * b * KV * s * HD * 2  # K+V, bf16, full padded cache
    valid_bytes = 2 * b * KV * min(s, pos_val + t) * HD * 2
    return best * 1e3, (full_bytes / best / 1e9, valid_bytes / best / 1e9)


def main():
    batches = [int(x) for x in os.environ.get("FP_BATCHES", "1,2,4,8").split(",")]
    ctxs = [int(x) for x in os.environ.get("FP_CTX", "1024,2048").split(",")]
    t = int(os.environ.get("FP_T", "1"))
    posfrac = float(os.environ.get("FP_POSFRAC", "1.0"))
    print(f"backend={jax.default_backend()} "
          f"model={os.environ.get('FP_MODEL', '7B')} KV={KV} HD={HD} "
          f"t={t} posfrac={posfrac} (GB/s: full-cache / valid-prefix)")
    for s in ctxs:
        row = []
        for b in batches:
            ms, gbps = bench(b, s, t, posfrac)
            if ms is None:
                row.append(f"b={b}: skip")
            else:
                row.append(f"b={b}: {ms:6.3f}ms {gbps[0]:5.0f}/{gbps[1]:5.0f} GB/s")
        print(f"s={s:5d}  " + "  ".join(row))


if __name__ == "__main__":
    main()
