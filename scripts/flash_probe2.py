"""Second flash-attention probe: mimic the in-model pattern (L distinct
per-layer caches, chained calls in one jit program) vs the scan-invariant
single-cache pattern of flash_probe.py, to separate per-call fixed cost
from bandwidth. Also A/B the XLA einsum path at the same shapes.

Run: python scripts/flash_probe2.py  (env: FP2_B, FP2_S, FP2_L, FP2_PATH)
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
L = int(os.environ.get("FP2_L", str(CFG.n_layers)))


def bench(fn, b, s, t=1):
    ks = [jnp.ones((b, KV, s, HD), jnp.bfloat16) * (i + 1) for i in range(L)]
    vs = [jnp.ones((b, KV, s, HD), jnp.bfloat16) * (i + 1) for i in range(L)]
    q0 = jnp.ones((b, t, H, HD), jnp.bfloat16)
    pos = jnp.full((b, t), s - t, jnp.int32) + jnp.arange(t)[None, :]

    @jax.jit
    def run(q, ks, vs, pos):
        for i in range(L):
            o = fn(q, ks[i], vs[i], pos)
            q = (q + o.reshape(b, t, H, HD) * 1e-6).astype(q.dtype)
        return q

    out = run(q0, ks, vs, pos)
    np.asarray(out[0, 0, 0, :1])
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = run(q0, ks, vs, pos)
        np.asarray(out[0, 0, 0, :1])
        best = min(best, time.time() - t0)
    bytes_ = 2 * L * b * KV * s * HD * 2
    return best * 1e3 / L, bytes_ / best / 1e9


def main():
    b_list = [int(x) for x in os.environ.get("FP2_B", "1,8").split(",")]
    s_list = [int(x) for x in os.environ.get("FP2_S", "1024,2048").split(",")]
    paths = os.environ.get("FP2_PATH", "flash,math").split(",")
    print(f"backend={jax.default_backend()} L={L} KV={KV} HD={HD} "
          "(ms/layer-call, GB/s over all-layer cache bytes)")
    for name in paths:
        fn = A.flash_attention if name == "flash" else A.attention_math
        for s in s_list:
            row = []
            for b in b_list:
                ms, gbps = bench(fn, b, s)
                row.append(f"b={b}: {ms:6.3f}ms {gbps:5.0f} GB/s")
            print(f"{name:>6s} s={s:5d}  " + "  ".join(row))


if __name__ == "__main__":
    main()
