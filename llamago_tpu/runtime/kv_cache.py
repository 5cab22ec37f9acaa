"""Static-shape KV cache.

The reference allocates one flat F32 tensor per K/V sized
embd*layers*ctx per generation context and re-slices it with float
offsets every step (reference: pkg/llama/llama.go:92-103,274-297).
Here the cache is a fixed-shape device array pytree updated with
`lax.dynamic_update_slice` inside the jitted step — XLA aliases the
donated buffers so updates are in place, and the shapes never change,
which is what keeps prefill/decode down to one compilation each
(vs. the reference rebuilding its graph every step, llama.go:232).

Layout: [n_layers, batch, max_seq, kv_heads, head_dim], layer-major so
`lax.scan` over layers unstacks it for free.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    k: jax.Array  # [L, B, S, KV, hd]
    v: jax.Array  # [L, B, S, KV, hd]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @staticmethod
    def create(
        config: ModelConfig,
        batch: int = 1,
        max_seq: int | None = None,
        dtype=None,
        sharding=None,
    ) -> "KVCache":
        shape = (
            config.n_layers,
            batch,
            max_seq or config.max_seq_len,
            config.kv_heads,
            config.head_dim,
        )
        dtype = dtype or jnp.dtype(config.dtype)
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        if sharding is not None:
            k = jax.device_put(k, sharding)
            v = jax.device_put(v, sharding)
        return KVCache(k=k, v=v)
