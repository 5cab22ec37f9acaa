"""Static-shape KV cache.

The reference allocates one flat F32 tensor per K/V sized
embd*layers*ctx per generation context and re-slices it with float
offsets every step (reference: pkg/llama/llama.go:92-103,274-297).
Here the cache is a fixed-shape device array pytree updated with
`lax.dynamic_update_slice` inside the jitted step — XLA aliases the
donated buffers so updates are in place, and the shapes never change,
which is what keeps prefill/decode down to one compilation each
(vs. the reference rebuilding its graph every step, llama.go:232).

Layout: [n_layers, batch, kv_heads, max_seq, head_dim] — layer-major so
`lax.scan` over layers unstacks it for free, and head-major so each
(batch, head) slice is a contiguous [max_seq, head_dim] plane in the
TPU-tileable last two dims (what the fused attention kernel's BlockSpecs
require, ops/attention.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    # Either one stacked array [L, B, KV, S, hd] (scan-over-layers path)
    # or a tuple of L arrays [B, KV, S, hd] (unrolled path — separate
    # buffers let XLA alias each layer's update in place inside a scan
    # carry; a stacked carry updated with .at[l].set() copies the whole
    # cache every layer).
    k: jax.Array | tuple
    v: jax.Array | tuple

    @property
    def layered(self) -> bool:
        return isinstance(self.k, tuple)

    @property
    def batch(self) -> int:
        return (self.k[0] if self.layered else self.k).shape[-4]

    @property
    def max_seq(self) -> int:
        return (self.k[0] if self.layered else self.k).shape[-2]

    @staticmethod
    def create(
        config: ModelConfig,
        batch: int = 1,
        max_seq: int | None = None,
        dtype=None,
        sharding=None,
        layered: bool = False,
    ) -> "KVCache":
        shape = (
            config.n_layers,
            batch,
            config.kv_heads,
            max_seq or config.max_seq_len,
            config.head_dim,
        )
        dtype = dtype or jnp.dtype(config.dtype)

        def mk():
            if layered:
                arrs = tuple(jnp.zeros(shape[1:], dtype) for _ in range(shape[0]))
                if sharding is not None:
                    layer_shard = _drop_layer_axis(sharding)
                    arrs = tuple(jax.device_put(a, layer_shard) for a in arrs)
                return arrs
            a = jnp.zeros(shape, dtype)
            return jax.device_put(a, sharding) if sharding is not None else a

        return KVCache(k=mk(), v=mk())


def _drop_layer_axis(sharding):
    from jax.sharding import NamedSharding, PartitionSpec

    spec = sharding.spec
    return NamedSharding(sharding.mesh, PartitionSpec(*tuple(spec)[1:]))
