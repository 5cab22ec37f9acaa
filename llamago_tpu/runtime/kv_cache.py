"""Static-shape KV cache, optionally int8-quantized.

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

Quantized mode (``kv_dtype="int8"``): K/V rows are stored int8 with one
f32 scale per (batch, head, position) row of head_dim elements —
`q = round(x / s), s = absmax/127`. Decode attention is cache-READ
bound, and on TPU a bf16 cache read is DMA-limited (2 bytes/element)
while an int8 read needs only one VPU widen per element — measured
faster per element — so the quantized cache both halves the cache's HBM
footprint (2x the contexts/slots per chip) and speeds up cache-bound
decode. The scales are folded into the attention SCORES (per cache
column) and probabilities, never into the K/V elements, so dequant
costs O(S) per head instead of O(S*head_dim) — see ops/attention.py.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from llamago_tpu.config import ModelConfig

# Storage dtype of the int8 cache's per-row scale planes [L, B, KV, S].
# Negative result (measured r5, 7B b=8 ctx1024 decode): the scale-plane
# stream is ~3 GB/s of a ~700 GB/s step with f32 scales — 0.4% — so the
# r4-VERDICT suggestion to store them bf16 buys run-noise-level time
# while costing scale exactness (bf16 rounds the per-row scale by up to
# 2^-9, which measurably flips greedy tokens on small models). f32 stays
# the default; LLAMAGO_KV_SCALE_DTYPE=bfloat16 keeps the A/B alive.
_SCALE_DTYPE_NAME = os.environ.get("LLAMAGO_KV_SCALE_DTYPE", "float32")


def scale_dtype():
    return jnp.dtype(_SCALE_DTYPE_NAME)


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
    # int8 mode only: per-row scales [L, B, KV, S] stacked or a tuple of
    # [B, KV, S] arrays. None => dense (k/v hold bf16/f32 directly).
    ks: jax.Array | tuple | None = None
    vs: jax.Array | tuple | None = None

    @property
    def layered(self) -> bool:
        return isinstance(self.k, tuple)

    @property
    def quantized(self) -> bool:
        return self.ks is not None

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
        quantized: bool | None = None,
    ) -> "KVCache":
        shape = (
            config.n_layers,
            batch,
            config.kv_heads,
            max_seq or config.max_seq_len,
            config.head_dim,
        )
        if quantized is None:
            quantized = config.kv_dtype == "int8"
        if quantized:
            dtype = jnp.int8
        elif dtype is None:
            dtype = (jnp.dtype(config.kv_dtype)
                     if config.kv_dtype != "auto" else jnp.dtype(config.dtype))

        def mk(shp, dt, shard):
            if layered:
                arrs = tuple(jnp.zeros(shp[1:], dt) for _ in range(shp[0]))
                if shard is not None:
                    layer_shard = _drop_axes(shard, len(shape), drop_first=1)
                    arrs = tuple(jax.device_put(a, layer_shard) for a in arrs)
                return arrs
            a = jnp.zeros(shp, dt)
            return jax.device_put(a, shard) if shard is not None else a

        k = mk(shape, dtype, sharding)
        v = mk(shape, dtype, sharding)
        if not quantized:
            return KVCache(k=k, v=v)
        # scale buffers drop the head_dim axis; zero-initialized, so an
        # unwritten row dequantizes to exactly zero (masked out anyway)
        s_shape = shape[:-1]
        s_shard = None
        if sharding is not None:
            s_shard = _drop_axes(sharding, len(shape), drop_last=1)
        ks = mk(s_shape, scale_dtype(), s_shard)
        vs = mk(s_shape, scale_dtype(), s_shard)
        return KVCache(k=k, v=v, ks=ks, vs=vs)


def quantize_kv_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization over the trailing head_dim.

    x [..., hd] -> (int8 [..., hd], f32 scale [...]) with
    q = round(x/s) for s = absmax/127 (s=1 for all-zero rows so the
    dequantized row is exactly zero)."""
    xf = x.astype(jnp.float32)
    a = jnp.max(jnp.abs(xf), axis=-1)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _drop_axes(sharding, rank: int, drop_first: int = 0, drop_last: int = 0):
    """Sharding for a view of a rank-`rank` array with leading/trailing
    axes removed. The spec is padded to full rank first so positional
    drops stay aligned (a PartitionSpec may omit trailing axes)."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = tuple(sharding.spec)
    spec = spec + (None,) * (rank - len(spec))
    if drop_first:
        spec = spec[drop_first:]
    if drop_last:
        spec = spec[:-drop_last]
    return NamedSharding(sharding.mesh, PartitionSpec(*spec))
