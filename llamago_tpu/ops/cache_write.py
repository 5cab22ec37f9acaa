"""Fused KV-cache append kernel (decode hot path).

The jnp write path for the int8 cache costs FOUR dynamic_update_slice
chains per batch row per layer (K values, V values, K scales, V scales —
models/llama.py:_update_cache/_update_scale), unrolled over rows because
a vmapped DUS lowers to a 4 ms/step scatter. At b=8 x 32 layers that is
1024 tiny fusions per decode step, measured at ~1.5 ms/step of the
13.9 ms b=8 kvq step (elimination probe, r5: full 13.9 ms, bypass-cache
12.4 ms, bypass-both 9.9 ms).

This kernel replaces all of a layer's writes with ONE pallas_call:
grid (b,), scalar-prefetched per-row write positions, the four cache
buffers aliased in/out, and the int8 row quantization fused in.

TPU block constraint: the last two block dims must be (8, 128)-aligned,
so a single cache row cannot be a block — each grid step instead
read-modify-writes the 8-row S-block containing the position (and the
128-wide scale block), selecting the target row with an iota mask.
That is 8 rows of DMA per write instead of 1: ~32 KB per (layer, slot,
tensor), ~25 MB/step at 7B b=8 — noise next to the 1.4 GB cache-read
stream, and three orders cheaper than the DUS-chain launches it
replaces.

Decode only (t == 1, int8 cache): prefill keeps the DUS path — its
bucket-sized writes amortize fine and alias in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamago_tpu.ops import kernels as _k

_ROWS = 8     # S-rows per cache block (TPU sublane alignment)
_SROWS = 128  # S-columns per scale block (TPU lane alignment)


def can_fuse_cache_append(k_new: jnp.ndarray, cache_k: jnp.ndarray) -> bool:
    """k_new [B, T, KV, hd] bf16; cache_k [B, KV, S, hd] int8.

    t == 1 STRICTLY: the kernel writes one row per grid step; prefill
    and speculative verify windows (t>1) keep the DUS path. Under a mesh
    the kernel would need a shard_map wrapper (per-shard pallas), not
    done yet."""
    if _k.DISABLE_FUSED or _k.ACTIVE_MESH is not None:
        return False
    if not (_k._on_tpu() or _k.FORCE_INTERPRET):
        return False
    b, t, kv, hd = k_new.shape
    if t != 1:
        return False
    s = cache_k.shape[2]
    if s % _SROWS != 0:
        return False
    if _k._on_tpu() and hd % 128 != 0:
        return False
    return cache_k.dtype == jnp.int8


def _append_kernel(pos_ref, k_ref, v_ref, ki_ref, vi_ref, ksi_ref, vsi_ref,
                   ko_ref, vo_ref, kso_ref, vso_ref):
    """One grid step = one batch row: quantize the row's new K/V
    [1, KV, hd], then read-modify-write the 8-row cache block and the
    128-wide scale block that contain the row's write position."""
    bi = pl.program_id(0)
    pos = pos_ref[bi]
    kv, _, hd = ko_ref.shape[1:]

    k = k_ref[0, 0].astype(jnp.float32)  # [KV, hd]
    v = v_ref[0, 0].astype(jnp.float32)

    def quant(x):
        a = jnp.max(jnp.abs(x), axis=-1)  # [KV]
        s = jnp.where(a > 0, a / 127.0, 1.0)
        q = jnp.clip(jnp.round(x / s[:, None]), -127, 127)
        return q.astype(jnp.int8), s

    kq, ks = quant(k)
    vq, vs = quant(v)

    off = pos % _ROWS
    sel = jax.lax.broadcasted_iota(jnp.int32, (kv, _ROWS, hd), 1) == off
    ko_ref[0] = jnp.where(sel, kq[:, None, :], ki_ref[0])
    vo_ref[0] = jnp.where(sel, vq[:, None, :], vi_ref[0])

    soff = pos % _SROWS
    ssel = jax.lax.broadcasted_iota(jnp.int32, (kv, _SROWS), 1) == soff
    kso_ref[0] = jnp.where(ssel, ks[:, None].astype(kso_ref.dtype),
                           ksi_ref[0])
    vso_ref[0] = jnp.where(ssel, vs[:, None].astype(vso_ref.dtype),
                           vsi_ref[0])


@jax.jit
def cache_append_quant(cache_k, cache_v, cache_ks, cache_vs,
                       k_new, v_new, write_pos):
    """Quantize-and-append new K/V rows into the int8 cache.

    cache_k/cache_v [B, KV, S, hd] int8; cache_ks/cache_vs [B, KV, S];
    k_new/v_new [B, 1, KV, hd]; write_pos [B] int32. Returns the four
    updated buffers. In-place-ness comes from the pallas
    input_output_aliases under the CALLER's jit (forward donates the
    cache); standalone top-level calls get a defensive copy instead."""
    b, t, kv, hd = k_new.shape
    cache_spec = pl.BlockSpec(
        (1, kv, _ROWS, hd),
        lambda bi, pos_ref: (bi, 0, pos_ref[bi] // _ROWS, 0),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, kv, _SROWS),
        lambda bi, pos_ref: (bi, 0, pos_ref[bi] // _SROWS),
        memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, t, kv, hd),
                            lambda bi, pos_ref: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[new_spec, new_spec,
                  cache_spec, cache_spec, scale_spec, scale_spec],
        out_specs=[cache_spec, cache_spec, scale_spec, scale_spec],
    )
    out_shapes = [
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        jax.ShapeDtypeStruct(cache_ks.shape, cache_ks.dtype),
        jax.ShapeDtypeStruct(cache_vs.shape, cache_vs.dtype),
    ]
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # alias indices count ALL operands incl. the scalar prefetch:
        # 0=write_pos, 1=k_new, 2=v_new, 3..6=the caches -> outputs,
        # so the append is in place
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        interpret=_k._interpret(),
    )(write_pos, k_new, v_new, cache_k, cache_v, cache_ks, cache_vs)
