"""Fused Pallas kernels under GSPMD meshes, via jax.shard_map.

A `pl.pallas_call` is compiled for ONE device; XLA's SPMD partitioner
cannot split the custom call the way it splits jnp ops. Round 1 therefore
disabled every fused kernel under any mesh and paid the jnp fallback's
~3x HBM traffic (dequantize-then-dot materializes a bf16 weight copy) —
exactly where the BASELINE's 70B INT4 TP-sharded roofline target needs
the kernel most.

This module closes that gap: each quantized matmul is wrapped in
`jax.shard_map` over the (dp, tp) mesh with Megatron-style specs
(reference sharding table: parallel/sharding.py, mirroring the
reference converter's shard-reassembly rules,
scripts/convert-pth-to-ggml.py:161-188), so every shard runs the
single-chip Pallas kernel on its LOCAL weight block:

  col-parallel (wq wk wv w1 w3 output): weights [K, N] split along N.
      x replicated over tp -> local [m, N/tp] -> out sharded on N.
      No collective; GSPMD reshards downstream if needed.
  row-parallel (wo w2): weights split along K (at quant-block
      granularity), x feature-sharded -> partial [m, N] -> psum over tp.

The dp axis shards the batch dim whenever it divides; weights are
replicated over dp. Inside the shard_map body the kernel sees plain
local arrays, so the existing `can_fuse_local` shape gates and the jnp
fallback apply per-shard unchanged.

Activation: the CLI / dryrun set `ops.kernels.ACTIVE_MESH` once at
startup (before any trace). `can_fuse` refuses global-value fusion while
a mesh is active; `maybe_tp_matmul` below is then the only route into
the Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llamago_tpu.config import ModelConfig

QK = 32  # quantization block size (ops/quant.py)


def activate_mesh(mesh: Mesh | None) -> None:
    """Declare the process-wide GSPMD mesh. Call once at startup, before
    the first trace — jit caches key on shapes, not on this global."""
    from llamago_tpu.ops import kernels

    kernels.ACTIVE_MESH = mesh


def active_mesh() -> Mesh | None:
    from llamago_tpu.ops import kernels

    return kernels.ACTIVE_MESH


def tp_kinds(config: ModelConfig, mesh: Mesh | None) -> dict[str, str]:
    """Partition kind per matmul leaf, with the same head-count gates as
    param_shardings (sharding.py): attention projections split only when
    the tp size divides the head count, so the shard_map specs always
    match the stored weight shardings (no per-step weight resharding)."""
    if mesh is None or mesh.shape.get("tp", 1) <= 1:
        return {}
    tp = mesh.shape["tp"]
    kinds: dict[str, str] = {"w1": "col", "w3": "col", "w2": "row",
                             "output": "col"}
    if config.n_heads % tp == 0:
        kinds["wq"] = "col"
        kinds["wo"] = "row"
    if config.kv_heads % tp == 0:
        kinds["wk"] = "col"
        kinds["wv"] = "col"
    return kinds


def _local_matmul(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """Single-shard quantized matmul: fused Pallas kernel when the local
    shapes allow, jnp dequantize-then-dot otherwise."""
    from llamago_tpu.ops import kernels
    from llamago_tpu.ops.quant import dequantize

    if kernels.can_fuse_local(x, w):
        return kernels.dequant_matmul(x, w)
    deq = dequantize(w, dtype=x.dtype)
    return jnp.dot(x, deq, preferred_element_type=x.dtype)


def _x_spec(x: jnp.ndarray, dp: int, last) -> P:
    """Spec for the activation: batch on dp when it divides, contraction /
    feature dim per `last`, middle dims replicated."""
    b = "dp" if (dp > 1 and x.ndim >= 2 and x.shape[0] % dp == 0) else None
    return P(*([b] + [None] * (x.ndim - 2) + [last]))


def maybe_tp_matmul(x: jnp.ndarray, w: dict, kind: str | None):
    """Quantized matmul through shard_map over the active mesh.

    Returns None when no mesh is active or the shapes don't divide the
    mesh axes — the caller then takes the jnp/GSPMD path (which matches
    param_shardings' replication fallback for the same leaves).
    """
    mesh = active_mesh()
    if mesh is None:
        return None
    if "m" in w or w["s"].ndim != 2:  # Q4_1 affine / stacked: jnp path
        return None
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    k = x.shape[-1]
    n = w["s"].shape[-1]
    qkey = "q8" if "q8" in w else ("q4x" if "q4x" in w else "q4")
    # row-sharding must keep whole scale groups per shard (w4x8 groups
    # are 128 wide vs the Q4_0/Q8_0 32)
    blk = 128 if qkey == "q4x" else QK

    if kind == "col" and tp > 1 and n % tp == 0:
        w_specs = {qkey: P(None, "tp"), "s": P(None, "tp")}
        xs = _x_spec(x, dp, None)
        os = _x_spec(x, dp, "tp")
        body = _local_matmul
    elif kind == "row" and tp > 1 and k % (blk * tp) == 0:
        w_specs = {qkey: P("tp", None), "s": P("tp", None)}
        xs = _x_spec(x, dp, "tp")
        os = _x_spec(x, dp, None)

        def body(xl, wl):
            return jax.lax.psum(_local_matmul(xl, wl), "tp")
    elif tp == 1 and dp > 1:
        # pure data parallelism: weights replicated, batch split; the
        # fused kernel runs per-dp-shard with zero collectives.
        w_specs = {qkey: P(None, None), "s": P(None, None)}
        xs = _x_spec(x, dp, None)
        os = xs
        body = _local_matmul
    else:
        return None

    return jax.shard_map(
        body, mesh=mesh, in_specs=(xs, w_specs), out_specs=os,
        check_vma=False,
    )(x, w)


def maybe_tp_attention(attn_fn, q, k_cache, v_cache, positions):
    """Attention through shard_map over the active mesh.

    q [B, T, H, hd], caches [B, KV, S, hd], positions [B, T]. The head
    dim shards over tp when tp divides BOTH head counts (matching
    cache_sharding's kv-head split — contiguous chunks of H/tp q heads
    attend to exactly their local KV/tp cache heads, since head h reads
    kv head h//g); batch shards over dp when it divides. `attn_fn` is the
    shard-local attention (fused Pallas kernel or jnp math — see
    models/llama.py:_attention_local). Returns [B, T, H*hd] globally, or
    None when no axis applies (caller falls back to GSPMD jnp).
    """
    mesh = active_mesh()
    if mesh is None:
        return None
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    b, t, h, hd = q.shape
    kv = k_cache.shape[1]
    s = k_cache.shape[2]
    tp_ok = tp > 1 and h % tp == 0 and kv % tp == 0
    sp_ok = sp > 1 and s % sp == 0
    bspec = "dp" if (dp > 1 and b % dp == 0) else None
    if not tp_ok and not sp_ok and bspec is None:
        return None
    hspec = "tp" if tp_ok else None
    sspec = "sp" if sp_ok else None

    q_spec = P(bspec, None, hspec, None)
    kv_spec = P(bspec, hspec, sspec, None)
    pos_spec = P(bspec, None)
    out_spec = P(bspec, None, hspec)  # [B, T, H*hd]

    if sp_ok:
        # sequence-parallel body: partial softmax stats per cache shard,
        # combined with pmax/psum over "sp" (ops/attention.py) — composes
        # with the tp head split (collectives stay within the sp axis)
        from llamago_tpu.ops.attention import attention_math_sp

        body = attention_math_sp
    else:
        body = attn_fn

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, pos_spec),
        out_specs=out_spec, check_vma=False,
    )(q, k_cache, v_cache, positions)


def maybe_tp_attention_quant(q, k_cache, v_cache, positions,
                             k_scale, v_scale):
    """Sharded attention over the INT8-quantized cache (same axis logic
    as maybe_tp_attention; scale buffers [B, KV, S] shard like the cache
    with the head_dim axis dropped). Shard-local bodies: the fused
    scale-folding decode kernel when the local geometry allows, the
    scale-folded jnp math otherwise; under sp, the flash-combine SP body
    with local scale folding. Returns None when no mesh axis applies."""
    mesh = active_mesh()
    if mesh is None:
        return None
    tp = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    b, t, h, hd = q.shape
    kv = k_cache.shape[1]
    s = k_cache.shape[2]
    tp_ok = tp > 1 and h % tp == 0 and kv % tp == 0
    sp_ok = sp > 1 and s % sp == 0
    bspec = "dp" if (dp > 1 and b % dp == 0) else None
    if not tp_ok and not sp_ok and bspec is None:
        return None
    hspec = "tp" if tp_ok else None
    sspec = "sp" if sp_ok else None

    q_spec = P(bspec, None, hspec, None)
    kv_spec = P(bspec, hspec, sspec, None)
    sc_spec = P(bspec, hspec, sspec)
    pos_spec = P(bspec, None)
    out_spec = P(bspec, None, hspec)  # [B, T, H*hd]

    if sp_ok:
        from llamago_tpu.ops.attention import attention_math_sp

        def body(ql, kl, vl, pl_, ksl, vsl):
            return attention_math_sp(ql, kl, vl, pl_, "sp", ksl, vsl)
    else:
        from llamago_tpu.ops.attention import (
            attention_math,
            can_fuse_attention_quant_local,
            flash_attention_quant,
        )

        def body(ql, kl, vl, pl_, ksl, vsl):
            if can_fuse_attention_quant_local(ql, kl):
                return flash_attention_quant(ql, kl, vl, pl_, ksl, vsl)
            return attention_math(ql, kl, vl, pl_, ksl, vsl)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, pos_spec, sc_spec, sc_spec),
        out_specs=out_spec, check_vma=False,
    )(q, k_cache, v_cache, positions, k_scale, v_scale)
