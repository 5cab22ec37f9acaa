"""Fused attention-over-KV-cache Pallas kernel (flash-style).

The TPU-native replacement for the reference's attention op chain —
KQ = MulMat(K, Q); scale; DiagMaskInf; SoftMax; KQV = MulMat(V, KQ)
(reference: pkg/llama/llama.go:300-336, executed as five separate graph
nodes over goroutines). Lowering that chain through plain jnp
materializes the [B, KV, G, T, S] score tensor in HBM twice (once for
scores, once for probs); this kernel keeps scores in VMEM and streams
each K/V cache element through VMEM exactly once, so decode attention
runs at the cache-read bandwidth roofline.

Layout strategy (vs. a textbook flash kernel): decode and short-prefill
caches are small enough that several heads' [S, hd] K/V planes fit in
VMEM at once (S=4096, hd=128, bf16 = 1 MB/plane), so instead of
online-softmax accumulation over S-blocks we grid over
(batch, head-block, q-tile) and do one masked softmax per tile:

  * KH heads are processed per program as a batched dot_general —
    grid-step count (and its fixed cost, significant on this platform)
    drops by KH vs one-head-per-program;
  * the q-tile axis is innermost and the K/V index map ignores it, so
    Pallas keeps the K/V block resident across q-tiles (no re-fetch);
  * GQA folds the head-group axis into the q-tile rows: MHA (g=1)
    decodes with rows=1 per head (bandwidth-bound anyway), GQA feeds
    g rows per head to the MXU.

The causal mask reproduces DiagMaskInf+SoftMax semantics: cache slot j
is visible iff j <= absolute query position (see _attention in
models/llama.py for why that covers exactly the written prefix).

Cache layout is [B, KV, S, hd] (see runtime/kv_cache.py) so each head's
(S, hd) plane lands in the TPU-tileable last two block dims.

Off-TPU the kernel runs under interpret=True so the same code path is
unit-tested on CPU (tests/test_attention.py).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llamago_tpu.ops import kernels as _k

NEG_INF = float("-inf")

# VMEM budgets (bytes) guarding kernel applicability; past these the jnp
# path is used instead. K+V blocks are double-buffered by the pipeline;
# the f32 score tile lives once. Env-overridable for tiling sweeps.
_KV_BYTES_MAX = int(_os.environ.get(
    "LLAMAGO_ATTN_KV_BYTES", 2 * 1024 * 1024))  # single-buffer K+V/program
_SCORE_BYTES_MAX = int(_os.environ.get(
    "LLAMAGO_ATTN_SCORE_BYTES", 4 * 1024 * 1024))

# Engagement floors, re-derived on v5e by in-model A/B (bench.py with
# the env overrides below) rather than dispatch-cost guesses.
#
# r3 re-derivation (7B int8 decode, kernel ON vs the XLA einsum path,
# same-day pairs): the kernel now wins at EVERY decode shape measured —
# b=1 ctx=1024: 73.3 vs 71.7 tok/s; b=1 ctx=2048: 68.1 vs 47.8 (+42%);
# b=2 ctx=1024: 103.3 vs 92.3; b=2 ctx=2048: 98.3 vs 59.1 (+66%);
# b=2 ctx=512: 105.4 vs 100.3. The XLA path's cache reads run at ~20-25%
# of HBM bandwidth and scale badly with S and batch — this WAS the
# "batch-scaling anomaly" (docs/QUANTIZATION.md). An earlier r2-era A/B
# measured the opposite (53.0 vs 67.4 at b=1 ctx=1024) and gated the
# kernel off; that result did not reproduce on re-measurement.
# DEFAULT: kernel ON for decode (floor 0). Prefill keeps the XLA path:
# repeated same-day A/Bs at T=128 S=2048 swing +-35% for IDENTICAL
# configs on this transport (XLA 57.8-96.7 ms, kernel 68.1-90.2), so
# neither the r3 "kernel loses 24%" reading nor the later "kernel wins"
# readings are trustworthy — prefill is not decode-critical and the
# safe default is the compiler path. Overrides (bytes):
# LLAMAGO_ATTN_DECODE_FLOOR / LLAMAGO_ATTN_PREFILL_FLOOR, plus
# LLAMAGO_ATTN_KV_BYTES / LLAMAGO_ATTN_SCORE_BYTES for tile budgets.
_GB = 1024 * 1024 * 1024
_MIN_DECODE_TRAFFIC = int(_os.environ.get(
    "LLAMAGO_ATTN_DECODE_FLOOR", 0))
_MIN_PREFILL_SCORES = int(_os.environ.get(
    "LLAMAGO_ATTN_PREFILL_FLOOR", 1024 * _GB))


def _tiles(t: int, g: int, kv: int, s: int, hd: int, itemsize: int):
    """(kh heads per program, q-tile) under the VMEM budgets."""
    kh = kv
    while kh > 1 and (kv % kh or 2 * kh * s * hd * itemsize > _KV_BYTES_MAX):
        kh -= 1
    if 2 * kh * s * hd * itemsize > _KV_BYTES_MAX:
        return None, None
    max_rows = max(8, _SCORE_BYTES_MAX // (4 * s * kh))
    tb = min(t, max(1, max_rows // g))
    while tb > 1 and t % tb:
        tb //= 2
    if t % tb:
        return None, None
    return kh, tb


def can_fuse_attention(q: jnp.ndarray, k_cache: jnp.ndarray) -> bool:
    """True if the fused kernel handles this (q, cache) geometry on the
    current device view. Refuses under an active mesh — there the kernel
    runs per-shard inside shard_map (parallel/tp_kernels.py), which calls
    `can_fuse_attention_local` on the shard-local shapes instead."""
    if _k.ACTIVE_MESH is not None:
        return False
    return can_fuse_attention_local(q, k_cache)


def can_fuse_attention_local(q: jnp.ndarray, k_cache: jnp.ndarray) -> bool:
    if _k.DISABLE_FUSED:
        return False
    if not (_k._on_tpu() or _k.FORCE_INTERPRET):
        return False
    b, t, h, hd = q.shape
    kv, s = k_cache.shape[1], k_cache.shape[2]
    g = h // kv
    if _k._on_tpu() and (hd % 128 != 0 or s % 8 != 0):
        return False
    if _k._on_tpu() and not _k.FORCE_INTERPRET:
        # Decode-shaped calls (t <= 32: single-token decode and
        # speculative verify windows) gate on cache traffic; prefill
        # (t > 32) gates on score bytes. The floors are separate
        # because the measured balance differs (see derivation above):
        # the kernel wins every decode shape but loses some prefills.
        cache_traffic = 2 * b * kv * s * hd * k_cache.dtype.itemsize
        score_bytes = 4 * b * kv * g * t * s
        if t <= 32:
            if cache_traffic < _MIN_DECODE_TRAFFIC:
                return False
        elif score_bytes < _MIN_PREFILL_SCORES:
            return False
    if _LENAWARE and t <= 32:
        kh, sb = _decode_tiles(t, g, kv, s, hd, k_cache.dtype.itemsize)
        if kh is not None:
            return True
    kh, tb = _tiles(t, g, kv, s, hd, k_cache.dtype.itemsize)
    return kh is not None


def can_fuse_attention_quant(q: jnp.ndarray, k_cache: jnp.ndarray) -> bool:
    """Fused-kernel applicability for the int8-quantized cache: only the
    length-aware decode kernel has a scale-folding variant, so decode
    windows (t <= 32) fuse; prefill takes the scale-folded jnp math in
    attention_math (scales fold into the score einsum — the cache is
    never element-wise dequantized in HBM)."""
    if _k.ACTIVE_MESH is not None:
        return False
    return can_fuse_attention_quant_local(q, k_cache)


def can_fuse_attention_quant_local(q: jnp.ndarray, k_cache: jnp.ndarray) -> bool:
    """Shape-only check — used by the shard_map TP wrapper, where
    per-shard pallas_calls are legal under an active mesh."""
    if _k.DISABLE_FUSED:
        return False
    if not (_k._on_tpu() or _k.FORCE_INTERPRET):
        return False
    b, t, h, hd = q.shape
    kv, s = k_cache.shape[1], k_cache.shape[2]
    g = h // kv
    if _k._on_tpu() and (hd % 128 != 0 or s % 8 != 0):
        return False
    if not _LENAWARE or t > 32:
        return False
    kh, sb = _quant_decode_tiles(t, g, kv, s, hd)
    return kh is not None


# Effective per-element VMEM bytes of the int8 WIDENING kernel's K/V
# blocks: the int8 block itself (1) PLUS the bf16 widened copy it
# materializes (2) — budgeting with itemsize=1 let geometries pass the
# _KV_BYTES_MAX gate and then exhaust VMEM at compile time (~3x the
# budgeted bytes once the f32 scale blocks are counted too). The i8dot
# kernel never widens, so its effective itemsize is 1 and it runs a
# 3x larger budget: on v5e 7B b=8 that lifts kh 8 -> 32, cutting the
# grid from 128 to 32 programs — the per-program overhead was the
# attention residual (measured 603.9 -> 658.6 tok/s, 12.15 ms/step,
# 89.6% of the same-run read-BW ceiling).
_QUANT_EFF_ITEMSIZE = 3
_KV_BYTES_MAX_I8 = int(_os.environ.get(
    "LLAMAGO_ATTN_KV_BYTES_I8", 6 * 1024 * 1024))


def _quant_decode_tiles(t: int, g: int, kv: int, s: int, hd: int):
    """Tile choice for the quantized decode kernels — budget matches the
    active variant's real VMEM footprint (see note above)."""
    if _I8DOT:
        return _decode_tiles(t, g, kv, s, hd, 1,
                             kv_bytes_max=_KV_BYTES_MAX_I8)
    return _decode_tiles(t, g, kv, s, hd, _QUANT_EFF_ITEMSIZE)


# Length-aware decode kernel (t <= 32): the whole-S kernel above this
# one reads the FULL padded cache every step — at b=8, S=1024, 7B
# geometry that is 4.3 GB/step even when positions are near zero. This
# variant tiles S into `sb`-row blocks, accumulates an online softmax
# across blocks, and CLAMPS the K/V block index to the last valid block
# (scalar-prefetched positions): Pallas only issues a copy when the
# block index changes between consecutive grid steps, so every
# out-of-range block is a no-DMA no-compute (`pl.when`) skip. Cache
# traffic becomes proportional to the actual context fill, not S.
_LENAWARE = _os.environ.get("LLAMAGO_ATTN_LENAWARE", "1") == "1"
_SB = int(_os.environ.get("LLAMAGO_ATTN_SB", "256"))
_MASK = -1e9  # finite: -inf - -inf = nan would poison the online stats


def _decode_tiles(t: int, g: int, kv: int, s: int, hd: int, itemsize: int,
                  kv_bytes_max: int | None = None):
    """(kh heads per program, S-block rows) for the length-aware kernel."""
    budget = kv_bytes_max if kv_bytes_max is not None else _KV_BYTES_MAX
    sb = _SB
    while sb > 8 and s % sb:
        sb //= 2
    if s % sb or t > 32:
        return None, None
    kh = kv
    while kh > 1 and (kv % kh or 2 * kh * sb * hd * itemsize > budget):
        kh -= 1
    if 2 * kh * sb * hd * itemsize > budget:
        return None, None
    if 4 * kh * t * g * sb > _SCORE_BYTES_MAX:
        return None, None
    return kh, sb


def _attn_decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                        acc_ref, m_ref, l_ref, *,
                        scale, g, kh, sb, n_sb, hd, t):
    """One (b, kb, si) grid step: online-softmax block accumulation.

    pos_ref [B] scalar-prefetch — absolute position of q row t=0
    q_ref  (1, t, kh, g, hd) VMEM — resident across si (index map
                                    ignores si)
    k_ref  (1, kh, sb, hd) VMEM — S-block of cached K (index clamped to
                                  the last valid block)
    v_ref  (1, kh, sb, hd) VMEM — same for V
    o_ref  (1, t, kh, g, hd) VMEM — written at the final si step
    acc/m/l — f32 VMEM scratch carrying the online softmax state
    """
    bi = pl.program_id(0)
    si = pl.program_id(2)
    pos0 = pos_ref[bi]
    last_blk = jnp.minimum((pos0 + t - 1) // sb, n_sb - 1)
    rows = t * g

    @pl.when(si == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _MASK)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(si <= last_blk)
    def _compute():
        q = q_ref[0].transpose(1, 0, 2, 3).reshape(kh, rows, hd)
        k = k_ref[0]  # [kh, sb, hd]
        v = v_ref[0]
        s_blk = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [kh, rows, sb]

        qpos = (pos0
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 1) // g)
        spos = (si * sb
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 2))
        s_blk = jnp.where(spos <= qpos, s_blk, _MASK)

        m_prev = m_ref[:, :, :1]  # [kh, rows, 1] (lanes replicated)
        m_new = jnp.maximum(m_prev, jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # [kh, rows, 1]
        p = jnp.exp(s_blk - m_new)  # [kh, rows, sb]
        l_ref[...] = (l_ref[...] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [kh, rows, hd]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(si == n_sb - 1)
    def _finalize():
        out = acc_ref[...] / l_ref[:, :, :1]
        o_ref[0] = (
            out.reshape(kh, t, g, hd).transpose(1, 0, 2, 3).astype(o_ref.dtype)
        )


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_lenaware(q5, k_cache, v_cache, pos0, scale):
    b, t, kv, g, hd = q5.shape
    s = k_cache.shape[2]
    kh, sb = _decode_tiles(t, g, kv, s, hd, k_cache.dtype.itemsize)
    n_sb = s // sb

    def kv_index(bi, ki, si, pos_ref):
        last = jnp.minimum((pos_ref[bi] + t - 1) // sb, n_sb - 1)
        return (bi, ki, jnp.minimum(si, last), 0)

    kv_spec = pl.BlockSpec((1, kh, sb, hd), kv_index,
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec(
        (1, t, kh, g, hd), lambda bi, ki, si, *_: (bi, 0, ki, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rows = t * g
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv // kh, n_sb),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((kh, rows, hd), jnp.float32),
            pltpu.VMEM((kh, rows, 128), jnp.float32),
            pltpu.VMEM((kh, rows, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_decode_kernel, scale=scale, g=g, kh=kh, sb=sb,
            n_sb=n_sb, hd=hd, t=t,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, kv, g, hd), q5.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kv * g * t * s * hd,
            bytes_accessed=(
                2 * b * kv * s * hd * k_cache.dtype.itemsize
                + 2 * b * t * kv * g * hd * q5.dtype.itemsize
            ),
            transcendentals=b * kv * g * t * s,
        ),
        interpret=_k._interpret(),
    )(pos0, q5, k_cache, v_cache)
    return out


def _attn_decode_kernel_quant(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                              o_ref, acc_ref, m_ref, l_ref, *,
                              scale, g, kh, sb, n_sb, hd, t):
    """Length-aware decode kernel over an INT8 cache (runtime/kv_cache.py).

    Identical online-softmax structure to _attn_decode_kernel; the cache
    blocks arrive int8 (half the DMA bytes of bf16) plus one f32 scale
    per (head, position) row. The scales are folded per score COLUMN —
        q . (k_q * s_k) == (q . k_q) * s_k,   p . (v_q * s_v) == (p*s_v) . v_q
    — so dequant costs one VPU widen per cache element plus O(sb) muls,
    instead of an O(sb*hd) element-wise dequant pass."""
    bi = pl.program_id(0)
    si = pl.program_id(2)
    pos0 = pos_ref[bi]
    last_blk = jnp.minimum((pos0 + t - 1) // sb, n_sb - 1)
    rows = t * g

    @pl.when(si == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _MASK)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(si <= last_blk)
    def _compute():
        q = q_ref[0].transpose(1, 0, 2, 3).reshape(kh, rows, hd)
        k = k_ref[0].astype(jnp.bfloat16)  # int8 -> bf16: exact to +-127
        sk = ks_ref[0].astype(jnp.float32)  # [kh, sb]
        s_blk = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [kh, rows, sb]
        s_blk = s_blk * sk[:, None, :]

        qpos = (pos0
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 1) // g)
        spos = (si * sb
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 2))
        s_blk = jnp.where(spos <= qpos, s_blk, _MASK)

        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_blk - m_new)
        l_ref[...] = (l_ref[...] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
        sv = vs_ref[0].astype(jnp.float32)  # [kh, sb]
        v = v_ref[0].astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            (p * sv[:, None, :]).astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(si == n_sb - 1)
    def _finalize():
        out = acc_ref[...] / l_ref[:, :, :1]
        o_ref[0] = (
            out.reshape(kh, t, g, hd).transpose(1, 0, 2, 3).astype(o_ref.dtype)
        )


def _attn_decode_kernel_quant_i8dot(pos_ref, q_ref, k_ref, v_ref, ks_ref,
                                    vs_ref, o_ref, acc_ref, m_ref, l_ref, *,
                                    scale, g, kh, sb, n_sb, hd, t):
    """int8-MXU variant of _attn_decode_kernel_quant (r5).

    The widening variant above is VPU-bound, not DMA-bound: at 7B b=8
    ctx1024 the cache stream is ~1.4G int8 elements/step and each pays
    an int8->bf16 widen (~585G elem/s), so attention measured 2.5 ms
    against a 1.9 ms DMA floor (r5 elimination probes). Here the cache
    NEVER touches the VPU:

      scores: q is quantized per (head, row) once per program (rows =
        t*g elements, trivial), then int8 x int8 MXU dots accumulate
        int32 — exact given the quantized operands; the k row scales,
        q row scales, and 1/sqrt(hd) fold into the f32 score.
      pv:     p*sv (the scale-folded probabilities) are quantized to
        int8 per row against their own max, int8 x int8 dot, row scale
        folded back on the output.

    Added error vs the widening kernel: int8 rounding of q (<=0.4%
    relative on scores) and of p*sv (<=0.4% on the output mix) — gated
    by the kv_int8 quality-gate row next to the cache quantization
    itself. LLAMAGO_ATTN_I8DOT=0 restores the widening kernel."""
    bi = pl.program_id(0)
    si = pl.program_id(2)
    pos0 = pos_ref[bi]
    last_blk = jnp.minimum((pos0 + t - 1) // sb, n_sb - 1)
    rows = t * g

    @pl.when(si == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _MASK)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(si <= last_blk)
    def _compute():
        q = (q_ref[0].transpose(1, 0, 2, 3).reshape(kh, rows, hd)
             .astype(jnp.float32))
        qa = jnp.max(jnp.abs(q), axis=-1)                   # [kh, rows]
        sq = jnp.where(qa > 0, qa / 127.0, 1.0)
        q8 = jnp.clip(jnp.round(q / sq[..., None]), -127, 127
                      ).astype(jnp.int8)
        sk = ks_ref[0].astype(jnp.float32)                  # [kh, sb]
        s_blk = jax.lax.dot_general(
            q8, k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (scale * sq)[..., None]     # [kh, rows, sb]
        s_blk = s_blk * sk[:, None, :]

        qpos = (pos0
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 1) // g)
        spos = (si * sb
                + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, sb), 2))
        s_blk = jnp.where(spos <= qpos, s_blk, _MASK)

        m_prev = m_ref[:, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s_blk - m_new)
        l_ref[...] = (l_ref[...] * alpha
                      + jnp.sum(p, axis=-1, keepdims=True))
        sv = vs_ref[0].astype(jnp.float32)                  # [kh, sb]
        psv = p * sv[:, None, :]                            # [kh, rows, sb]
        pa = jnp.max(psv, axis=-1)  # psv >= 0 (exp * positive scale)
        sp = jnp.where(pa > 0, pa / 127.0, 1.0)
        p8 = jnp.clip(jnp.round(psv / sp[..., None]), -127, 127
                      ).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p8, v_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sp[..., None]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(si == n_sb - 1)
    def _finalize():
        out = acc_ref[...] / l_ref[:, :, :1]
        o_ref[0] = (
            out.reshape(kh, t, g, hd).transpose(1, 0, 2, 3).astype(o_ref.dtype)
        )


# int8-MXU decode attention over the int8 cache (see kernel docstring);
# default ON once gated — LLAMAGO_ATTN_I8DOT=0 reverts to the widening
# kernel for A/B.
_I8DOT = _os.environ.get("LLAMAGO_ATTN_I8DOT", "1") == "1"


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_lenaware_quant(q5, k_cache, v_cache, k_scale, v_scale,
                                    pos0, scale):
    b, t, kv, g, hd = q5.shape
    s = k_cache.shape[2]
    # must agree with can_fuse_attention_quant_local's budget (variant-
    # dependent: widened copy vs raw int8 — see _quant_decode_tiles)
    kh, sb = _quant_decode_tiles(t, g, kv, s, hd)
    n_sb = s // sb

    def kv_index(bi, ki, si, pos_ref):
        last = jnp.minimum((pos_ref[bi] + t - 1) // sb, n_sb - 1)
        return (bi, ki, jnp.minimum(si, last), 0)

    def sc_index(bi, ki, si, pos_ref):
        last = jnp.minimum((pos_ref[bi] + t - 1) // sb, n_sb - 1)
        return (bi, ki, jnp.minimum(si, last))

    kv_spec = pl.BlockSpec((1, kh, sb, hd), kv_index,
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, kh, sb), sc_index, memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec(
        (1, t, kh, g, hd), lambda bi, ki, si, *_: (bi, 0, ki, 0, 0),
        memory_space=pltpu.VMEM,
    )
    rows = t * g
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv // kh, n_sb),
        in_specs=[q_spec, kv_spec, kv_spec, sc_spec, sc_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((kh, rows, hd), jnp.float32),
            pltpu.VMEM((kh, rows, 128), jnp.float32),
            pltpu.VMEM((kh, rows, 128), jnp.float32),
        ],
    )
    kern = _attn_decode_kernel_quant_i8dot if _I8DOT \
        else _attn_decode_kernel_quant
    out = pl.pallas_call(
        functools.partial(
            kern, scale=scale, g=g, kh=kh, sb=sb,
            n_sb=n_sb, hd=hd, t=t,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, kv, g, hd), q5.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kv * g * t * s * hd,
            bytes_accessed=(
                2 * b * kv * s * hd * k_cache.dtype.itemsize
                + 2 * b * kv * s * 4
                + 2 * b * t * kv * g * hd * q5.dtype.itemsize
            ),
            transcendentals=b * kv * g * t * s,
        ),
        interpret=_k._interpret(),
    )(pos0, q5, k_cache, v_cache, k_scale, v_scale)
    return out


def flash_attention_quant(
    q: jnp.ndarray,  # [B, T, H, hd] (roped)
    k_cache: jnp.ndarray,  # [B, KV, S, hd] int8
    v_cache: jnp.ndarray,  # [B, KV, S, hd] int8
    positions: jnp.ndarray,  # [B, T]
    k_scale: jnp.ndarray,  # [B, KV, S] f32
    v_scale: jnp.ndarray,  # [B, KV, S] f32
) -> jnp.ndarray:
    """Fused decode attention over the int8 cache. Inference-only (the
    quantized cache is never used in training — round() has no useful
    gradient); gate with can_fuse_attention_quant."""
    b, t, h, hd = q.shape
    kv = k_cache.shape[1]
    g = h // kv
    q5 = q.reshape(b, t, kv, g, hd)
    pos0 = positions[:, 0].astype(jnp.int32)
    scale = 1.0 / (hd**0.5)
    out = _flash_attention_lenaware_quant(
        q5, k_cache, v_cache, k_scale, v_scale, pos0, scale)
    return out.reshape(b, t, h * hd)


def _attn_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale, g, tb, kh, s, hd):
    """One (b, kb, ti) grid step: masked softmax(q K^T) V for kh heads.

    pos_ref [B] scalar-prefetch — write_pos per batch: absolute position
                                  of q row t=0
    q_ref  (1, tb, kh, g, hd) VMEM — roped queries for this tile
    k_ref  (1, kh, s, hd) VMEM — cached K planes for kh heads (resident
                                  across ti steps: index map ignores ti)
    v_ref  (1, kh, s, hd) VMEM — same for V
    o_ref  (1, tb, kh, g, hd) VMEM
    """
    bi = pl.program_id(0)
    ti = pl.program_id(2)
    pos0 = pos_ref[bi]

    rows = tb * g
    q = q_ref[0].transpose(1, 0, 2, 3).reshape(kh, rows, hd)
    k = k_ref[0]  # [kh, s, hd]
    v = v_ref[0]

    # scores [kh, rows, s]: batched over heads, f32 accumulation on MXU.
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    scores = scores * scale

    # causal mask: row r is query position pos0 + ti*tb + r//g.
    qpos = (
        pos0
        + ti * tb
        + jax.lax.broadcasted_iota(jnp.int32, (kh, rows, s), 1) // g
    )
    spos = jax.lax.broadcasted_iota(jnp.int32, (kh, rows, s), 2)
    scores = jnp.where(spos <= qpos, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0] = (
        out.reshape(kh, tb, g, hd).transpose(1, 0, 2, 3).astype(o_ref.dtype)
    )


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention(q5, k_cache, v_cache, pos0, scale):
    b, t, kv, g, hd = q5.shape
    s = k_cache.shape[2]
    kh, tb = _tiles(t, g, kv, s, hd, k_cache.dtype.itemsize)

    # positions ride scalar prefetch: available before the body runs and
    # indexable by batch program id (a plain SMEM BlockSpec cannot block
    # over the batch dim).
    kv_spec = pl.BlockSpec(
        (1, kh, s, hd), lambda bi, ki, ti, *_: (bi, ki, 0, 0),
        memory_space=pltpu.VMEM,
    )
    q_spec = pl.BlockSpec(
        (1, tb, kh, g, hd),
        lambda bi, ki, ti, *_: (bi, ti, ki, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, kv // kh, t // tb),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, g=g, tb=tb, kh=kh, s=s, hd=hd
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, kv, g, hd), q5.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * kv * g * t * s * hd,
            bytes_accessed=(
                2 * b * kv * s * hd * k_cache.dtype.itemsize
                + 2 * b * t * kv * g * hd * q5.dtype.itemsize
            ),
            transcendentals=b * kv * g * t * s,
        ),
        interpret=_k._interpret(),
    )(pos0, q5, k_cache, v_cache)
    return out


def attention_math(
    q: jnp.ndarray,  # [B, T, H, hd] (roped)
    k_cache: jnp.ndarray,  # [B, KV, S, hd] (roped; int8 when k_scale given)
    v_cache: jnp.ndarray,  # [B, KV, S, hd]
    positions: jnp.ndarray,  # [B, T] absolute query positions
    k_scale: jnp.ndarray | None = None,  # [B, KV, S] int8-cache row scales
    v_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """jnp attention math (reference: llama.go:300-336). Head counts
    derive from the operand shapes so the same code serves global (GSPMD)
    and shard-local views. With k_scale/v_scale (int8 cache), the scales
    fold into the score/prob tensors per cache COLUMN — the int8 planes
    feed the einsum directly and are never dequantized element-wise in
    HBM. Returns [B, T, H*hd] in q.dtype."""
    b, t, h, hd = q.shape
    s = k_cache.shape[2]
    kv = k_cache.shape[1]
    g = h // kv  # GQA group size

    qg = q.reshape(b, t, kv, g, hd)
    scale = 1.0 / (hd**0.5)  # reference: llama.go:303 (1/sqrt(embd/heads))
    acc = jnp.promote_types(q.dtype, jnp.float32)
    # scores: [B, KV, G, T, S]
    scores = jnp.einsum("btkgd,bksd->bkgts", qg,
                        k_cache.astype(q.dtype) if k_scale is not None
                        else k_cache,
                        preferred_element_type=acc)
    scores = scores * scale
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, None, :].astype(acc)

    slot = jnp.arange(s, dtype=jnp.int32)
    allowed = slot[None, None, :] <= positions[:, :, None]  # [B, T, S]
    scores = jnp.where(allowed[:, None, None, :, :], scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, None, :].astype(acc)
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bkgts,bksd->btkgd", probs,
                     v_cache.astype(q.dtype) if v_scale is not None
                     else v_cache,
                     preferred_element_type=acc)
    return out.reshape(b, t, h * hd).astype(q.dtype)


def attention_math_sp(q, k_cache, v_cache, positions, axis: str = "sp",
                      k_scale=None, v_scale=None):
    """Attention over a SEQUENCE-SHARDED cache (called inside shard_map;
    `axis` shards the S dim). Each shard sees S/sp cache rows starting at
    axis_index*S/sp, computes masked partial softmax statistics over its
    rows, and the shards combine with one pmax + two psums — the
    numerically-stable two-pass flash combine:

        out = sum_i exp(m_i - M) V_i  /  sum_i exp(m_i - M) s_i,
        M = max_i m_i

    The combine traffic is per-(batch, head, query): tiny next to the
    cache reads it shards, so long-context attention scales to
    sp * HBM-per-chip of cache. This is the SURVEY §2.3 SP/ring-attention
    stretch in all-gather-free form (stats ride psum, K/V never move)."""
    b, t, h, hd = q.shape
    s_l = k_cache.shape[2]  # local cache rows
    kv = k_cache.shape[1]
    g = h // kv

    offset = jax.lax.axis_index(axis) * s_l
    qg = q.reshape(b, t, kv, g, hd)
    scale = 1.0 / (hd**0.5)
    acc = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum("btkgd,bksd->bkgts", qg,
                        k_cache.astype(q.dtype) if k_scale is not None
                        else k_cache,
                        preferred_element_type=acc)
    scores = scores * scale
    if k_scale is not None:  # int8 cache: fold local shard's row scales
        scores = scores * k_scale[:, :, None, None, :].astype(acc)

    slot = offset + jnp.arange(s_l, dtype=jnp.int32)
    allowed = slot[None, None, :] <= positions[:, :, None]  # [B, T, S_l]
    scores = jnp.where(allowed[:, None, None, :, :], scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)  # [B,KV,G,T,1]; -inf ok
    # global max via all_gather+max rather than pmax: same collective
    # cost at this (tiny) stat size, and it is differentiable — pmax has
    # no autodiff rule, and the training step runs through this path
    m_global = jnp.max(jax.lax.all_gather(m, axis), axis=0)
    # fully-masked shards contribute exp(-inf - M) = 0; M itself is
    # finite because slot 0 (shard 0) is visible to every position >= 0
    p = jnp.exp(scores - jax.lax.stop_gradient(m_global))
    denom = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), axis)
    pv = p
    if v_scale is not None:  # fold V scales into the probabilities
        pv = p * v_scale[:, :, None, None, :].astype(acc)
    num = jax.lax.psum(
        jnp.einsum("bkgts,bksd->bkgtd", pv.astype(acc), v_cache.astype(acc)),
        axis,
    )
    out = num / denom  # [B,KV,G,T,hd]
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(b, t, h * hd).astype(q.dtype)
    )


@jax.custom_vjp
def flash_attention(
    q: jnp.ndarray,  # [B, T, H, hd] (roped)
    k_cache: jnp.ndarray,  # [B, KV, S, hd] (roped)
    v_cache: jnp.ndarray,  # [B, KV, S, hd]
    positions: jnp.ndarray,  # [B, T] absolute query positions
) -> jnp.ndarray:
    """Causal attention of new queries against the full cache buffer.

    Drop-in for attention_math; same semantics (mask slot <= query
    position, f32 softmax), returns [B, T, H*hd] in q.dtype. The VJP
    differentiates `attention_math` (pallas_call has no autodiff rule),
    so training steps can run the fused kernel forward.
    """
    b, t, h, hd = q.shape
    kv = k_cache.shape[1]
    g = h // kv
    q5 = q.reshape(b, t, kv, g, hd)
    pos0 = positions[:, 0].astype(jnp.int32)
    scale = 1.0 / (hd**0.5)  # reference: llama.go:303
    s = k_cache.shape[2]
    if (_LENAWARE and t <= 32
            and _decode_tiles(t, g, kv, s, hd, k_cache.dtype.itemsize)[0]
            is not None):
        out = _flash_attention_lenaware(q5, k_cache, v_cache, pos0, scale)
    else:
        out = _flash_attention(q5, k_cache, v_cache, pos0, scale)
    return out.reshape(b, t, h * hd)


def _flash_fwd(q, k_cache, v_cache, positions):
    return flash_attention(q, k_cache, v_cache, positions), (
        q, k_cache, v_cache, positions)


def _flash_bwd(res, g):
    q, k_cache, v_cache, positions = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_math(q_, k_, v_, positions),
        q, k_cache, v_cache,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


flash_attention.defvjp(_flash_fwd, _flash_bwd)
