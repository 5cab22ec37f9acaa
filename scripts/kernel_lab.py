"""Kernel lab: A/B variants of the fused INT4 dequant-matmul on real TPU.

VERDICT r2 #1: the 70B-int4 tp8-shard kernel streams at ~39% of the HBM
roofline vs the >=90% BASELINE target; the binding constraint is the VPU
dequant rate (~744G elem/s), not DMA. This script measures isolated
variants at the dominant 70B-shard shape (w13: k=8192, n=7168) using the
same chained-scan transport as bench.py's bench_shard70b, so numbers are
comparable. Each variant is a self-contained pallas kernel; winners get
promoted into ops/kernels.py.

Run: python scripts/kernel_lab.py [variant ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32


def _sync(a):
    return np.asarray(a.reshape(-1)[:1])


# --------------------------------------------------------------- variants

def kern_base(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Current production kernel: int32 unpack -> f32, scale mult, f32 dot."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    lo = ((p & 0xF) - 8).astype(jnp.float32)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1)
    w = (q * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def kern_fma(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Fold the -8 offset into an FMA: w = f32(nib)*s + (-8*s).
    One fewer full-width VPU pass than base (no separate subtract)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)            # [blocks, tn]
    b = -8.0 * s                                # [blocks, tn] cheap
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    lo = (p & 0xF).astype(jnp.float32)
    hi = ((p >> 4) & 0xF).astype(jnp.float32)
    nib = jnp.concatenate([lo, hi], axis=1)     # [blocks, QK, tn] 0..15
    w = (nib * s[:, None, :] + b[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def kern_bitcast(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Mantissa-OR trick: 0x4B000000 | nib bitcasts to 8388608+nib, so
    f32 conversion becomes an integer OR. The magic constant MUST be
    subtracted BEFORE scaling: integers below 2^24 subtract exactly in
    f32, while folding it into an FMA bias ((8388608+nib)*s - bias)
    cancels two ~8.4e6*s products and loses ~s absolute error — 7.6%
    rel-err, measured. So: OR, bitcast (free), exact sub, mul."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    lo = jax.lax.bitcast_convert_type((p & 0xF) | magic, jnp.float32) - off
    hi = jax.lax.bitcast_convert_type(((p >> 4) & 0xF) | magic,
                                      jnp.float32) - off
    nib = jnp.concatenate([lo, hi], axis=1)     # exact nib - 8
    w = (nib * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def kern_int8dot(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """Per-block batched int8 MXU dots, scales folded into the OUTPUT.
    x arrives pre-quantized... no — x stays bf16 here; the MXU takes
    mixed bf16 x int8? Unlikely; widen nibbles to bf16 (1 pass) and dot
    per 4-block group of 128 contraction with per-block scale folded by
    pre-scaling x? Not possible. This variant: unpack to int8-valued
    f32 WITHOUT scaling, dot per block group where scale is constant —
    i.e. grid over blocks with QK=32 dots (known latency-bound) — kept
    for reference measurement only."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    lo = (p & 0xF).astype(jnp.bfloat16)
    hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)
    nib = jnp.concatenate([lo, hi], axis=1)  # [blocks, QK, tn]
    x = x_ref[:].astype(jnp.bfloat16)        # [tm, tk]
    xr = x.reshape(tm, blocks, QK).transpose(1, 0, 2)  # [blocks, tm, QK]
    part = jax.lax.dot_general(
        xr, nib, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [blocks, tm, tn]
    xsum = jnp.sum(xr.astype(jnp.float32), axis=2)  # [blocks, tm]
    part = part - 8.0 * xsum[:, :, None]
    acc = jnp.sum(part * s[:, None, :], axis=0)
    o_ref[:] += acc


def kern_bf16dot(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Like fma but converts to bf16 for the dot (MXU bf16 rate) —
    tests whether the f32-dot claim still holds at these shapes."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    b = -8.0 * s
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    lo = (p & 0xF).astype(jnp.float32)
    hi = ((p >> 4) & 0xF).astype(jnp.float32)
    nib = jnp.concatenate([lo, hi], axis=1)
    w = (nib * s[:, None, :] + b[:, None, :]).reshape(tk, tn).astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)


def kern_split_u8_h(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """split_h but mask/shift on the RAW uint8 lanes (4 elems/word
    denser than the i32-widened chain) — tests whether Mosaic runs
    narrow-int vector ops at packed rate or silently widens to i32."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    b = -8.0 * s
    p = q_ref[:]                                     # uint8 [tk//2, tn]
    lo8 = (p & jnp.uint8(0xF))
    hi8 = (p >> jnp.uint8(4))
    w_lo = (lo8.astype(jnp.float32).reshape(blocks, half, tn)
            * s[:, None, :] + b[:, None, :]).reshape(blocks * half, tn)
    w_hi = (hi8.astype(jnp.float32).reshape(blocks, half, tn)
            * s[:, None, :] + b[:, None, :]).reshape(blocks * half, tn)
    o_ref[:] += (jnp.dot(x_lo_ref[:].astype(jnp.float32), w_lo,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi_ref[:].astype(jnp.float32), w_hi,
                           preferred_element_type=jnp.float32))


def kern_split_bf16_h(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """split_h with the scale FMA in bf16 (16-bit lanes, 2 elems/word):
    nibbles convert i32->bf16, scales/bias pre-cast, bf16 dots."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.bfloat16)
    b = (-8.0 * s_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    lo = (p & 0xF).astype(jnp.bfloat16)
    hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)
    w_lo = (lo * s[:, None, :] + b[:, None, :]).reshape(blocks * half, tn)
    w_hi = (hi * s[:, None, :] + b[:, None, :]).reshape(blocks * half, tn)
    o_ref[:] += (jnp.dot(x_lo_ref[:].astype(jnp.bfloat16), w_lo,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi_ref[:].astype(jnp.bfloat16), w_hi,
                           preferred_element_type=jnp.float32))


def kern_w16dot(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Raw bf16 weights straight from HBM, ZERO decode — isolates the
    (DMA + MXU dot) cost shared by every variant. If this matches the
    full dequant kernels' elem rate, the dot (not the VPU decode chain)
    is the binding constraint at these shapes."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += (jnp.dot(x_ref[:].astype(jnp.bfloat16), q_ref[:],
                         preferred_element_type=jnp.float32)
                 + 0.0 * s_ref[0:1, :].astype(jnp.float32))


def kern_decode_only(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Unpack+scale WITHOUT the matmul — measures the pure VPU decode
    ceiling of the current unpack chain (reduces w to keep it live)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    lo = ((p & 0xF) - 8).astype(jnp.float32)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.float32)
    q = jnp.concatenate([lo, hi], axis=1)
    w = (q * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += (jnp.sum(w, axis=0, keepdims=True)
                 + 0.0 * jnp.sum(x_ref[:].astype(jnp.float32)))


def kern_dma_only(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Touch the bytes with minimal VPU work — DMA ceiling for this
    layout (int32 view sum)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = q_ref[:].astype(jnp.int32)
    o_ref[:] += (jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
                 + 0.0 * s_ref[0:1, :] + 0.0 * jnp.sum(x_ref[:].astype(jnp.float32)))


def kern_dma_pure(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """TRUE DMA-only probe: the BlockSpec still copies the full [tk/2, tn]
    q block HBM->VMEM every grid step (the pallas pipeline fetches blocks
    regardless of body use), but the body reads only an 8-row corner —
    near-zero VPU work. Separates block-DMA rate from dma_only's
    full-array i32 convert+sum: if this runs at the copy ceiling while
    dma_only pins at ~311 GB/s, the bound is the VPU read of sub-byte
    data, not the DMA engine."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    corner = q_ref[0:8, :].astype(jnp.int32).astype(jnp.float32)  # 8 rows
    o_ref[:] += (jnp.sum(corner, axis=0, keepdims=True)
                 + 0.0 * s_ref[0:1, :] + 0.0 * jnp.sum(x_ref[:].astype(jnp.float32)))


def kern_bitcast_i4(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """In-kernel u8 -> int4 bitcast + hardware int4->f32 convert. The r3
    finding closed the S4 path at the TRANSPORT jit boundary
    (RecursionError passing S4 arrays as jit args); this probe never
    crosses that boundary — weights stay packed u8 in HBM, and the
    reinterpret happens on the VMEM block inside the kernel. If Mosaic
    lowers the int4 convert in hardware, the decode chain collapses to
    convert+FMA. Nibble order is whatever the bitcast gives (a fixed k
    permutation — absorbable by pre-permuting x and scales), so this is
    throughput-only; see skip list in correctness()."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    i4 = pltpu.bitcast(q_ref[:], jnp.int4)              # [tk, tn] int4
    q = i4.astype(jnp.float32).reshape(blocks, QK, tn)
    w = (q * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def kern_bitcast_i4_bf16(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """bitcast_i4 with the convert targeting bf16 and a bf16 dot —
    int4->bf16 may have a cheaper hardware path than int4->f32."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.bfloat16)
    i4 = pltpu.bitcast(q_ref[:], jnp.int4)
    q = i4.astype(jnp.bfloat16).reshape(blocks, QK, tn)
    w = (q * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)


def kern_bitcast_i4_i8dot(xq_ref, sx_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """The full-win candidate: u8 -> int4 bitcast, hardware int4 -> int8
    convert (1 VPU pass), then ONE full-tk int8 MXU dot with both scale
    sets folded on the output (a8full execution format: activation
    scales per (k-tile, row), weight scales constant over tk).
    Weight-side VPU work: a single narrow convert."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    i4 = pltpu.bitcast(q_ref[:], jnp.int4)              # [tk, tn]
    w8 = i4.astype(jnp.int8)
    acc = jax.lax.dot_general(xq_ref[:], w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s0 = s_ref[0].astype(jnp.float32)
    sx = sx_ref[ki].astype(jnp.float32)                 # [tm] (this k-tile)
    o_ref[:] += acc.astype(jnp.float32) * sx[:, None] * s0[None, :]


def kern_bitcast_i4_i4dot(xq_ref, sx_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """bitcast_i4_i8dot WITHOUT the int8 convert: the int4 vector feeds
    the MXU dot directly (int8 x int4 -> int32). If Mosaic lowers mixed
    int4 operands natively this runs at the pure-DMA bound."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    i4 = pltpu.bitcast(q_ref[:], jnp.int4)              # [tk, tn]
    acc = jax.lax.dot_general(xq_ref[:], i4, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    s0 = s_ref[0].astype(jnp.float32)
    sx = sx_ref[ki].astype(jnp.float32)                 # [tm] (this k-tile)
    o_ref[:] += acc.astype(jnp.float32) * sx[:, None] * s0[None, :]


G128 = 128  # scale-group size for the _g128 exec-format variants


def kern_bitcast_i4_i8dot_g128(xq_ref, sx_ref, q_ref, s_ref, o_ref, *,
                               tk, tn, tm):
    """bitcast_i4_i8dot with GROUP-128 scale folding: one hardware
    int4->int8 convert of the whole [tk, tn] block, then tk/128 depth-128
    int8 MXU dots, each folding its own weight-scale row (and activation
    scale) on the output. Keeps quantization grouping at the standard 128
    (vs the fulltk variant's tk-sized groups) at the cost of tk/128
    output-scaling passes over [tm, tn]."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    i4 = pltpu.bitcast(q_ref[:], jnp.int4)              # [tk, tn]
    w8 = i4.astype(jnp.int8)
    groups = tk // G128
    acc = jnp.zeros((tm, tn), jnp.float32)
    for g in range(groups):
        xg = xq_ref[:, g * G128:(g + 1) * G128]         # [tm, 128] int8
        wg = w8[g * G128:(g + 1) * G128, :]             # [128, tn] int8
        d = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = s_ref[g].astype(jnp.float32)               # [tn]
        sxg = sx_ref[ki * groups + g].astype(jnp.float32)  # [tm]
        acc = acc + d.astype(jnp.float32) * sxg[:, None] * sg[None, :]
    o_ref[:] += acc


def kern_bitcast_i4_i8dot_g128_lazy(xq_ref, sx_ref, q_ref, s_ref, o_ref, *,
                                    tk, tn, tm):
    """g128 with the int8 convert done PER GROUP inside the dot loop
    instead of materializing the whole [tk, tn] int8 block — less VMEM
    live at once, possibly better convert/dot interleave."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    i4 = pltpu.bitcast(q_ref[:], jnp.int4)              # [tk, tn]
    groups = tk // G128
    acc = jnp.zeros((tm, tn), jnp.float32)
    for g in range(groups):
        xg = xq_ref[:, g * G128:(g + 1) * G128]
        wg = i4[g * G128:(g + 1) * G128, :].astype(jnp.int8)
        d = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = s_ref[g].astype(jnp.float32)
        sxg = sx_ref[ki * groups + g].astype(jnp.float32)
        acc = acc + d.astype(jnp.float32) * sxg[:, None] * sg[None, :]
    o_ref[:] += acc


def kern_split(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """No-concat variant: the lo/hi nibble planes are each CONTIGUOUS in
    the packed layout ([blocks,16,tn] rows), so instead of concatenating
    them into one [tk,tn] weight tile (a full-width data-movement pass),
    run TWO accumulating dots against the matching x halves. x is tiny
    (tm x tk) so its gather is ~free; the weight-side concat pass
    disappears."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)            # [blocks, tn]
    b = -8.0 * s
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    w_lo = ((p & 0xF).astype(jnp.float32) * s[:, None, :]
            + b[:, None, :]).reshape(blocks * half, tn)
    w_hi = (((p >> 4) & 0xF).astype(jnp.float32) * s[:, None, :]
            + b[:, None, :]).reshape(blocks * half, tn)
    x = x_ref[:].astype(jnp.float32).reshape(tm, blocks, QK)
    x_lo = x[:, :, :half].reshape(tm, blocks * half)
    x_hi = x[:, :, half:].reshape(tm, blocks * half)
    o_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))


def kern_split_bitcast(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """split + mantissa-OR: per nibble the decode chain is one mask, one
    OR, one bitcast (free), one FMA — no convert instruction, no concat
    pass. Candidate minimum VPU work without changing the file format."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)  # exact sub BEFORE scaling (see kern_bitcast)
    f_lo = jax.lax.bitcast_convert_type((p & 0xF) | magic, jnp.float32) - off
    f_hi = jax.lax.bitcast_convert_type(((p >> 4) & 0xF) | magic,
                                        jnp.float32) - off
    w_lo = (f_lo * s[:, None, :]).reshape(blocks * half, tn)
    w_hi = (f_hi * s[:, None, :]).reshape(blocks * half, tn)
    x = x_ref[:].astype(jnp.float32).reshape(tm, blocks, QK)
    x_lo = x[:, :, :half].reshape(tm, blocks * half)
    x_hi = x[:, :, half:].reshape(tm, blocks * half)
    o_ref[:] += (jnp.dot(x_lo, w_lo, preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi, w_hi, preferred_element_type=jnp.float32))


def kern_decode_bitcast(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Pure-decode ceiling of the bitcast chain (no matmul, no concat) —
    if THIS is ~DMA rate, the remaining gap is MXU/layout, not decode."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    bias = (-(8388608.0 + 8.0)) * s
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    magic = jnp.int32(0x4B000000)
    f_lo = jax.lax.bitcast_convert_type((p & 0xF) | magic, jnp.float32)
    f_hi = jax.lax.bitcast_convert_type(((p >> 4) & 0xF) | magic, jnp.float32)
    w = (f_lo * s[:, None, :] + bias[:, None, :]
         + f_hi * s[:, None, :] + bias[:, None, :])
    o_ref[:] += (jnp.sum(w, axis=(0, 1))[None, :]
                 + 0.0 * jnp.sum(x_ref[:].astype(jnp.float32)))


def kern_w4a8(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """True integer MXU dots (VERDICT r3 attack (a)): quantize x per
    (row, 32-block) to int8 IN-KERNEL (tiny: tm*tk elements), unpack
    weights to centered int8, then batched int8 x int8 dot_general with
    int32 accumulation — per-block scales fold on the OUTPUT
    ([blocks,tm,tn] * sx * s, ~3*tm/QK VPU ops/elem). Removes the f32
    widen+scale passes from the weight chain entirely; tests whether
    Mosaic lowers int8 MXU dots at these shapes."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)                    # [blocks, tn]
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    lo = ((p & 0xF) - 8).astype(jnp.int8)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=1)               # [blocks, QK, tn] int8
    x = x_ref[:].astype(jnp.float32).reshape(tm, blocks, QK)
    amax = jnp.max(jnp.abs(x), axis=2)                  # [tm, blocks]
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / sx[:, :, None]), -127, 127).astype(jnp.int8)
    xb = xq.transpose(1, 0, 2)                          # [blocks, tm, QK]
    acc = jax.lax.dot_general(xb, w, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    out = jnp.sum(acc.astype(jnp.float32)
                  * sx.T[:, :, None] * s[:, None, :], axis=0)
    o_ref[:] += out


def kern_w4a8_raw(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """w4a8 with the minimum weight chain: RAW nibbles (0..15, no -8 sub,
    no concat — split lo/hi planes feed separate batched dots) and the
    -8 offset corrected on the output via per-block x sums:
    dot(xq, nib) - 8*sum(xq). Weight-side VPU work is just the masks."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    nib_lo = (p & 0xF).astype(jnp.int8)                 # [blocks, half, tn]
    nib_hi = ((p >> 4) & 0xF).astype(jnp.int8)
    x = x_ref[:].astype(jnp.float32).reshape(tm, blocks, QK)
    amax = jnp.max(jnp.abs(x), axis=2)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / sx[:, :, None]), -127, 127).astype(jnp.int8)
    xb = xq.transpose(1, 0, 2)                          # [blocks, tm, QK]
    x_lo, x_hi = xb[:, :, :half], xb[:, :, half:]
    acc = (jax.lax.dot_general(x_lo, nib_lo, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(x_hi, nib_hi, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.int32))
    xsum = jnp.sum(xb.astype(jnp.int32), axis=2)        # [blocks, tm]
    acc = acc - 8 * xsum[:, :, None]
    out = jnp.sum(acc.astype(jnp.float32)
                  * sx.T[:, :, None] * s[:, None, :], axis=0)
    o_ref[:] += out


def kern_base8(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Current production INT8 path: int8 -> f32 convert, scale mult,
    f32 dot (ops/kernels.py:_dequant_mm_kernel bits=8). Lab baseline for
    the w8a8 comparison."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    q = q_ref[:].astype(jnp.float32).reshape(blocks, QK, tn)
    w = (q * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def kern_w8a8(x_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """ZERO weight-side VPU work: int8 weights go STRAIGHT to batched
    int8 x int8 MXU dots (int32 accumulate); x quantizes in-kernel per
    (row, block) and the two scale sets fold on the [blocks, tm, tn]
    output. If Mosaic lowers the int dots at rate, this is DMA-bound —
    the ceiling the f32-convert path can't reach."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)                    # [blocks, tn]
    w = q_ref[:].reshape(blocks, QK, tn)                # int8, untouched
    x = x_ref[:].astype(jnp.float32).reshape(tm, blocks, QK)
    amax = jnp.max(jnp.abs(x), axis=2)
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq = jnp.clip(jnp.round(x / sx[:, :, None]), -127, 127).astype(jnp.int8)
    xb = xq.transpose(1, 0, 2)                          # [blocks, tm, QK]
    acc = jax.lax.dot_general(xb, w, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    out = jnp.sum(acc.astype(jnp.float32)
                  * sx.T[:, :, None] * s[:, None, :], axis=0)
    o_ref[:] += out


def kern_w8a8_fulltk(xq_ref, sx_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """FULL-tk int8 MXU dot (VERDICT r4 #3): ONE [tm,tk]x[tk,tn] int8
    dot per grid step — no per-QK batched dots (those were latency-bound
    in r3's w8a8). Requires scales constant over the tk span, i.e. an
    execution format requantized to tk-sized blocks; the lab folds the
    first QK-row of s on the output as a stand-in (throughput
    measurement only — the chain's tanh bounds any numeric drift).
    Weight bytes go DMA -> MXU with ZERO VPU passes."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    acc = jax.lax.dot_general(
        xq_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # [tm, tn] int8 MXU
    s0 = s_ref[0].astype(jnp.float32)                   # [tn]
    sx = sx_ref[ki].astype(jnp.float32)                 # [tm] (this k-tile)
    o_ref[:] += acc.astype(jnp.float32) * sx[:, None] * s0[None, :]


def kern_w4a8_split_fulltk(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, *,
                           tk, tn, tm):
    """FULL-contraction W4A8: the packed [tk/2, tn] rows ARE the
    lo-nibble plane of every block stacked (and the hi plane after a
    shift), so with x's halves pre-gathered (hoisted, x is tiny) the
    kernel runs TWO depth-tk/2 int8 MXU dots and never concatenates or
    re-orders weights. Weight-side VPU work: one mask + one int32->int8
    convert per nibble plane (vs ~4-5 passes in the f32 chain). Raw
    nibbles 0..15; the -8 offset folds on the output via x sums."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = q_ref[:].astype(jnp.int32)                      # [tk/2, tn]
    nib_lo = (p & 0xF).astype(jnp.int8)
    nib_hi = ((p >> 4) & 0xF).astype(jnp.int8)
    x_lo = x_lo_ref[:]                                  # [tm, tk/2] int8
    x_hi = x_hi_ref[:]
    acc = (jax.lax.dot_general(x_lo, nib_lo, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(x_hi, nib_hi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32))
    xsum = (jnp.sum(x_lo.astype(jnp.int32), axis=1)
            + jnp.sum(x_hi.astype(jnp.int32), axis=1))  # [tm]
    s0 = s_ref[0].astype(jnp.float32)
    out = (acc - 8 * xsum[:, None]).astype(jnp.float32) * s0[None, :]
    o_ref[:] += out


def kern_split_h(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """split with the x gather HOISTED out of the kernel (Mosaic rejects
    the in-kernel [tm, tk] -> [tm, blocks, QK] lane-split reshape:
    'infer-vector-layout: unsupported shape cast' on real v5e). The two
    nibble-plane x halves arrive as separate [tm, k/2] operands; the
    kernel runs TWO full-contraction 2D dots and never concatenates the
    weight planes. Decode chain per nibble: mask, convert, FMA."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    b = -8.0 * s
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    w_lo = ((p & 0xF).astype(jnp.float32) * s[:, None, :]
            + b[:, None, :]).reshape(blocks * half, tn)
    w_hi = (((p >> 4) & 0xF).astype(jnp.float32) * s[:, None, :]
            + b[:, None, :]).reshape(blocks * half, tn)
    o_ref[:] += (jnp.dot(x_lo_ref[:].astype(jnp.float32), w_lo,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi_ref[:].astype(jnp.float32), w_hi,
                           preferred_element_type=jnp.float32))


def kern_split_bitcast_h(x_lo_ref, x_hi_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """split_h + mantissa-OR decode: mask, OR, bitcast (free), exact sub,
    mul — no convert instruction, no concat, x halves hoisted."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    s = s_ref[:].astype(jnp.float32)
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    f_lo = jax.lax.bitcast_convert_type((p & 0xF) | magic, jnp.float32) - off
    f_hi = jax.lax.bitcast_convert_type(((p >> 4) & 0xF) | magic,
                                        jnp.float32) - off
    w_lo = (f_lo * s[:, None, :]).reshape(blocks * half, tn)
    w_hi = (f_hi * s[:, None, :]).reshape(blocks * half, tn)
    o_ref[:] += (jnp.dot(x_lo_ref[:].astype(jnp.float32), w_lo,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(x_hi_ref[:].astype(jnp.float32), w_hi,
                           preferred_element_type=jnp.float32))


def kern_w8a8_h(xq_ref, q_ref, s_ref, sx_ref, o_ref, *, tk, tn, tm):
    """w8a8 with activation quantization HOISTED: xq arrives pre-shaped
    [blocks, tm, QK] int8 and sx [blocks, tm] f32 (the in-kernel x
    reshape/transpose is what Mosaic rejected). Weight-side VPU work is
    ONE sublane-split reshape; the batched int8 MXU dots accumulate in
    int32 and both scale sets fold on the [blocks, tm, tn] output."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    w3 = q_ref[:].reshape(blocks, QK, tn)               # int8, untouched
    acc = jax.lax.dot_general(xq_ref[:], w3, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    s = s_ref[:].astype(jnp.float32)                    # [blocks, tn]
    sx = sx_ref[:].astype(jnp.float32)                  # [blocks, tm]
    o_ref[:] += jnp.sum(acc.astype(jnp.float32)
                        * sx[:, :, None] * s[:, None, :], axis=0)


def kern_w4a8_h(xq_ref, q_ref, s_ref, sx_ref, o_ref, *, tk, tn, tm):
    """w4a8 with hoisted activation quantization: unpack nibbles to
    centered int8 (mask, sub, narrow ×2, concat), batched int8 MXU dots,
    scales fold on output."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    half = QK // 2
    p = q_ref[:].astype(jnp.int32).reshape(blocks, half, tn)
    lo = ((p & 0xF) - 8).astype(jnp.int8)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.int8)
    w3 = jnp.concatenate([lo, hi], axis=1)              # [blocks, QK, tn]
    acc = jax.lax.dot_general(xq_ref[:], w3, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    s = s_ref[:].astype(jnp.float32)
    sx = sx_ref[:].astype(jnp.float32)
    o_ref[:] += jnp.sum(acc.astype(jnp.float32)
                        * sx[:, :, None] * s[:, None, :], axis=0)


def kern_i4native(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Weights stored as a native jnp.int4 array [k, n] (load-time
    transform; file format unchanged; XLA S4 packs 2/byte in HBM). The
    decode chain collapses to ONE hardware convert + one FMA — no mask,
    no shift, no concat. If Mosaic's int4 load/convert runs at rate,
    this is the minimum-VPU-work decode without MXU int dots."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    w = (q_ref[:].astype(jnp.float32).reshape(blocks, QK, tn)
         * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def jnp_xla_i4(x, lw, chain):
    """XLA-only baseline: int4-dtype weights dequantized in jnp, no
    Pallas — measures what the compiler alone does with S4 weights."""
    q, s = lw["q4"], lw["s"]
    k, n = q.shape
    w = (q.astype(jnp.float32).reshape(k // QK, QK, n)
         * s.astype(jnp.float32)[:, None, :]).reshape(k, n)
    o = jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    return chain(o)


VARIANTS = {
    "base": (kern_base, {}),
    "fma": (kern_fma, {}),
    "bitcast": (kern_bitcast, {}),
    "split": (kern_split, {"needs_tm": True}),
    "split_bitcast": (kern_split_bitcast, {"needs_tm": True}),
    "split_h": (kern_split_h, {"hoist": "split"}),
    "split_u8_h": (kern_split_u8_h, {"hoist": "split"}),
    "split_bf16_h": (kern_split_bf16_h, {"hoist": "split"}),
    "split_bitcast_h": (kern_split_bitcast_h, {"hoist": "split"}),
    "w8a8_h": (kern_w8a8_h, {"hoist": "a8", "needs_tm": True, "fmt": "q8"}),
    "w4a8_h": (kern_w4a8_h, {"hoist": "a8", "needs_tm": True}),
    "int8dot": (kern_int8dot, {"needs_tm": True}),
    "w4a8": (kern_w4a8, {"needs_tm": True}),
    "w4a8_raw": (kern_w4a8_raw, {"needs_tm": True}),
    "i4native": (kern_i4native, {"fmt": "i4"}),
    "xla_i4": (None, {"fmt": "i4", "jnp": jnp_xla_i4}),
    "base8": (kern_base8, {"fmt": "q8"}),
    "w8a8": (kern_w8a8, {"fmt": "q8", "needs_tm": True}),
    "w8a8_fulltk": (kern_w8a8_fulltk,
                    {"fmt": "q8", "needs_tm": True, "hoist": "a8full"}),
    "w4a8_split_fulltk": (kern_w4a8_split_fulltk,
                          {"needs_tm": True, "hoist": "splitfull"}),
    "bf16dot": (kern_bf16dot, {}),
    "w16dot": (kern_w16dot, {"fmt": "w16"}),
    "decode_only": (kern_decode_only, {}),
    "decode_bitcast": (kern_decode_bitcast, {}),
    "dma_only": (kern_dma_only, {}),
    "dma_pure": (kern_dma_pure, {}),
    "bitcast_i4": (kern_bitcast_i4, {}),
    "bitcast_i4_bf16": (kern_bitcast_i4_bf16, {}),
    "bitcast_i4_i8dot": (kern_bitcast_i4_i8dot,
                         {"needs_tm": True, "hoist": "a8full"}),
    "bitcast_i4_i4dot": (kern_bitcast_i4_i4dot,
                         {"needs_tm": True, "hoist": "a8full"}),
    "bitcast_i4_i8dot_g128": (kern_bitcast_i4_i8dot_g128,
                              {"needs_tm": True, "hoist": "a8g128"}),
    "bitcast_i4_i8dot_g128_lazy": (kern_bitcast_i4_i8dot_g128_lazy,
                                   {"needs_tm": True, "hoist": "a8g128"}),
}


def to_i4(qw: dict) -> dict:
    """Repack a Q4_0 leaf {q4 packed [k/2,n], s} into a native jnp.int4
    centered-value array [k, n] (same key names so harness code reads
    uniformly)."""
    from llamago_tpu.ops import quant

    vals = quant.unpack_q4(qw["q4"])  # int8 [k, n], values -8..7
    return {"q4": vals.astype(jnp.int4), "s": qw["s"]}


def _leaf_bytes(leaf) -> float:
    if leaf.dtype == jnp.int4:
        return leaf.size * 0.5  # XLA S4 packs two per byte in HBM
    return leaf.size * leaf.dtype.itemsize


def make_call(kern, opts, k, n, m, tk, tn, fmt):
    """Build (pallas_call, ops_of) for a variant. ops_of(x, lw, qkey)
    returns the full operand list in the kernel's signature order —
    hoisted variants precompute their x-side operands in jnp OUTSIDE
    the kernel (Mosaic rejects the lane-splitting x reshape in-kernel
    on real v5e; x is tiny so the hoist is ~free)."""
    tm = max(8, m)
    hoist = opts.get("hoist")
    kw = dict(tk=tk, tn=tn)
    if opts.get("needs_tm"):
        kw["tm"] = tm
    grid = (n // tn, k // tk)
    q_rows = tk if fmt in ("i4", "q8", "w16") else tk // 2
    qspec = pl.BlockSpec((q_rows, tn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((tk // QK, tn), lambda ni, ki: (ki, ni),
                         memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((tm, tn), lambda ni, ki: (0, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tm * k * n,
            bytes_accessed=k * n // 2 + tm * k * 2 + tm * n * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )
    import os as _labos
    if _labos.environ.get("LAB_DIMSEM"):
        # n-tiles are independent; k accumulates into the same out tile.
        common["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    half = QK // 2
    if hoist == "split":
        xspec = pl.BlockSpec((tm, tk // 2), lambda ni, ki: (0, ki),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xspec, xspec, qspec, sspec], **common)

        def ops_of(x, lw, qkey):
            x3 = x.astype(jnp.bfloat16).reshape(tm, k // QK, QK)
            return [x3[:, :, :half].reshape(tm, k // 2),
                    x3[:, :, half:].reshape(tm, k // 2), lw[qkey], lw["s"]]
    elif hoist == "a8full":
        # full-tk int8 activations: one scale per (k-tile, row) — the
        # execution-format contract (scales constant over the tk span)
        xqspec = pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki),
                              memory_space=pltpu.VMEM)
        # whole sx array per step (tiny); a (1, tm) block violates the
        # >=8-sublane rule when k//tk > 1 — kernels read row ki themselves
        sxspec = pl.BlockSpec((k // tk, tm), lambda ni, ki: (0, 0),
                              memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xqspec, sxspec, qspec, sspec],
                              **common)

        def ops_of(x, lw, qkey):
            x3 = x.astype(jnp.float32).reshape(tm, k // tk, tk)
            x3 = x3.transpose(1, 0, 2)                   # [k//tk, tm, tk]
            amax = jnp.max(jnp.abs(x3), axis=2)          # [k//tk, tm]
            sx = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.clip(jnp.round(x3 / sx[:, :, None]),
                          -127, 127).astype(jnp.int8)
            xq = xq.transpose(1, 0, 2).reshape(tm, k)
            return [xq, sx, lw[qkey], lw["s"]]
    elif hoist == "a8g128":
        # full-tk int8 activations with per-(row, 128-group) scales
        xqspec = pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki),
                              memory_space=pltpu.VMEM)
        sxspec = pl.BlockSpec((k // G128, tm), lambda ni, ki: (0, 0),
                              memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xqspec, sxspec, qspec, sspec],
                              **common)

        def ops_of(x, lw, qkey):
            x3 = x.astype(jnp.float32).reshape(tm, k // G128, G128)
            x3 = x3.transpose(1, 0, 2)                   # [k//G128, tm, G128]
            amax = jnp.max(jnp.abs(x3), axis=2)          # [k//G128, tm]
            sx = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.clip(jnp.round(x3 / sx[:, :, None]),
                          -127, 127).astype(jnp.int8)
            xq = xq.transpose(1, 0, 2).reshape(tm, k)
            return [xq, sx, lw[qkey], lw["s"]]
    elif hoist == "splitfull":
        # nibble-plane x halves, pre-gathered AND pre-quantized: plane
        # rows q[r, n] hold nibbles for k = 2r (lo) and 2r+1... in Q4_0's
        # layout the lo nibbles are each block's first half — gather x
        # accordingly so dot(x_half, plane) contracts full tk/2 depth
        half = QK // 2
        xspec = pl.BlockSpec((tm, tk // 2), lambda ni, ki: (0, ki),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xspec, xspec, qspec, sspec],
                              **common)

        def ops_of(x, lw, qkey):
            x3 = x.astype(jnp.float32).reshape(tm, k // QK, QK)
            # fixed global activation scale (throughput measurement; the
            # production kernel would carry per-(row, k-tile) scales)
            xq3 = jnp.clip(jnp.round(x3 * 127.0), -127, 127).astype(jnp.int8)
            return [xq3[:, :, :half].reshape(tm, k // 2),
                    xq3[:, :, half:].reshape(tm, k // 2),
                    lw[qkey], lw["s"]]
    elif hoist == "a8":
        xqspec = pl.BlockSpec((tk // QK, tm, QK), lambda ni, ki: (ki, 0, 0),
                              memory_space=pltpu.VMEM)
        sxspec = pl.BlockSpec((tk // QK, tm), lambda ni, ki: (ki, 0),
                              memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xqspec, qspec, sspec, sxspec],
                              **common)

        def ops_of(x, lw, qkey):
            x3 = x.astype(jnp.float32).reshape(tm, k // QK, QK)
            x3 = x3.transpose(1, 0, 2)                   # [k//QK, tm, QK]
            amax = jnp.max(jnp.abs(x3), axis=2)          # [k//QK, tm]
            sx = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.clip(jnp.round(x3 / sx[:, :, None]),
                          -127, 127).astype(jnp.int8)
            return [xq, lw[qkey], lw["s"], sx]
    else:
        xspec = pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki),
                             memory_space=pltpu.VMEM)
        call = pl.pallas_call(functools.partial(kern, **kw),
                              in_specs=[xspec, qspec, sspec], **common)

        def ops_of(x, lw, qkey):
            return [x, lw[qkey], lw["s"]]
    return call, ops_of


def run_variant(name, kern, opts, k=8192, n=7168, m=8, layers=24, steps=8,
                tk=None, tn=None, reps=8):
    tk = tk or (1024 if k % 1024 == 0 else 512)
    tn = tn or 1024
    assert k % tk == 0 and n % tn == 0
    key = jax.random.PRNGKey(0)
    from llamago_tpu.ops import quant

    fmt = opts.get("fmt", "q4")
    qkey = {"q8": "q8", "w16": "q16"}.get(fmt, "q4")
    ws = []
    for i in range(layers):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (k, n), jnp.bfloat16) * 0.02
        if fmt == "w16":
            qw = {"q16": w, "s": jnp.ones((k // QK, n), jnp.bfloat16)}
        else:
            qw = quant.quantize(w, 8 if fmt == "q8" else 4)
        ws.append(to_i4(qw) if fmt == "i4" else qw)
    stacked = {p: jnp.stack([w[p] for w in ws]) for p in ws[0]}
    _sync(stacked["s"])
    weight_bytes = sum(_leaf_bytes(l) for l in jax.tree.leaves(stacked))

    tm = max(8, m)
    call = ops_of = None
    if kern is not None:
        call, ops_of = make_call(kern, opts, k, n, m, tk, tn, fmt)

    # Chain [m, n] -> [m, k] WITHOUT a back-projection matmul: a [n, k]
    # bf16 back matrix is ~115 MB of HBM traffic per layer — 3.6x the
    # int4 weight bytes — and drowned the kernel signal (every variant
    # measured ~200 G elem/s until this was removed). Concat/slice +
    # tanh keeps the data dependence with zero extra HBM reads.
    def chain(o):
        o = o.astype(jnp.bfloat16)
        if k <= n:
            nxt = o[:, :k]
        else:
            reps_ = -(-k // n)
            nxt = jnp.concatenate([o] * reps_, axis=1)[:, :k]
        return jnp.tanh(nxt) * 0.5

    @jax.jit
    def sweep(stacked, x):
        def outer(x, _):
            def layer(x, lw):
                if call is None:
                    return opts["jnp"](x, lw, chain), None
                o = call(*ops_of(x, lw, qkey))  # [tm, n]
                return chain(o), None
            x, _ = jax.lax.scan(layer, x, stacked)
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=steps)
        return x

    x0 = jnp.ones((tm, k), jnp.bfloat16)
    x = sweep(stacked, x0)
    _sync(x)
    # Amortize the host<->device sync latency (~40 ms on the tunneled
    # transport) over `reps` back-to-back dispatches + one final sync.
    t0 = time.time()
    for _ in range(reps):
        x = sweep(stacked, x)
    _sync(x)
    dt = (time.time() - t0) / reps
    gbps = weight_bytes * steps / dt / 1e9
    elems = k * n * layers * steps / dt / 1e9
    print(f"{name:>14s}  k={k} n={n} tk={tk} tn={tn} m={m}: "
          f"{gbps:7.1f} GB/s  {elems:7.1f} G elem/s  ({dt:.3f}s/sweep)")
    return gbps


def correctness(name, kern, opts, k=512, n=512, m=8):
    """Check the variant against the jnp dequant path."""
    if name in ("decode_only", "dma_only", "dma_pure", "w16dot",
                # bitcast_i4*: nibble order under pltpu.bitcast is a fixed
                # k-permutation of Q4_0's — throughput probes only until a
                # production layout pre-permutes x/scales to match
                "bitcast_i4", "bitcast_i4_bf16", "bitcast_i4_i8dot",
                "bitcast_i4_i4dot", "bitcast_i4_i8dot_g128",
                "bitcast_i4_i8dot_g128_lazy",
                # fulltk forms fold a stand-in scale (s[0] / fixed global
                # activation scale): execution-format throughput probes,
                # not Q4_0/Q8_0-exact
                "w8a8_fulltk", "w4a8_split_fulltk"):
        return
    from llamago_tpu.ops import quant
    fmt = opts.get("fmt", "q4")
    qkey = {"q8": "q8", "w16": "q16"}.get(fmt, "q4")
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (k, n), jnp.float32)
    qw = quant.quantize(w, 8 if fmt == "q8" else 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, k), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ quant.dequantize(qw, jnp.float32)
    tk, tn = 256, 256
    tm = 8
    if fmt == "i4":
        qw = to_i4(qw)
    if opts.get("jnp"):
        # check only the dequant-dot core (the lab's jnp fn appends the
        # chaining tanh, which saturates at correctness scales)
        w = (qw["q4"].astype(jnp.float32).reshape(k // QK, QK, n)
             * qw["s"].astype(jnp.float32)[:, None, :]).reshape(k, n)
        out = x.astype(jnp.float32) @ w
        tol = 2e-2
    else:
        call, ops_of = make_call(kern, opts, k, n, tm, tk, tn, fmt)
        out = call(*ops_of(x, qw, qkey))
        # a8 variants quantize activations too: widen the tolerance to
        # the activation-quantization error bound
        tol = 5e-2 if "a8" in name else 2e-2
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    status = "OK" if err < tol else "FAIL"
    print(f"{name:>14s}  correctness rel-err {err:.2e} {status}")
    assert err < tol, name


if __name__ == "__main__":
    import os

    names = sys.argv[1:] or list(VARIANTS)
    # shape overrides for tile-sensitivity sweeps (e.g. the w13 22016-wide
    # or lm-head 32000-wide production shapes): LAB_K/LAB_N/LAB_TK/LAB_TN/
    # LAB_M/LAB_LAYERS
    shape = dict(
        k=int(os.environ.get("LAB_K", 8192)),
        n=int(os.environ.get("LAB_N", 7168)),
        m=int(os.environ.get("LAB_M", 8)),
        layers=int(os.environ.get("LAB_LAYERS", 24)),
        steps=int(os.environ.get("LAB_STEPS", 8)),
        reps=int(os.environ.get("LAB_REPS", 8)),
    )
    if os.environ.get("LAB_TK"):
        shape["tk"] = int(os.environ["LAB_TK"])
    if os.environ.get("LAB_TN"):
        shape["tn"] = int(os.environ["LAB_TN"])
    print(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")
    # A variant that interpret-verifies can still be rejected by Mosaic on
    # real hardware (e.g. an unsupported vector shape cast) — keep sweeping.
    bad = set()
    for nm in names:
        kern, opts = VARIANTS[nm]
        try:
            correctness(nm, kern, opts)
        except Exception as e:
            print(f"{nm:>14s}  SKIP (compile/correctness failed: "
                  f"{(str(e).splitlines() or [repr(e)])[0][:100]})")
            bad.add(nm)
    for nm in names:
        if nm in bad:
            continue
        kern, opts = VARIANTS[nm]
        try:
            run_variant(nm, kern, opts, **shape)
        except Exception as e:
            if os.environ.get("LAB_VERBOSE"):
                print(f"{nm:>14s}  SKIP (bench failed):\n{e}")
            else:
                print(f"{nm:>14s}  SKIP (bench failed: "
                      f"{(str(e).splitlines() or [repr(e)])[0][:100]})")
