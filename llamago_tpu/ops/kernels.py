"""Pallas TPU kernels — the hand-optimized hot path.

This layer plays the role of the reference's assembly kernels: where
llama.go's entire native surface is one AVX2/NEON FP32 dot product called
from inside MulMat (reference: pkg/ml/floats_avx.{go,s}, call site
ml.go:2033,2075), the TPU equivalents are fused kernels that keep the
MXU fed straight from HBM:

  * dequant_matmul — INT8/INT4 block-dequantization fused into the
    matmul: weights stream HBM->VMEM as 1 or 0.5 bytes/element and are
    expanded to bf16 in VMEM, so the kernel runs at the weight-bandwidth
    roofline (the BASELINE.md >=90% target). The jnp fallback would
    round-trip a dequantized bf16 copy through HBM — 3x the traffic.

Kernels run under `interpret=True` off-TPU so the same code is unit-
tested on the CPU mesh (tests/test_quant.py, tests/test_attention.py).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32  # quantization block size along the contraction dim

# Flipped by tests to exercise kernels off-TPU; auto-detected otherwise.
FORCE_INTERPRET = False
DISABLE_FUSED = False

# The active GSPMD mesh, set once at startup by the CLI / dryrun before any
# trace. A pallas_call is a single-device program: under a mesh it must run
# per-shard inside jax.shard_map (parallel/tp_kernels.py), never on GSPMD
# global values — so `can_fuse` refuses whenever a mesh is active and the
# shard_map wrapper calls the shape-only check below instead.
ACTIVE_MESH = None


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return FORCE_INTERPRET or not _on_tpu()


def _pick_tile(dim: int, candidates: tuple[int, ...]) -> int | None:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _tile_k(k: int) -> int | None:
    """Contraction tile: lane-aligned, or the full dim (a block equal to
    the whole array dim is always legal for the TPU lowering)."""
    t = _pick_tile(k, (1024, 512, 256, 128))
    if t is None and k % QK == 0:
        t = k
    return t


# Scoped VMEM is 16 MB; leave headroom for Mosaic's own temporaries.
_VMEM_BUDGET = 14 * 1024 * 1024

# Decode-path tile bounds, measured on v5e (scripts/shape_sweep.py):
# rate rises monotonically with tn at fixed tk for EVERY production
# shape, and tk=256 matches or beats larger tk once tn is maxed (the
# whole [tm, n] output is then written exactly once per k-pass).
# tn<=8192 with tk<=512 is the validated compile envelope (the int4
# kernel's f32 dequant tile materializes at tk*tn*4 bytes; 16.8 MB
# compiled, 29.4 MB did not).
_DECODE_TN_CAP = 8192
_DECODE_TK = 256
# A/B escape hatch: set LLAMAGO_DECODE_TILES=0 to force the generic
# VMEM-modeled rungs for decode shapes too.
_DECODE_TILES = _os.environ.get("LLAMAGO_DECODE_TILES", "1") == "1"


def _aligned_divisors_desc(n: int, cap: int = _DECODE_TN_CAP):
    """Lane-aligned (128) divisors of n, largest first, capped."""
    t = min(n, cap)
    t -= t % 128
    while t >= 128:
        if n % t == 0:
            yield t
        t -= 128


def _plan_tiles(m: int, k: int, n: int, bits: int) -> tuple[int, int] | None:
    """Joint (tk, tn) choice under a VMEM model of the kernel's real
    footprint. Larger n-tiles first: a (tk, tn) tile of the row-major
    [K, N] weight reads tn contiguous bytes per row, and DMA efficiency
    rises with burst length (tn=256 profiled ~440 GB/s vs ~600 at tn=512
    on v5e) — but the f32 dequant intermediate (tk*tn*4) plus the x/out
    tiles scale with the tile sizes, and a [512, 4096]x[4096, 12288]
    prefill at tn=2048 measured 16.5 MB of scoped-VMEM stack, past the
    16 MB hardware limit. The model below reproduces that failure and
    clears at tn=1024 for the same shape."""
    tm = max(8, m)
    # tm <= 16, not 32: the tile sweep only covered m=8, and at m=16 the
    # fast path measurably wins (16-token prefill bucket: 86.0 -> 67.7
    # ms). At m=32 repeated A/Bs are indistinguishable from run noise
    # (63-90 ms spread for identical configs), so unswept shapes keep
    # the VMEM-modeled rungs.
    if tm <= 16 and _DECODE_TILES:
        # Decode fast path: full-width tn + small tk, swept on v5e over
        # the 7B/13B/70B-shard production shapes (+5..26% over the
        # generic rungs; int8 w13-shard 363 -> 393 GB/s, int4 attn
        # 144 -> 181 GB/s). tk=256: 512 tied within 1.5% everywhere
        # except one measured 30% regression at the 7B attn shape
        # (tk=512, tn=4096), and any k divisible by 512 is divisible
        # by 256 anyway.
        if k % _DECODE_TK == 0:
            for tn in _aligned_divisors_desc(n):
                return _DECODE_TK, tn
    if tm > 1024:
        # Training/perplexity-sized calls (m = batch*seq): the VMEM
        # model under-counts Mosaic temporaries at these row counts —
        # a [2048,4096]x[4096,4096] int8 call compiled to 16.57 MB of
        # scoped VMEM against a 16 MB limit with an in-model estimate
        # of ~12 MB, while m=1024 compiles and runs (both measured on
        # v5e). Above the measured-safe boundary these compute-bound
        # shapes take the XLA dequant path instead.
        return None
    tk = _tile_k(k)
    if tk is None:
        return None
    # 1280/640 are lane-aligned (128) non-power-of-2 rungs: a 32000-wide
    # lm head is not divisible by any power of two above 256, and tn=256
    # reads only 256 contiguous bytes per weight row (~440 GB/s measured
    # vs ~600 at tn>=512 on v5e) — 1280 divides 32000 and 5x's the burst.
    for tn in (2048, 1280, 1024, 640, 512, 256, 128):
        if n % tn:
            continue
        q_bytes = tk * tn if bits == 8 else tk * tn // 2
        est = (
            tk * tn * 4           # dequantized w tile, f32
            + tm * tk * 4         # x tile (f32 dot path)
            + tm * tn * 4         # f32 output tile
            + 2 * q_bytes         # quantized block, double-buffered
            + 2 * (tk // QK) * tn * 2  # scales, double-buffered
        )
        if est <= _VMEM_BUDGET:
            return tk, tn
    return None


def can_fuse(x: jnp.ndarray, w: dict) -> bool:
    """The fused kernel handles this (x, w) pair on the CURRENT device view
    (single chip, or one shard inside shard_map)."""
    if ACTIVE_MESH is not None:
        return False
    return can_fuse_local(x, w)


def can_fuse_local(x: jnp.ndarray, w: dict) -> bool:
    """Shape/placement check only — used by the shard_map TP wrapper where
    per-shard pallas_calls are legal even though a mesh is active."""
    if DISABLE_FUSED:
        return False
    if not (_on_tpu() or FORCE_INTERPRET):
        return False
    k = x.shape[-1]
    n = w["s"].shape[-1]
    if w["s"].ndim != 2:  # layer-stacked weights arrive pre-sliced by scan
        return False
    if "m" in w:  # Q4_1 affine blocks take the XLA dequant path
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if "q4x" in w:
        return _plan_w4x8_tiles(m, k, n) is not None
    bits = 8 if "q8" in w else 4
    return _plan_tiles(m, k, n, bits) is not None


def _dequant_mm_kernel_so(xt_ref, q_ref, s_ref, o_ref, *, bits: int, tk: int,
                          tn: int, tm: int):
    """Scale-on-output decode kernel: one (n, k) grid step with the block
    scales folded into the OUTPUT instead of the weights.

    The streaming kernel below is VPU-bound at decode shapes: its dequant
    costs ~3 vector passes per weight element (int->f32 convert, scale
    multiply, ->bf16 convert), which profiles at ~60-70% of the measured
    HBM copy bandwidth (see docs/QUANTIZATION.md). Since a block's scale
    is CONSTANT across its contraction span,
        sum_k x[m,k] q[k,n] s_b[n] == s_b[n] * sum_k x[m,k] q[k,n],
    so this kernel feeds raw int8 nibbles/bytes to the MXU after a single
    convert pass and applies scales to the [tm, tn] partial products —
    O(tm/QK) VPU work per element instead of O(3). Exact same arithmetic
    (scale applied after f32 accumulation — if anything, tighter).

    Activations arrive TRANSPOSED [tk, tm]: per-block slicing then runs
    along the sublane dim, which Mosaic supports at QK granularity (the
    [tm, tk] layout would need an unsupported lane-dim split).
    Worth it only while tm <= ~QK; prefill uses the streaming kernel.
    """
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)  # [blocks, tn]
    acc = jnp.zeros((tm, tn), jnp.float32)
    for b in range(blocks):
        xb = xt_ref[b * QK:(b + 1) * QK, :]  # [QK, tm] bf16
        if bits == 8:
            qb = q_ref[b * QK:(b + 1) * QK, :].astype(jnp.bfloat16)
        else:
            p = q_ref[b * (QK // 2):(b + 1) * (QK // 2), :].astype(jnp.int32)
            lo = (p & 0xF).astype(jnp.bfloat16)
            hi = ((p >> 4) & 0xF).astype(jnp.bfloat16)
            qb = jnp.concatenate([lo, hi], axis=0)  # raw nibbles 0..15
        part = jax.lax.dot_general(
            xb, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tm, tn]
        if bits == 4:
            # Q4_0 offset folded into the output: (nib-8)*s needs -8*s*sum(x)
            xsum = jnp.sum(xb.astype(jnp.float32), axis=0)  # [tm]
            part = part - 8.0 * xsum[:, None]
        acc = acc + part * s[b][None, :]
    o_ref[:] += acc


_F32_DOT = _os.environ.get("LLAMAGO_KERNEL_F32DOT", "1") == "1"


def _dequant_mm_kernel(x_ref, q_ref, s_ref, o_ref, *, bits: int, tk: int, tn: int):
    """One (n, k) grid step: o[TM, TN] += x[TM, TK] @ dequant(q[TK, TN])."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    # Dequant arithmetic in f32: the VPU is natively f32, so bf16
    # elementwise math costs extra pack/unpack conversions (measured 20%
    # slower end-to-end). Scales are STORED bf16 (half the HBM traffic)
    # and widened on arrival.
    s = s_ref[:].astype(jnp.float32)  # [blocks, TN]
    # NOTE (negative result, measured): two "halves-dot" variants that
    # skip the int4 per-block sublane concat — (a) slicing x's 32-lane
    # blocks into halves, (b) a 256-row group packing with lane-aligned
    # 128-lane x slices — both fail Mosaic lowering on real TPU
    # ("unsupported shape cast" / "Only 2D gather is supported"), and the
    # premise is weak anyway: the unpack+concat path already achieves a
    # HIGHER element rate (~744G elem/s at 7B int4) than int8's plain
    # widen (~585G), so the concat is not the binding constraint. See git
    # history for the implementations.
    if bits == 8:
        q = q_ref[:].astype(jnp.float32).reshape(blocks, QK, tn)
    else:
        # unpack arithmetic in int32: Mosaic has no uint8 vector
        # shift/subtract and no direct uint8->f32 cast
        p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
        lo = ((p & 0xF) - 8).astype(jnp.float32)
        hi = (((p >> 4) & 0xF) - 8).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=1)
    w = (q * s[:, None, :]).reshape(tk, tn)
    if _F32_DOT:
        # The kernel is VPU-bound, not MXU-bound, at small m (profiled:
        # time tracks vector passes over weight elements, and int4 at
        # half the bytes decodes no faster than int8). Dotting in f32
        # skips the third VPU pass (f32->bf16 convert) over K*N weight
        # elements; the MXU's lower f32 rate is irrelevant at these FLOPs.
        o_ref[:] += jnp.dot(
            x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32
        )
    else:
        o_ref[:] += jnp.dot(
            x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )


# ------------------------------------------------------------- w4x8
# Exec-format kernels for int4 decode (ops/quant.py quantize_w4x8):
# interleaved centered nibbles unpack with ONE pltpu.bitcast (hardware
# sublane expand, verified order on v5e) instead of the mask/shift/
# concat VPU chain that pinned Q4_0 at ~42% of the read roofline
# (BENCH_r04 shard70b analysis). Decode shapes then quantize the (tiny)
# activation per (row, 128-group) and run depth-128 int8 MXU dots with
# both scale sets folded on the output: measured 473 GB/s at the 70B
# w13 shard shape vs 242 for the Q4_0 chain (scripts/kernel_lab.py
# bitcast_i4_i8dot_g128, 2026-08-20), with pure block-DMA topping out
# at 568-592 GB/s on the same layout — the kernel is DMA-shaped now,
# not VPU-bound. Prefill shapes keep f32 dequant (exact w4x8 numerics)
# but get the bitcast unpack.

from llamago_tpu.ops.quant import G4X8

# Activation int8 quantization changes decode numerics (bounded by the
# per-(row,group) absmax scale); the quality gate carries a w4x8 row.
# Rows above this use the f32 stream kernel (exact given the format).
_W4X8_A8_MAX_M = int(_os.environ.get("LLAMAGO_W4X8_A8_MAX_M", "16"))


def _w4x8_decode_kernel(xq_ref, sx_ref, q_ref, s_ref, o_ref, *, tk, tn, tm):
    """One (n, k) grid step of the W4A8 decode matmul: hardware int4
    unpack, tk/128 depth-128 int8 MXU dots, scales folded per group on
    the [tm, tn] output. Weight-side VPU work: one narrow convert.
    Scale rows are the format's duplicated group-64 view, so every read
    below is a STATIC row index (see quantize_w4x8)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w8 = pltpu.bitcast(q_ref[:], jnp.int4).astype(jnp.int8)  # [tk, tn]
    groups = tk // G4X8
    acc = jnp.zeros((tm, tn), jnp.float32)
    for g in range(groups):
        xg = xq_ref[:, g * G4X8:(g + 1) * G4X8]          # [tm, 128] int8
        wg = w8[g * G4X8:(g + 1) * G4X8, :]              # [128, tn] int8
        d = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = s_ref[2 * g].astype(jnp.float32)            # [tn]
        sxg = sx_ref[2 * g].astype(jnp.float32)          # [tm]
        acc = acc + d.astype(jnp.float32) * sxg[:, None] * sg[None, :]
    o_ref[:] += acc


def _w4x8_stream_kernel(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Prefill/training path: bitcast unpack -> f32 dequant -> f32 dot.
    Exact w4x8 numerics (no activation quantization); same structure as
    _dequant_mm_kernel but the unpack is one hardware convert. The
    group-64 duplicated scale rows broadcast directly over 64-row
    spans — no strided reads."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    half = G4X8 // 2
    s = s_ref[:].astype(jnp.float32)                     # [tk/64, tn]
    q = pltpu.bitcast(q_ref[:], jnp.int4).astype(jnp.float32)
    w = (q.reshape(tk // half, half, tn) * s[:, None, :]).reshape(tk, tn)
    o_ref[:] += jnp.dot(x_ref[:].astype(jnp.float32), w,
                        preferred_element_type=jnp.float32)


def _w4x8_tk(k: int) -> int | None:
    """Contraction tile. Constraints: tk | k, tk % 128 == 0 (whole scale
    groups), and tk/64 >= 8 sublanes for the per-tile scale block unless
    tk == k (equal-to-array blocks are always legal). 512 profiled best
    within VMEM on v5e (tk=1024 +2% but models past the budget)."""
    if k % G4X8:
        return None
    if k % 512 == 0:
        return 512
    # the per-tile scale block has tk/64 sublanes, which Mosaic requires
    # to be a multiple of 8 (-> tk % 512 == 0) unless the block spans the
    # whole array (tk == k, equal-to-array dims are always legal)
    for t in range(1024, k, 512):  # smallest 512-aligned divisor
        if k % t == 0:
            return t
    return k


def _plan_w4x8_tiles(m: int, k: int, n: int,
                     a8_max: int | None = None) -> tuple[int, int] | None:
    """(tk, tn) for the w4x8 kernels. Swept on v5e at the 70B shard
    shape: rate rises with tn (full-width best: 464.6 GB/s at tk=512
    tn=7168 vs 418 at tn=3584) and tk=512 is the largest contraction
    tile whose real footprint (double-buffered packed block + the
    materialized int8 copy) stays inside VMEM — tk=1024 measured +2%
    but models at 14.6 MB against the 14 MB budget and compiles only by
    losing double buffering on larger shapes."""
    if m > 1024:
        return None
    if a8_max is None:
        a8_max = _W4X8_A8_MAX_M
    tk0 = _w4x8_tk(k)
    if tk0 is None:
        return None
    tm = max(8, m)
    for tn in _aligned_divisors_desc(n, cap=_DECODE_TN_CAP):
        # full width first (DMA burst length dominates), then the widest
        # contraction tile that fits — fewer grid steps on narrow-n
        # shapes (e.g. a 70B shard's wqkv at n=1280)
        tks = [t for t in (2048, 1024) if tk0 == 512 and k % t == 0]
        for tk in tks + [tk0]:
            est = (
                2 * (tk // 2) * tn       # packed u8 block, double-buffered
                + tk * tn                # int8 unpack target
                + (tk * tn * 4 if tm > a8_max else tm * tk)
                + tm * tn * 4            # f32 output tile
                + 2 * (tk // 64) * tn * 2  # scale block (bf16, dup rows)
            )
            if est <= _VMEM_BUDGET:
                return tk, tn
    return None


@functools.partial(jax.jit, static_argnames=("a8_max",))
def _w4x8_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                    a8_max: int):
    m, k = x.shape
    n = s.shape[-1]
    tk, tn = _plan_w4x8_tiles(m, k, n, a8_max)  # callers gate via can_fuse
    tm = max(8, m)
    if m < tm:
        x = jnp.pad(x, ((0, tm - m), (0, 0)))

    grid = (n // tn, k // tk)
    q_spec = pl.BlockSpec((tk // 2, tn), lambda ni, ki: (ki, ni),
                          memory_space=pltpu.VMEM)
    # per-tile block over the duplicated group-64 scale rows: tk/64 >= 8
    # sublanes by _w4x8_tk's construction (or equal to the array dim)
    s_spec = pl.BlockSpec((tk // 64, tn), lambda ni, ki: (ki, ni),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tn), lambda ni, ki: (0, ni),
                          memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * tm * k * n,
        bytes_accessed=k * n // 2 + tm * k + tm * n * 4,
        transcendentals=0,
    )
    # n-tiles are independent; the k dim accumulates into the same
    # output tile (measured +2.6% from declaring this at the shard shape)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    if tm <= a8_max:
        groups = k // G4X8
        x3 = x.astype(jnp.float32).reshape(tm, groups, G4X8)
        x3 = x3.transpose(1, 0, 2)                       # [groups, tm, G]
        amax = jnp.max(jnp.abs(x3), axis=2)              # [groups, tm]
        sx = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        xq = jnp.clip(jnp.round(x3 / sx[:, :, None]),
                      -127, 127).astype(jnp.int8)
        xq = xq.transpose(1, 0, 2).reshape(tm, k)
        # duplicated rows, mirroring the weight-scale layout: the kernel
        # reads row 2g of a per-tile (tk/64, tm) block — static index
        sx = jnp.repeat(sx, 2, axis=0)                   # [k/64, tm]
        out = pl.pallas_call(
            functools.partial(_w4x8_decode_kernel, tk=tk, tn=tn, tm=tm),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk // 64, tm), lambda ni, ki: (ki, 0),
                             memory_space=pltpu.VMEM),
                q_spec,
                s_spec,
            ],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
            cost_estimate=cost,
            compiler_params=params,
            interpret=_interpret(),
        )(xq, sx, q, s)
        return out[:m]
    out = pl.pallas_call(
        functools.partial(_w4x8_stream_kernel, tk=tk, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            q_spec,
            s_spec,
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
        cost_estimate=cost,
        compiler_params=params,
        interpret=_interpret(),
    )(x, q, s)
    return out[:m]


# Rows at/below which the scale-on-output kernel is used. Profiled on
# v5e: its per-block MXU dots (contraction QK=32) are latency-bound and
# it measured NO faster than the streaming kernel with the f32 dot
# (w2-class shapes regressed 2x), so it is disabled by default; kept
# for re-evaluation on hardware with cheaper small-dot issue.
SCALE_ON_OUTPUT_MAX_M = int(_os.environ.get("LLAMAGO_KERNEL_SO_MAX_M", "0"))


@functools.partial(jax.jit, static_argnames=("bits",))
def _dequant_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray, bits: int):
    m, k = x.shape
    n = s.shape[-1]
    tk, tn = _plan_tiles(m, k, n, bits)  # callers gate via can_fuse
    tm = max(8, m)
    if m < tm:
        x = jnp.pad(x, ((0, tm - m), (0, 0)))
    qrows = tk if bits == 8 else tk // 2

    grid = (n // tn, k // tk)
    q_spec = pl.BlockSpec((qrows, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((tk // QK, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((tm, tn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * tm * k * n,
        bytes_accessed=(k * n if bits == 8 else k * n // 2) + tm * k * 2 + tm * n * 4,
        transcendentals=0,
    )
    if tm <= SCALE_ON_OUTPUT_MAX_M:
        out = pl.pallas_call(
            functools.partial(_dequant_mm_kernel_so, bits=bits, tk=tk, tn=tn, tm=tm),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tk, tm), lambda ni, ki: (ki, 0),
                             memory_space=pltpu.VMEM),
                q_spec,
                s_spec,
            ],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
            cost_estimate=cost,
            interpret=_interpret(),
        )(x.T, q, s)
        return out[:m]
    out = pl.pallas_call(
        functools.partial(_dequant_mm_kernel, bits=bits, tk=tk, tn=tn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
            q_spec,
            s_spec,
        ],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
        cost_estimate=cost,
        interpret=_interpret(),
    )(x, q, s)
    return out[:m]


@jax.custom_vjp
def dequant_matmul(x: jnp.ndarray, w: dict) -> jnp.ndarray:
    """x [..., K] @ blockwise-quantized w {q8|q4, s} -> [..., N].

    Differentiable wrt x (custom VJP: pallas_call has no autodiff rule;
    the backward pass is g @ dequantize(w)^T through jnp) — quantized
    weights are frozen, which is exactly the QLoRA-style fine-tuning
    contract. Weight cotangents are symbolic zeros.
    """
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    if "q4x" in w:
        # a8 threshold is a static jit arg so callers (e.g. the quality
        # gate's w4x8_a8 row) can flip it without stale trace reuse
        out = _w4x8_matmul_2d(x.reshape(m, k), w["q4x"], w["s"],
                              _W4X8_A8_MAX_M)
    else:
        bits = 8 if "q8" in w else 4
        q = w["q8"] if bits == 8 else w["q4"]
        out = _dequant_matmul_2d(x.reshape(m, k), q, w["s"], bits)
    return out.reshape(*lead, w["s"].shape[-1]).astype(x.dtype)


def _dm_fwd(x, w):
    return dequant_matmul(x, w), (x, w)


def _dm_bwd(res, g):
    import numpy as np

    from llamago_tpu.ops.quant import dequantize

    x, w = res
    deq = dequantize(w, dtype=x.dtype)  # [K, N]
    dx = jnp.einsum("...n,kn->...k", g.astype(x.dtype), deq)
    dw = {
        k: (jnp.zeros_like(a) if jnp.issubdtype(a.dtype, jnp.floating)
            else np.zeros(a.shape, jax.dtypes.float0))
        for k, a in w.items()
    }
    return dx, dw


dequant_matmul.defvjp(_dm_fwd, _dm_bwd)


# --------------------------------------------------------------- RMSNorm

# The fused RMSNorm kernel exists for completeness with the kernel layer
# the survey calls for (SURVEY.md §2.2); XLA already fuses the jnp
# rms_norm (ops/basic.py) into one HBM pass, and each extra pallas_call
# carries fixed dispatch cost, so it is opt-in.
USE_FUSED_NORM = False


def _rms_norm_kernel(x_ref, w_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(ms + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def can_fuse_norm(x: jnp.ndarray) -> bool:
    if DISABLE_FUSED or not USE_FUSED_NORM:
        return False
    if not (_on_tpu() or FORCE_INTERPRET):
        return False
    d = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    return (d % 128 == 0 or not _on_tpu()) and rows >= 1


@functools.partial(jax.jit, static_argnames=("eps",))
def _rms_norm_2d(x2: jnp.ndarray, w: jnp.ndarray, eps: float):
    rows, d = x2.shape
    tr = _pick_tile(rows, (256, 128, 64, 32, 16, 8)) or rows
    return pl.pallas_call(
        functools.partial(_rms_norm_kernel, eps=eps),
        grid=(rows // tr,),
        in_specs=[
            pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        interpret=_interpret(),
    )(x2, w)


def fused_rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-5):
    """RMSNorm as one Pallas pass: f32 row reduction + weight scale
    (reference kernel: ComputeForwardRMSNormFP32, ml.go:1753-1812)."""
    *lead, d = x.shape
    rows = 1
    for s in lead:
        rows *= s
    out = _rms_norm_2d(x.reshape(rows, d), w, eps)
    return out.reshape(*lead, d)
