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
import sys
import time

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
    f32 conversion becomes an integer OR; offset (8388608+8) folds into
    the per-block FMA bias."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    blocks = tk // QK
    s = s_ref[:].astype(jnp.float32)
    bias = (-(8388608.0 + 8.0)) * s
    p = q_ref[:].astype(jnp.int32).reshape(blocks, QK // 2, tn)
    magic = jnp.int32(0x4B000000)
    lo = jax.lax.bitcast_convert_type((p & 0xF) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type(((p >> 4) & 0xF) | magic, jnp.float32)
    nib = jnp.concatenate([lo, hi], axis=1)     # 8388608 + nib
    w = (nib * s[:, None, :] + bias[:, None, :]).reshape(tk, tn)
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
    o_ref[:] += jnp.sum(w, axis=0, keepdims=True) + 0.0 * jnp.sum(
        x_ref[:], axis=1, keepdims=True).T[:1]


def kern_dma_only(x_ref, q_ref, s_ref, o_ref, *, tk, tn):
    """Touch the bytes with minimal VPU work — DMA ceiling for this
    layout (int32 view sum)."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = q_ref[:].astype(jnp.int32)
    o_ref[:] += (jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
                 + 0.0 * s_ref[0:1, :] + 0.0 * jnp.sum(x_ref[:]))


VARIANTS = {
    "base": (kern_base, {}),
    "fma": (kern_fma, {}),
    "bitcast": (kern_bitcast, {}),
    "int8dot": (kern_int8dot, {"needs_tm": True}),
    "bf16dot": (kern_bf16dot, {}),
    "decode_only": (kern_decode_only, {}),
    "dma_only": (kern_dma_only, {}),
}


def run_variant(name, kern, opts, k=8192, n=7168, m=8, layers=24, steps=8,
                tk=None, tn=None):
    tk = tk or (1024 if k % 1024 == 0 else 512)
    tn = tn or 1024
    assert k % tk == 0 and n % tn == 0
    key = jax.random.PRNGKey(0)
    from llamago_tpu.ops import quant

    ws = []
    for i in range(layers):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (k, n), jnp.bfloat16) * 0.02
        ws.append(quant.quantize(w, 4))
    stacked = {p: jnp.stack([w[p] for w in ws]) for p in ws[0]}
    _sync(stacked["q4"])
    weight_bytes = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(stacked))

    tm = max(8, m)
    kw = dict(tk=tk, tn=tn)
    if opts.get("needs_tm"):
        kw["tm"] = tm
    grid = (n // tn, k // tk)
    call = pl.pallas_call(
        functools.partial(kern, **kw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // QK, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * tm * k * n,
            bytes_accessed=k * n // 2 + tm * k * 2 + tm * n * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )

    # back-projection weight so outputs chain [m, n] -> [m, k]
    key, sub = jax.random.split(key)
    back = jax.random.normal(sub, (n, k), jnp.bfloat16) * 0.01

    @jax.jit
    def sweep(stacked, x):
        def outer(x, _):
            def layer(x, lw):
                o = call(x, lw["q4"], lw["s"])  # [tm, n]
                x = jnp.tanh(o.astype(jnp.bfloat16) @ back) * 0.5
                return x, None
            x, _ = jax.lax.scan(layer, x, stacked)
            return x, None
        x, _ = jax.lax.scan(outer, x, None, length=steps)
        return x

    x0 = jnp.ones((tm, k), jnp.bfloat16)
    x = sweep(stacked, x0)
    _sync(x)
    t0 = time.time()
    x = sweep(stacked, x)
    _sync(x)
    dt = time.time() - t0
    gbps = weight_bytes * steps / dt / 1e9
    elems = k * n * layers * steps / dt / 1e9
    print(f"{name:>14s}  k={k} n={n} tk={tk} tn={tn} m={m}: "
          f"{gbps:7.1f} GB/s  {elems:7.1f} G elem/s  ({dt:.3f}s)")
    return gbps


def correctness(name, kern, opts, k=512, n=512, m=8):
    """Check the variant against the jnp dequant path."""
    if name in ("decode_only", "dma_only"):
        return
    from llamago_tpu.ops import quant
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (k, n), jnp.float32)
    qw = quant.quantize(w, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, k), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ quant.dequantize(qw, jnp.float32)
    tk, tn = 256, 256
    tm = 8
    kw = dict(tk=tk, tn=tn)
    if opts.get("needs_tm"):
        kw["tm"] = tm
    out = pl.pallas_call(
        functools.partial(kern, **kw),
        grid=(n // tn, k // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda ni, ki: (0, ki), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // QK, tn), lambda ni, ki: (ki, ni), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda ni, ki: (0, ni), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, qw["q4"], qw["s"])
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    status = "OK" if err < 2e-2 else "FAIL"
    print(f"{name:>14s}  correctness rel-err {err:.2e} {status}")
    assert err < 2e-2, name


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    print(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}")
    for nm in names:
        kern, opts = VARIANTS[nm]
        correctness(nm, kern, opts)
    for nm in names:
        kern, opts = VARIANTS[nm]
        run_variant(nm, kern, opts)
