"""Weight-only block quantization: Q8_0 and Q4_0 (block size 32).

The reference DEFINES these dtypes (reference: pkg/ml/ml.go:89-94 with
BLCK_SIZE/TYPE_SIZE tables ml.go:123-124, QK=32 ml.go:24) but never
implements compute for them — its Makefile `quantize` target shells out
to llama.cpp (Makefile:132-133) and its loader rejects quantized tensors
(llama.go:956-958). Quantization is the reference's own unchecked roadmap
(README.md:45,64) and a BASELINE.md requirement here.

Formats (ggml-compatible semantics, TPU-friendly layout):
  Q8_0: per 32-block scale d = absmax/127, q = round(x/d) in int8.
  Q4_0: per 32-block scale d = signed_absmax/-8, q = round(x/d)+8 in
        [0,15], two nibbles packed per int8 byte along the input dim.

Layout: weights live [in, out] (see checkpoint/params.py); blocks run
along the INPUT (contraction) dim:
  q: int8 [in, out] (Q8_0) or packed int8 [in/2, out] (Q4_0)
  s: f32 [in/32, out]

`quant_matmul` is the jnp/XLA reference path (dequantize then dot);
ops/kernels.py provides the fused Pallas dequant-matmul that reads int8/
int4 straight from HBM at roofline — the `linear()` seam in ops/basic.py
picks the kernel when available.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.config import ModelConfig

QK = 32  # block size (reference: pkg/ml/ml.go:24)

# w4x8 exec-format scale-group size. 128 = MXU systolic depth: the
# decode kernel folds scales per group on the output of depth-128 int8
# MXU dots (ops/kernels.py), so groups below 128 would issue
# latency-bound dots (measured in r3's w4a8 lab runs) and groups above
# it would coarsen quantization for no extra MXU efficiency.
G4X8 = 128

# int4 execution format (TPU decode): "w4x8" re-lays int4 weights at
# load time into bitcast-ready interleaved nibbles with group-128
# scales so the decode kernel can run hardware int4->int8 converts +
# int8 MXU dots (measured 473 GB/s vs 242 for the Q4_0 f32-dequant
# chain at the 70B shard shape — scripts/kernel_lab.py bitcast_i4_*).
# "q4_0" keeps the file format at runtime (exact ggml group-32
# numerics). Default: w4x8 on TPU, q4_0 elsewhere (CPU tests exercise
# w4x8 explicitly via this env knob + interpret-mode kernels).
_INT4_EXEC_ENV = "LLAMAGO_INT4_EXEC"


def int4_exec_format() -> str:
    import os

    v = os.environ.get(_INT4_EXEC_ENV)
    if v in ("w4x8", "q4_0"):
        return v
    return "w4x8" if jax.default_backend() == "tpu" else "q4_0"

# parameter leaves that get quantized (matmul weights only; embeddings and
# norms stay in the compute dtype, standard weight-only practice)
QUANT_LEAVES = {"wq", "wk", "wv", "wo", "w1", "w2", "w3", "output"}

# LM-head column padding (int8 only). A [K, N] int8 weight whose row
# stride (N bytes) is not 512-aligned streams dramatically slower on
# v5e: the 32000-wide LLaMA head measured ~206 GB/s vs ~370-390 for
# every 512-aligned production width (scripts/shape_sweep.py). Padding
# N up to a 4096 multiple restores alignment (and keeps the column dim
# divisible under tensor-parallel vocab sharding up to tp=32); the pad
# columns quantize to scale 0 so they dequantize to exactly 0, and
# forward_impl slices logits back to vocab_size before any consumer.
LM_HEAD_PAD = 4096
_LM_HEAD_PAD_MAX_OVERHEAD = 0.05  # skip if padding adds >5% columns


def lm_head_pad_cols(n: int) -> int:
    """Padded column count for an int8 lm head (0 = leave unpadded)."""
    pad = (-n) % LM_HEAD_PAD
    if pad == 0 or pad > n * _LM_HEAD_PAD_MAX_OVERHEAD:
        return 0
    return pad


def pad_lm_head(leaf, vocab_size: int | None = None):
    """Column-pad a Q8_0 leaf to the aligned width (no-op otherwise).
    Dense (bf16/f32) heads already have 512-aligned strides at LLaMA
    vocab widths, and int4 is VPU-rate bound, so only q8 pays.

    When `vocab_size` is given, pad ONLY a head whose width equals it:
    checkpoints can legitimately carry more head columns than the
    header vocab (HF conversions whose tokenizer piece count trails the
    weight width) and those extra logits must stay addressable — the
    forward pass slices to `lm_head_padded_cols(vocab_size)` and the
    pad/slice decisions must agree exactly.

    Known ambiguity (accepted): a checkpoint whose REAL head width
    happens to equal lm_head_padded_cols(header vocab) — e.g. header
    32000 with a genuinely 32768-wide stored head — gets its tail
    columns sliced by forward_impl. Those column ids exceed the
    header's tokenizer size, so no sampler may emit them and no
    detokenizer could render them; slicing is the defensible reading."""
    if not (is_quantized(leaf) and "q8" in leaf and "m" not in leaf):
        return leaf
    n = leaf["q8"].shape[-1]
    if vocab_size is not None and n != vocab_size:
        return leaf
    pad = lm_head_pad_cols(n)
    if not pad:
        return leaf
    return {
        "q8": jnp.pad(leaf["q8"], ((0, 0), (0, pad))),
        "s": jnp.pad(leaf["s"], ((0, 0), (0, pad))),
    }


def lm_head_padded_cols(vocab_size: int) -> int:
    """The width pad_lm_head produces for a vocab_size-wide head — the
    ONLY head width forward_impl may slice back down (models/llama.py)."""
    return vocab_size + lm_head_pad_cols(vocab_size)


def is_quantized(w) -> bool:
    return (isinstance(w, dict) and "s" in w
            and ("q8" in w or "q4" in w or "q4x" in w))


@partial(jax.jit, static_argnames=("bits",))
def quantize(w: jnp.ndarray, bits: int = 8) -> dict:
    """Block-quantize a weight [..., in, out] along the `in` dim."""
    *lead, k, n = w.shape
    blocks = k // QK
    assert k % QK == 0, f"in-dim {k} not divisible by block size {QK}"
    xb = w.astype(jnp.float32).reshape(*lead, blocks, QK, n)
    # Scales are stored bf16 (Mosaic has no f16 type) and the rounding is
    # scale-aware: d is rounded FIRST and q is computed against the
    # rounded value, so the per-element error stays <= d/2 of the stored
    # scale — no extra error from the narrow scale dtype. (File-ingested
    # Q8_0/Q4_0 keep their exact f16-derived f32 scales; the kernel
    # accepts either dtype.)
    if bits == 8:
        absmax = jnp.max(jnp.abs(xb), axis=-2)  # [..., blocks, n]
        d = (absmax / 127.0).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / jnp.where(df > 0, df, 1.0), 0.0)
        q = jnp.clip(jnp.round(xb * inv[..., None, :]), -127, 127).astype(jnp.int8)
        return {"q8": q.reshape(*lead, k, n), "s": d}
    if bits == 4:
        # ggml Q4_0 sign trick: scale by the SIGNED extreme / -8
        idx = jnp.argmax(jnp.abs(xb), axis=-2, keepdims=True)
        signed_max = jnp.take_along_axis(xb, idx, axis=-2)[..., 0, :]
        d = (signed_max / -8.0).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df != 0, 1.0 / jnp.where(df != 0, df, 1.0), 0.0)
        q = jnp.clip(jnp.round(xb * inv[..., None, :]) + 8, 0, 15).astype(jnp.uint8)
        # Block-local packing: within each 32-row block, byte j holds rows
        # j (lo nibble) and j+16 (hi nibble) — matches the ggml file
        # pairing, and unpacking is two block-contiguous halves + concat.
        # (An interleaved (2j, 2j+1) packing with stack-reshape unpack was
        # tried and measured 4x SLOWER end-to-end: sublane interleaves are
        # expensive relayouts in Mosaic.)
        lo, hi = q[..., :16, :], q[..., 16:, :]  # [..., blocks, 16, n]
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return {"q4": packed.reshape(*lead, k // 2, n), "s": d}
    raise ValueError(f"unsupported bits: {bits}")


@jax.jit
def quantize_w4x8(w: jnp.ndarray) -> dict:
    """Quantize [..., in, out] to the w4x8 exec format: CENTERED signed
    nibbles (-8..7, no +8 offset) packed interleaved — byte r holds rows
    2r (lo nibble) and 2r+1 (hi) — which is exactly the sublane order
    `pltpu.bitcast(u8, int4)` produces on v5e (verified on hardware and
    in interpret mode), so the kernel unpack is ONE hardware convert
    instead of the mask/shift/concat VPU chain. Scales per 128-group
    along the input dim (vs Q4_0's 32): the group must span a full
    depth-128 int8 MXU dot for output scale folding.

    Same ggml sign trick as Q4_0 (scale = signed extreme / -8) so the
    full -8..7 range is used."""
    *lead, k, n = w.shape
    assert k % G4X8 == 0, f"in-dim {k} not divisible by group {G4X8}"
    groups = k // G4X8
    xb = w.astype(jnp.float32).reshape(*lead, groups, G4X8, n)
    idx = jnp.argmax(jnp.abs(xb), axis=-2, keepdims=True)
    signed_max = jnp.take_along_axis(xb, idx, axis=-2)[..., 0, :]
    d = (signed_max / -8.0).astype(jnp.bfloat16)
    df = d.astype(jnp.float32)
    inv = jnp.where(df != 0, 1.0 / jnp.where(df != 0, df, 1.0), 0.0)
    q = jnp.clip(jnp.round(xb * inv[..., None, :]), -8, 7).astype(jnp.int8)
    pairs = q.reshape(*lead, k // 2, 2, n)
    lo = (pairs[..., 0, :] & 0xF).astype(jnp.uint8)
    hi = (pairs[..., 1, :] & 0xF).astype(jnp.uint8)
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    # Scales ship DUPLICATED x2 ([k/64, n], row pairs identical — a
    # group-64 view of the group-128 scales): a k-tile's scale block
    # then has tk/64 >= 8 sublanes, which Mosaic's block rules require,
    # and every in-kernel scale read is a static row index (dynamic
    # single-row reads fail to compile: "cannot statically prove that
    # index ... is a multiple of 8", measured on v5e). Costs 2x the
    # scale bytes = ~3% of the packed weight stream.
    return {"q4x": packed, "s": jnp.repeat(d, 2, axis=-2)}


def unpack_w4x8(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed w4x8 [..., in/2, out] uint8 -> centered int8 [..., in, out]
    (interleaved pairing: byte r -> elements 2r, 2r+1)."""
    *lead, half, n = packed.shape
    p = packed.astype(jnp.int32)
    lo = (p & 0xF)
    hi = ((p >> 4) & 0xF)
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    inter = jnp.stack([lo, hi], axis=-2)  # [..., in/2, 2, out]
    return inter.reshape(*lead, half * 2, n)


def w4x8_from_leaf(w: dict) -> dict:
    """Re-lay an ingested int4 leaf (Q4_0; Q4_1 affine stays as-is) into
    the w4x8 exec format: exact dequantization of the group-32 blocks,
    then group-128 requantization. The extra rounding step is what the
    quality gate's w4x8 row measures (eval/quality_gate.py)."""
    if "q4" not in w or "m" in w:
        return w
    k = w["q4"].shape[-2] * 2
    if k % G4X8 != 0:
        return w
    return quantize_w4x8(dequantize(w, jnp.float32))


def unpack_q4(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed [..., in/2, out] uint8 -> centered int [..., in, out]
    (ggml block pairing: byte j -> elements j, j+16 within each block)."""
    *lead, half, n = packed.shape
    blocks = half // (QK // 2)
    pb = packed.reshape(*lead, blocks, QK // 2, n)
    lo = (pb & 0xF).astype(jnp.int8) - 8
    hi = ((pb >> 4) & 0xF).astype(jnp.int8) - 8
    full = jnp.concatenate([lo, hi], axis=-2)  # [..., blocks, 32, n]
    return full.reshape(*lead, half * 2, n)


def dequantize(w: dict, dtype=jnp.float32) -> jnp.ndarray:
    """Reference dequantization (tests / fallback path). Handles Q8_0,
    Q4_0, and Q4_1 (affine: presence of "m" mins) leaves."""
    if "q8" in w:
        q = w["q8"].astype(jnp.float32)
    elif "q4x" in w:
        q = unpack_w4x8(w["q4x"]).astype(jnp.float32)
        # s rows are duplicated group-64 views of the group-128 scales
        s = jnp.repeat(w["s"].astype(jnp.float32), G4X8 // 2, axis=-2)
        return (q * s).astype(dtype)
    else:
        q = unpack_q4(w["q4"]).astype(jnp.float32)
        if "m" in w:
            q = q + 8.0  # Q4_1 stores raw nibbles 0..15, no -8 offset
    scales = jnp.repeat(w["s"].astype(jnp.float32), QK, axis=-2)
    out = q * scales
    if "m" in w:
        out = out + jnp.repeat(w["m"].astype(jnp.float32), QK, axis=-2)
    return out.astype(dtype)


def quant_matmul(x: jnp.ndarray, w: dict, tp_kind: str | None = None) -> jnp.ndarray:
    """x [..., in] @ quantized w -> [..., out].

    Dispatch order: shard_map-wrapped Pallas kernel when a mesh is active
    (parallel/tp_kernels.py, per-shard fusion with Megatron specs), the
    single-chip fused kernel on TPU when shapes allow, else the jnp/XLA
    dequantize-then-dot fallback.
    """
    from llamago_tpu.ops import kernels

    if kernels.ACTIVE_MESH is not None:
        from llamago_tpu.parallel.tp_kernels import maybe_tp_matmul

        out = maybe_tp_matmul(x, w, tp_kind)
        if out is not None:
            return out.astype(x.dtype)
    if kernels.can_fuse(x, w):
        return kernels.dequant_matmul(x, w)
    deq = dequantize(w, dtype=x.dtype)
    return jnp.dot(x, deq, preferred_element_type=x.dtype)


def _quant_bits(config: ModelConfig) -> int:
    return 4 if config.weight_dtype == "int4" else 8


def quantize_params(config: ModelConfig, params, shardings=None):
    """Quantize matmul leaves of a (host or device) parameter pytree.

    Runs jitted on device when given device arrays — bench-sized random
    models never touch host memory.
    """
    bits = _quant_bits(config)
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.dtype(config.dtype)

    def put(leaf, shard):
        arr = jnp.asarray(leaf)
        if shard is not None:
            arr = jax.device_put(arr, shard)
        return arr

    def shard_of(tree, key):
        return None if shardings is None else tree[key]

    exec_w4x8 = bits == 4 and int4_exec_format() == "w4x8"

    def handle(key, leaf, sh):
        if is_quantized(leaf):  # pre-quantized (e.g. Q8_0/Q4_0 file blocks)
            leaf = {k: jnp.asarray(v) for k, v in leaf.items()}
            if exec_w4x8:
                leaf = w4x8_from_leaf(leaf)  # no-op for q8/q4_1/odd dims
            return _shard_quantized(leaf, sh)
        if (key in QUANT_LEAVES
                and np.shape(leaf)[-2] % QK == 0):
            # leaves whose in-dim doesn't divide the block size stay
            # dense (mixed files: the quantizer leaves them dense too)
            arr = jnp.asarray(leaf, dtype)
            if exec_w4x8 and np.shape(leaf)[-2] % G4X8 == 0:
                return _shard_quantized(quantize_w4x8(arr), sh)
            return _shard_quantized(quantize(arr, bits), sh)
        return put(jnp.asarray(leaf, dtype), sh)

    out = {"layers": {}}
    for key in ("tok_embeddings", "norm", "output"):
        out[key] = handle(key, params[key], shard_of(shardings, key))
        if key == "output" and shardings is None:
            # stride-align the int8 lm head (see pad_lm_head), AFTER
            # handle() so one pad call covers both pre-quantized file
            # leaves and freshly-quantized dense ones. Under a mesh the
            # leaf shards on the vocab dim with a spec built for the
            # UNPADDED width, so padding is single-chip only. Heads
            # wider than the header vocab (legit in converted
            # checkpoints) are left alone — pad and forward-slice must
            # agree (models/llama.py).
            out[key] = pad_lm_head(out[key], vocab_size=config.vocab_size)
    lsh = None if shardings is None else shardings["layers"]
    for key, leaf in params["layers"].items():
        out["layers"][key] = handle(key, leaf, None if lsh is None else lsh[key])
    return out


def _shard_quantized(q: dict, sharding):
    if sharding is None:
        return q
    out = {}
    for k, arr in q.items():
        spec = sharding.spec
        ok = True
        for dim, names in zip(arr.shape, tuple(spec) + (None,) * arr.ndim):
            if names is None:
                continue
            size = sharding.mesh.shape[names] if isinstance(names, str) else 1
            if dim % size != 0:
                ok = False
        if ok:
            out[k] = jax.device_put(arr, sharding)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            out[k] = jax.device_put(arr, NamedSharding(sharding.mesh, PartitionSpec()))
    return out


def quantize_ggjt_tensors(
    tensors: dict[str, np.ndarray], bits: int = 8
) -> dict[str, dict | np.ndarray]:
    """Host-side quantization of raw checkpoint tensors (converter path)."""
    out: dict[str, dict | np.ndarray] = {}
    for name, arr in tensors.items():
        leafkey = name.split(".")[-2] if "." in name else name
        is_mat = arr.ndim == 2 and any(k in name for k in QUANT_LEAVES)
        if is_mat:
            q = quantize(jnp.asarray(np.asarray(arr, np.float32).T), bits)
            out[name] = jax.tree.map(np.asarray, q)
        else:
            out[name] = np.asarray(arr)
    return out
