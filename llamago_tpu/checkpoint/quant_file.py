"""ggml-bit-compatible Q8_0 / Q4_0 tensor blocks in ggjt files.

The reference defines the Q4 dtypes and block tables but has no quantizer
— its Makefile `quantize` target shells out to llama.cpp's external
binary (reference: Makefile:132-133; dtype tables pkg/ml/ml.go:89-94,
123-124). This module implements the real thing, with llama.cpp's exact
bit layout so files interoperate both ways:

  Q8_0 block (34 bytes / 32 elems): f16 d, int8 qs[32];  x = qs*d
  Q4_0 block (18 bytes / 32 elems): f16 d, uint8 qs[16];
      qs[j] holds elem j (lo nibble) and elem j+16 (hi nibble),
      x = (nibble - 8) * d,  d = signed_absmax / -8
  Q4_1 block (20 bytes / 32 elems): f16 d, f16 m, uint8 qs[16];
      x = nibble * d + m,  d = (max - min) / 15,  m = min

File dtype codes: Q4_0 = 2, Q4_1 = 3 (reference:
scripts/convert-pth-to-ggml.py:29-35 WTYPES + pkg/ml/ml.go:89-94),
Q8_0 = 8 (ggml type id).

Blocks run along the file's contiguous dim (in_features). The device
repack is a plain transpose because the in-memory packing
(ops/quant.py: block-local halves) matches ggml's (j, j+16) pairing.

The hot loops (quantize/dequantize over GBs) dispatch to the native C++
library when built (native/), with these numpy implementations as the
reference and fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

QK = 32
Q8_BLOCK_BYTES = 2 + QK  # f16 scale + 32 int8
Q4_BLOCK_BYTES = 2 + QK // 2
Q41_BLOCK_BYTES = 4 + QK // 2  # f16 d + f16 m + 16 nibble bytes

DTYPE_Q4_0 = 2  # reference: convert-pth-to-ggml.py WTYPES
DTYPE_Q4_1 = 3  # reference: pkg/ml/ml.go:90
DTYPE_Q8_0 = 8  # ggml type id

_BLOCK_BYTES = {"q8_0": Q8_BLOCK_BYTES, "q4_0": Q4_BLOCK_BYTES,
                "q4_1": Q41_BLOCK_BYTES}


@dataclass
class QuantTensor:
    """A quantized tensor as stored in a ggjt file: raw blocks, row-major
    [out, in] logical shape."""

    kind: str  # "q8_0" | "q4_0"
    raw: np.ndarray  # uint8 [out, row_bytes]
    shape: tuple[int, int]  # (out, in)

    @property
    def ndim(self) -> int:
        return 2


def row_bytes(kind: str, in_dim: int) -> int:
    return (in_dim // QK) * _BLOCK_BYTES[kind]


def quantize_rows_q8_0(x: np.ndarray) -> np.ndarray:
    """f32/f16 [out, in] -> uint8 [out, in//32 * 34] (numpy reference)."""
    out, k = x.shape
    nb = k // QK
    xb = np.ascontiguousarray(x, np.float32).reshape(out, nb, QK)
    absmax = np.abs(xb).max(axis=-1)
    d = (absmax / 127.0).astype(np.float32)
    inv = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0.0)
    q = np.clip(np.rint(xb * inv[..., None]), -127, 127).astype(np.int8)
    blocks = np.empty((out, nb, Q8_BLOCK_BYTES), np.uint8)
    blocks[:, :, :2] = d.astype(np.float16)[..., None].view(np.uint8)
    blocks[:, :, 2:] = q.view(np.uint8)
    return blocks.reshape(out, nb * Q8_BLOCK_BYTES)


def quantize_rows_q4_0(x: np.ndarray) -> np.ndarray:
    out, k = x.shape
    nb = k // QK
    xb = np.ascontiguousarray(x, np.float32).reshape(out, nb, QK)
    idx = np.abs(xb).argmax(axis=-1)
    signed_max = np.take_along_axis(xb, idx[..., None], axis=-1)[..., 0]
    d = (signed_max / -8.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    q = np.clip(np.rint(xb * inv[..., None]) + 8, 0, 15).astype(np.uint8)
    packed = q[:, :, :16] | (q[:, :, 16:] << 4)
    blocks = np.empty((out, nb, Q4_BLOCK_BYTES), np.uint8)
    blocks[:, :, :2] = d.astype(np.float16)[..., None].view(np.uint8)
    blocks[:, :, 2:] = packed
    return blocks.reshape(out, nb * Q4_BLOCK_BYTES)


def quantize_rows_q4_1(x: np.ndarray) -> np.ndarray:
    """Q4_1 affine blocks: x ~ nibble*d + m (numpy reference; no native
    path — the reference defines the dtype, ml.go:90, but never computes
    it either)."""
    out, k = x.shape
    nb = k // QK
    xb = np.ascontiguousarray(x, np.float32).reshape(out, nb, QK)
    mn = xb.min(axis=-1)
    mx = xb.max(axis=-1)
    d = ((mx - mn) / 15.0).astype(np.float32)
    inv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    q = np.clip(np.rint((xb - mn[..., None]) * inv[..., None]), 0, 15).astype(np.uint8)
    packed = q[:, :, :16] | (q[:, :, 16:] << 4)
    blocks = np.empty((out, nb, Q41_BLOCK_BYTES), np.uint8)
    blocks[:, :, :2] = d.astype(np.float16)[..., None].view(np.uint8)
    blocks[:, :, 2:4] = mn.astype(np.float16)[..., None].view(np.uint8)
    blocks[:, :, 4:] = packed
    return blocks.reshape(out, nb * Q41_BLOCK_BYTES)


def split_blocks(qt: QuantTensor):
    """raw blocks -> (q, d[, m]): q int8 [out, in] (q8) or uint8
    [out, in/2] (q4), d float32 [out, nb]; Q4_1 also returns m (mins)."""
    out, k = qt.shape
    nb = k // QK
    bb = _BLOCK_BYTES[qt.kind]
    hdr = 4 if qt.kind == "q4_1" else 2
    blocks = qt.raw.reshape(out, nb, bb)
    d = np.ascontiguousarray(blocks[:, :, :2]).view(np.float16).astype(np.float32)
    d = d.reshape(out, nb)
    qs = np.ascontiguousarray(blocks[:, :, hdr:])
    if qt.kind == "q8_0":
        return qs.view(np.int8).reshape(out, k), d
    if qt.kind == "q4_1":
        m = np.ascontiguousarray(blocks[:, :, 2:4]).view(np.float16)
        return qs.reshape(out, k // 2), d, m.astype(np.float32).reshape(out, nb)
    return qs.reshape(out, k // 2), d


def dequantize_rows(qt: QuantTensor) -> np.ndarray:
    """Numpy reference dequantization -> f32 [out, in]."""
    parts = split_blocks(qt)
    q, d = parts[0], parts[1]
    out, k = qt.shape
    nb = k // QK
    if qt.kind == "q8_0":
        return (q.astype(np.float32).reshape(out, nb, QK)
                * d[..., None]).reshape(out, k)
    lo = (q & 0xF).astype(np.int16)
    hi = ((q >> 4) & 0xF).astype(np.int16)
    qf = np.concatenate(
        [lo.reshape(out, nb, 16), hi.reshape(out, nb, 16)], axis=-1
    ).astype(np.float32)
    if qt.kind == "q4_1":
        m = parts[2]
        return (qf * d[..., None] + m[..., None]).reshape(out, k)
    return ((qf - 8.0) * d[..., None]).reshape(out, k)


def to_device_leaf(qt: QuantTensor):
    """File blocks ([out, in] row-major) -> device QuantizedTensor leaf
    ({q8|q4, s} in [in, out] layout, see ops/quant.py). The nibble pairing
    matches, so this is a transpose."""
    import jax.numpy as jnp

    parts = split_blocks(qt)
    q, d = parts[0], parts[1]
    key = "q8" if qt.kind == "q8_0" else "q4"
    leaf = {key: jnp.asarray(q.T), "s": jnp.asarray(d.T)}
    if qt.kind == "q4_1":
        leaf["m"] = jnp.asarray(parts[2].T)
    return leaf


def quantize_ggjt(in_path: str, out_path: str, kind: str = "q8_0") -> str:
    """ggjt f32/f16 -> ggjt with Q8_0/Q4_0 matmul weights (the `quantize`
    tool the reference lacks — its Makefile target shells out to
    llama.cpp, Makefile:132-133). Norms and embeddings stay dense.

    ftype codes follow llama.cpp: 2 = mostly Q4_0, 7 = mostly Q8_0.
    """
    from llamago_tpu.checkpoint.ggjt import write_ggjt
    from llamago_tpu.checkpoint.gguf import read_checkpoint

    matmul_markers = (".wq.", ".wk.", ".wv.", ".wo.", ".w1.", ".w2.", ".w3.")
    ckpt = read_checkpoint(in_path)  # ggjt or GGUF input
    out: dict = {}
    for name, arr in ckpt.tensors.items():
        is_mat = name == "output.weight" or any(m in name for m in matmul_markers)
        if isinstance(arr, QuantTensor):
            out[name] = arr  # already quantized
        elif (is_mat and getattr(arr, "ndim", 0) == 2
              and arr.shape[1] % QK == 0):
            out[name] = quantize_array(np.asarray(arr, np.float32), kind)
        else:
            # non-matmul leaves AND matmuls whose in_dim doesn't divide
            # the 32-element block (quantizing would silently TRUNCATE
            # the trailing elements) stay dense
            out[name] = np.asarray(arr)
    from llamago_tpu.tokenizer_bpe import BPEVocab

    if isinstance(ckpt.vocab, BPEVocab) and not out_path.endswith(".gguf"):
        raise ValueError(
            "BPE-tokenizer models must quantize to a .gguf output "
            "(ggjt's scored-piece vocab cannot carry BPE merges)")
    if out_path.endswith(".gguf"):
        # GGUF out: interop back to the llama.cpp ecosystem (metadata
        # carries GQA/rope natively — no sidecar needed)
        from llamago_tpu.checkpoint.gguf import write_gguf

        write_gguf(out_path, ckpt.config, ckpt.vocab, out)
        return out_path
    ftype = {"q8_0": 7, "q4_0": 2, "q4_1": 3}[kind]  # llama.cpp codes
    write_ggjt(out_path, ckpt.config, ckpt.vocab, out, ftype=ftype)
    # carry the metadata the v1 header can't (rope_theta etc.) along
    from llamago_tpu.checkpoint.ggjt import write_meta_sidecar

    write_meta_sidecar(out_path, ckpt.config)
    return out_path


def quantize_array(x: np.ndarray, kind: str) -> QuantTensor:
    """Quantize a dense [out, in] array into file blocks (native C++ when
    available, numpy fallback)."""
    from llamago_tpu import native

    fn = native.quantize_rows(kind)  # C++ path covers q8_0/q4_0
    if fn is not None:
        raw = fn(x)
    else:
        raw = {"q8_0": quantize_rows_q8_0, "q4_0": quantize_rows_q4_0,
               "q4_1": quantize_rows_q4_1}[kind](x)
    return QuantTensor(kind=kind, raw=raw, shape=tuple(x.shape))
