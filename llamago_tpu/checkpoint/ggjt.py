"""ggjt v1 checkpoint format: reader and writer.

Format parity with the reference loader (reference: pkg/llama/llama.go:712-976)
and converter (reference: scripts/convert-pth-to-ggml.py:109-232):

  header:  int32 magic 0x67676a74 ('ggjt'), int32 version 1,
           int32 vocab_size, dim, multiple_of, n_heads, n_layers,
           rot (= dim // n_heads, obsolete), ftype (0=f32, 1=f16)
  vocab:   vocab_size × { int32 len, len bytes piece, f32 score }
  tensors: repeated { int32 n_dims (1|2), int32 name_len, int32 dtype,
                      int32 ne[n_dims]  (ne[0] = contiguous/fastest dim),
                      name bytes, pad to 32-byte file alignment,
                      raw data } until EOF

A 2-D tensor with file dims ne=[in, out] is row-major [out, in] as a
numpy array — i.e. the torch nn.Linear [out_features, in_features]
layout the converter wrote verbatim.

The writer exists so tests can build tiny real checkpoints and so our
converter (checkpoint/convert.py) can emit reference-compatible files.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from llamago_tpu.config import ModelConfig
from llamago_tpu.tokenizer import Vocab

GGJT_MAGIC = 0x67676A74  # reference: pkg/llama/llama.go:26
GGJT_VERSION = 1  # reference: pkg/llama/llama.go:29
ALIGNMENT = 32  # reference: pkg/llama/llama.go:925-933

# dtype codes in tensor headers (reference: scripts/convert-pth-to-ggml.py:29-35
# maps ftype->these via WTYPES; pkg/ml/ml.go:85-94 mirrors them). Q4_0/Q8_0
# blocks use ggml's bit layout (checkpoint/quant_file.py) — the reference
# DEFINES Q4 codes but cannot load them (llama.go:956-958); we can.
DTYPE_F32 = 0
DTYPE_F16 = 1
DTYPE_Q4_0 = 2
DTYPE_Q4_1 = 3
DTYPE_Q8_0 = 8
_DTYPE_TO_NP = {DTYPE_F32: np.float32, DTYPE_F16: np.float16}
_NP_TO_DTYPE = {np.dtype(np.float32): DTYPE_F32, np.dtype(np.float16): DTYPE_F16}
_QUANT_KINDS = {DTYPE_Q4_0: "q4_0", DTYPE_Q4_1: "q4_1", DTYPE_Q8_0: "q8_0"}
_KIND_TO_DTYPE = {"q4_0": DTYPE_Q4_0, "q4_1": DTYPE_Q4_1, "q8_0": DTYPE_Q8_0}


@dataclass
class GGJTCheckpoint:
    config: ModelConfig
    vocab: Vocab
    # name -> numpy array in the file's row-major layout:
    # 2-D weights are [out_features, in_features]; dtype f32 or f16.
    tensors: dict[str, np.ndarray]
    ftype: int = 0


def expected_tensor_names(n_layers: int) -> list[str]:
    """The full tensor name set (reference: pkg/llama/llama.go:819-863)."""
    names = ["tok_embeddings.weight", "norm.weight", "output.weight"]
    for i in range(n_layers):
        p = f"layers.{i}."
        names += [
            p + "attention_norm.weight",
            p + "attention.wq.weight",
            p + "attention.wk.weight",
            p + "attention.wv.weight",
            p + "attention.wo.weight",
            p + "ffn_norm.weight",
            p + "feed_forward.w1.weight",
            p + "feed_forward.w2.weight",
            p + "feed_forward.w3.weight",
        ]
    return names


def read_ggjt(path: str, max_seq_len: int = 1024) -> GGJTCheckpoint:
    """Parse a ggjt v1 file (reference: LoadModel, pkg/llama/llama.go:712-976).

    Unlike the reference (scalar FP16->FP32 loop, llama.go:938-941), tensor
    data is memory-mapped and sliced zero-copy; FP16 stays FP16 (the device
    upload casts to the compute dtype).
    """
    buf = np.memmap(path, dtype=np.uint8, mode="r")
    pos = 0

    def read_i32() -> int:
        nonlocal pos
        (v,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        return v

    magic = read_i32()
    if magic != GGJT_MAGIC:
        raise ValueError(f"{path}: bad magic {magic:#x}, want {GGJT_MAGIC:#x} ('ggjt')")
    version = read_i32()
    if version != GGJT_VERSION:
        raise ValueError(f"{path}: unsupported ggjt version {version}")

    vocab_size = read_i32()
    dim = read_i32()
    multiple_of = read_i32()
    n_heads = read_i32()
    n_layers = read_i32()
    _rot = read_i32()  # obsolete (= dim // n_heads)
    ftype = read_i32()

    # --- vocab (reference: llama.go:799-811)
    tokens: list[tuple[bytes, float]] = []
    for _ in range(vocab_size):
        n = read_i32()
        piece = bytes(buf[pos : pos + n])
        pos += n
        (score,) = struct.unpack_from("<f", buf, pos)
        pos += 4
        tokens.append((piece, score))
    vocab = Vocab(tokens)

    # --- tensors (reference: llama.go:889-966)
    tensors: dict[str, np.ndarray] = {}
    total = len(buf)
    while pos + 12 <= total:
        n_dims = read_i32()
        if n_dims < 1 or n_dims > 2:
            raise ValueError(f"{path}: bad tensor n_dims={n_dims} at offset {pos - 4}")
        name_len = read_i32()
        dtype = read_i32()
        ne = [read_i32() for _ in range(n_dims)]
        name = bytes(buf[pos : pos + name_len]).decode("utf-8")
        pos += name_len
        pos = (pos + ALIGNMENT - 1) // ALIGNMENT * ALIGNMENT

        if dtype in _QUANT_KINDS:
            from llamago_tpu.checkpoint.quant_file import QuantTensor, row_bytes

            kind = _QUANT_KINDS[dtype]
            in_dim, out_dim = ne[0], (ne[1] if n_dims == 2 else 1)
            rb = row_bytes(kind, in_dim)
            nbytes = out_dim * rb
            raw = buf[pos : pos + nbytes].reshape(out_dim, rb)
            pos += nbytes
            tensors[name] = QuantTensor(kind=kind, raw=np.asarray(raw),
                                        shape=(out_dim, in_dim))
            continue
        np_dtype = _DTYPE_TO_NP.get(dtype)
        if np_dtype is None:
            raise ValueError(f"{path}: tensor '{name}' has unsupported dtype {dtype}")
        count = int(np.prod(ne))
        nbytes = count * np.dtype(np_dtype).itemsize
        data = buf[pos : pos + nbytes].view(np_dtype)
        pos += nbytes
        # file ne[0] is the fastest dim -> numpy shape is reversed(ne)
        tensors[name] = data.reshape(tuple(reversed(ne)))

    # vocab-only files (convert --vocab-only, reference:
    # convert-pth-to-ggml.py:243-252) legitimately carry zero tensors
    if tensors:
        missing = set(expected_tensor_names(n_layers)) - set(tensors)
        if missing:
            raise ValueError(
                f"{path}: missing tensors: {sorted(missing)[:5]}...")

    # ftype -> weight storage (llama.cpp codes: 0 f32, 1 f16, 2 Q4_0,
    # 3 Q4_1, 7 Q8_0)
    weight_dtype = {0: "float32", 1: "bfloat16", 2: "int4", 3: "int4", 7: "int8"}.get(
        ftype, "bfloat16"
    )
    # The v1 header predates GQA and non-default RoPE: n_kv_heads and the
    # FFN width are INFERRED from tensor shapes (shape facts, so LLaMA-2
    # 70B / LLaMA-3 files round-trip correctly; the reference loader
    # would mis-load them as MHA), and rope_theta rides an optional
    # sidecar written by our converter (see read/write_meta_sidecar) so
    # reference-produced files stay byte-compatible.
    head_dim = dim // n_heads
    n_kv_heads = None
    ffn_dim = None
    wk = tensors.get("layers.0.attention.wk.weight")
    if wk is not None:
        kv_out = wk.shape[0]  # [out, in] layout
        if kv_out % head_dim == 0 and kv_out // head_dim != n_heads:
            n_kv_heads = kv_out // head_dim
    w1 = tensors.get("layers.0.feed_forward.w1.weight")
    if w1 is not None:
        ffn_dim = int(w1.shape[0])
    extra = read_meta_sidecar(path)
    config = ModelConfig(
        vocab_size=vocab_size,
        dim=dim,
        n_layers=n_layers,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        ffn_dim=ffn_dim,
        multiple_of=multiple_of,
        max_seq_len=max_seq_len,
        weight_dtype=weight_dtype,
        rope_theta=float(extra.get("rope_theta", 10000.0)),
        norm_eps=float(extra.get("norm_eps", 1e-5)),
    )
    return GGJTCheckpoint(config=config, vocab=vocab, tensors=tensors, ftype=ftype)


def sidecar_path(path: str) -> str:
    return path + ".meta.json"


def read_meta_sidecar(path: str) -> dict:
    """Optional `<model>.bin.meta.json` with fields the v1 header cannot
    carry (rope_theta, norm_eps). Absent for reference-produced files."""
    import json
    import os

    p = sidecar_path(path)
    if not os.path.exists(p):
        return {}
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def write_meta_sidecar(path: str, config: ModelConfig) -> None:
    """Write the sidecar only when the config departs from v1 defaults."""
    import json

    extra = {}
    if config.rope_theta != 10000.0:
        extra["rope_theta"] = config.rope_theta
    if config.norm_eps != 1e-5:
        extra["norm_eps"] = config.norm_eps
    if extra:
        with open(sidecar_path(path), "w", encoding="utf-8") as f:
            json.dump(extra, f)


def write_ggjt(
    path: str,
    config: ModelConfig,
    vocab: Vocab,
    tensors: dict[str, np.ndarray],
    ftype: int | None = None,
) -> None:
    """Emit a ggjt v1 file byte-compatible with the reference loader.

    Tensors must be in the file's row-major layout ([out, in] for 2-D),
    dtype float32 or float16. Mirrors write_header/write_tokens/
    process_and_write_variables (reference: scripts/convert-pth-to-ggml.py:109-232)
    for the single-part case.
    """
    if ftype is None:
        ftype = 1 if any(t.dtype == np.float16 for t in tensors.values()) else 0
    with open(path, "wb") as f:
        write_header_and_vocab(f, config, vocab, ftype)
        for name, arr in tensors.items():
            if hasattr(arr, "kind"):  # QuantTensor
                dtype = _KIND_TO_DTYPE[arr.kind]
                ne = [arr.shape[1], arr.shape[0]]  # (in, out)
                payload = np.ascontiguousarray(arr.raw)
                ndim = 2
            else:
                arr = np.ascontiguousarray(arr)
                dtype = _NP_TO_DTYPE[arr.dtype]
                ne = list(reversed(arr.shape))
                payload = arr
                ndim = arr.ndim
            write_tensor_meta(f, name, ndim, ne, dtype)
            f.write(payload.tobytes())


def write_header_and_vocab(f, config: ModelConfig, vocab: Vocab, ftype: int) -> None:
    """File header + scored vocab (shared by the in-RAM writer above and
    the streaming converter, checkpoint/convert.py)."""
    f.write(
        struct.pack(
            "<9i",
            GGJT_MAGIC,
            GGJT_VERSION,
            config.vocab_size,
            config.dim,
            config.multiple_of,
            config.n_heads,
            config.n_layers,
            config.head_dim,  # rot, obsolete
            ftype,
        )
    )
    # The reader trusts the header's vocab_size to count entries, so the
    # two must agree. GGUF inputs can carry embeddings padded past the
    # tokenizer list (vocab_size from llama.vocab_size/emb rows): pad the
    # vocab with unreachable scored pieces rather than emit a misparsing
    # file. A vocab LONGER than the header is unrepresentable — fail.
    tokens = list(vocab.tokens)
    if len(tokens) > config.vocab_size:
        raise ValueError(
            f"vocab has {len(tokens)} pieces but header vocab_size is "
            f"{config.vocab_size}; ggjt cannot represent the overflow"
        )
    tokens += [(f"<pad{i}>".encode(), -1e9)
               for i in range(config.vocab_size - len(tokens))]
    for piece, score in tokens:
        f.write(struct.pack("<i", len(piece)))
        f.write(piece)
        f.write(struct.pack("<f", score))


def write_tensor_meta(f, name: str, ndim: int, ne: list[int], dtype: int) -> None:
    """Tensor header + alignment pad; leaves the file positioned at the
    tensor's data offset."""
    sname = name.encode("utf-8")
    f.write(struct.pack("<3i", ndim, len(sname), dtype))
    for d in ne:
        f.write(struct.pack("<i", d))
    f.write(sname)
    off = f.tell()
    f.write(b"\x00" * (-off % ALIGNMENT))
