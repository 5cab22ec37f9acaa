"""Model and generation configuration.

The reference keeps all of this in one struct, `ModelParams`
(reference: pkg/llama/llama.go:32-74), filled from CLI flags
(reference: main.go:332-382). Here it is split into the static model
architecture (ModelConfig — hparams read from the checkpoint header,
reference: pkg/llama/llama.go:743-761) and per-request generation
settings (GenerateConfig).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class ModelConfig:
    """Static LLaMA architecture hyper-parameters.

    Mirrors the ggjt v1 header fields (reference: pkg/llama/llama.go:743-749)
    plus GQA / rope extensions the reference lacks (it supports LLaMA-1
    MHA only; Model struct reference: pkg/llama/llama.go:181-193).
    """

    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    # Grouped-query attention (LLaMA-2 70B+). None => MHA (n_kv_heads == n_heads).
    n_kv_heads: int | None = None
    multiple_of: int = 256
    # Explicit FFN hidden size override. None => LLaMA-1 formula below.
    ffn_dim: int | None = None
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # Max sequence length the KV cache is allocated for ("--context",
    # reference default 1024: main.go:371-373).
    max_seq_len: int = 1024
    # Compute dtype on device. The reference computes everything in FP32
    # (pkg/ml/ml.go: only F32 compute exists); on TPU bf16 is the native
    # MXU dtype, so that is the default. "float32" gives a parity mode.
    dtype: str = "bfloat16"
    # Weight storage: "float32" | "bfloat16" | "int8" | "int4"
    # (int8/int4 are Q8_0/Q4_0-style block-32 weight-only quantization).
    weight_dtype: str = "bfloat16"
    # KV-cache storage: "auto" (= compute dtype) | "bfloat16" | "float32"
    # | "int8" (per-row quantized — halves cache HBM/footprint and speeds
    # cache-bound decode; see runtime/kv_cache.py). The reference's cache
    # is always F32 (pkg/llama/llama.go:92-103).
    kv_dtype: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def ffn_hidden(self) -> int:
        """FFN hidden size.

        LLaMA-1 formula, exactly as the reference computes it from the
        header (reference: pkg/llama/llama.go:761):
            ((2*(4*dim)/3 + multiple_of - 1) // multiple_of) * multiple_of
        """
        if self.ffn_dim is not None:
            return self.ffn_dim
        m = self.multiple_of
        return ((2 * (4 * self.dim) // 3 + m - 1) // m) * m

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


# Named architecture presets. The reference only distinguishes model sizes
# by an enum (pkg/llama/llama.go:161-170); full hparams come from the file
# header. These presets are for tests, benchmarks, and random-weight runs.
MODEL_PRESETS: dict[str, ModelConfig] = {
    # LLaMA-1 family (reference supports exactly these: README.md)
    "7B": ModelConfig(vocab_size=32000, dim=4096, n_layers=32, n_heads=32),
    "13B": ModelConfig(vocab_size=32000, dim=5120, n_layers=40, n_heads=40),
    "30B": ModelConfig(vocab_size=32000, dim=6656, n_layers=60, n_heads=52),
    "65B": ModelConfig(vocab_size=32000, dim=8192, n_layers=80, n_heads=64),
    # LLaMA-2 family (GQA at 70B) — beyond reference parity, required by
    # BASELINE.md config #4.
    "llama2-7B": ModelConfig(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                             max_seq_len=4096),
    "llama2-13B": ModelConfig(vocab_size=32000, dim=5120, n_layers=40, n_heads=40,
                              max_seq_len=4096),
    "llama2-70B": ModelConfig(vocab_size=32000, dim=8192, n_layers=80, n_heads=64,
                              n_kv_heads=8, ffn_dim=28672, max_seq_len=4096),
    # LLaMA-3 family (GQA everywhere, 128k vocab, rope theta 500k) — the
    # HF converter path handles these directly (GQA k/v unpermute +
    # rope_theta passthrough, checkpoint/convert.py).
    "llama3-8B": ModelConfig(vocab_size=128256, dim=4096, n_layers=32,
                             n_heads=32, n_kv_heads=8, ffn_dim=14336,
                             rope_theta=500000.0, max_seq_len=8192),
    "llama3-70B": ModelConfig(vocab_size=128256, dim=8192, n_layers=80,
                              n_heads=64, n_kv_heads=8, ffn_dim=28672,
                              rope_theta=500000.0, max_seq_len=8192),
    # Tiny configs for tests / CI (head_dim kept >= 8 so TPU tiling works).
    "tiny": ModelConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                        multiple_of=32, max_seq_len=128),
    "tiny-gqa": ModelConfig(vocab_size=512, dim=64, n_layers=2, n_heads=4,
                            n_kv_heads=2, multiple_of=32, max_seq_len=128),
}


@dataclass(frozen=True)
class GenerateConfig:
    """Per-request generation parameters.

    Field-for-field parity with the reference's sampling/loop knobs
    (defaults: reference main.go:70-93,352-382):
      --predict 512, --context 1024, --temp 0.5, topK 40, topP 0.95,
      repeatPenalty 1.10, repeatLastN = ctx, batch = ctx, KeepCount 0.
    """

    max_tokens: int = 512          # --predict (PredictCount)
    ctx_size: int = 1024           # --context (CtxSize)
    temp: float = 0.5              # --temp
    top_k: int = 40                # TopK (main.go:87)
    top_p: float = 0.95            # TopP (main.go:88)
    repeat_penalty: float = 1.10   # PenaltyRepeat (main.go:90)
    repeat_last_n: int = 1024      # PenaltyLastN = ctx (main.go:89)
    # stop SEQUENCES (beyond reference parity; OpenAI-style): generation
    # ends when any appears in the rendered output, which is truncated
    # at the first occurrence
    stop: tuple = ()
    batch_size: int = 1024         # BatchSize = ctx (main.go:86)
    keep_count: int = 0            # KeepCount (never set by ref CLI, llama.go:47)
    seed: int = -1                 # --seed; -1 => time-based
    # Stop at EOS. The reference never stops on EOS (it always generates
    # --predict tokens; server.go:153, EOS check only in dead code
    # main.go:233-235). Default False for parity; True is the sane mode.
    stop_at_eos: bool = False
    # Wall-clock job deadline in seconds; 0 disables. Implements the
    # reference's unwritten background watcher ("TODO: Background watcher
    # which will make the jobs obsolete after some deadline", server.go:55).
    deadline_s: float = 0.0

    def replace(self, **kw) -> "GenerateConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ServerConfig:
    """Serving-layer configuration.

    Parity with the reference's package-level server globals
    (reference: pkg/server/server.go:40-58) and CLI flags
    (main.go:24-41): --server/--host/--port/--pods/--threads.
    "Pods" (reference: N independent generation goroutines each with its
    own context, server.go:84-106) are reinterpreted TPU-natively as decode
    slots in one continuously-batched engine: same user-visible concurrency
    contract, one resident model.
    """

    host: str = "localhost"
    port: int = 8080
    max_pods: int = 1              # --pods => number of decode slots
    prefill_buckets: tuple[int, ...] = (32, 64, 128, 256, 512, 1024)
