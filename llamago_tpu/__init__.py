"""llamago_tpu — a TPU-native LLaMA inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gotzmann/llama.go (reference at /root/reference): ggjt checkpoint
ingestion, SentencePiece-BPE tokenization, the LLaMA transformer with a
static-shape KV cache, top-k/top-p/repeat-penalty sampling, a generation
engine with context-swap eviction, a CLI, and an async REST job API with
continuous batching — plus INT8/INT4 weight-only quantization fused into
Pallas matmul kernels and GSPMD tensor-parallel sharding, which the
reference lacks.

Layer map (vs. SURVEY.md §1):
  cli.py                  <- reference main.go (C1)
  server/                 <- reference pkg/server (C2/C3/C4/C9)
  models/, runtime/       <- reference pkg/llama (C5/C7/C8)
  ops/                    <- reference pkg/ml compute (C6/C11-C14)
  ops/kernels_*.py        <- reference SIMD layer (C15) as Pallas kernels
  checkpoint/             <- reference loader + scripts/convert (C7/C18)
  parallel/               <- (new) GSPMD mesh/sharding layer
  native/                 <- (new) C++ checkpoint streaming/quantization
"""

__version__ = "0.1.0"

from llamago_tpu.config import ModelConfig, GenerateConfig  # noqa: F401
