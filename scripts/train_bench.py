"""QLoRA fine-tuning throughput on one TPU chip.

The reference's training story is a never-executed backward pass
(reference: pkg/ml/ml.go:1118-1340); this framework trains for real, so
record what that costs: a 7B INT8 frozen base + rank-r adapters, the
production lora_train_step (frozen quantized weights stream through the
fused dequant kernel's custom VJP; optimizer moments exist only for
adapters). Prints one JSON line with steps/s and tokens/s.

Run: python scripts/train_bench.py   (env: TB_MODEL/TB_BATCH/TB_SEQ/TB_RANK)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llamago_tpu.checkpoint.params import random_quantized_parameters
from llamago_tpu.config import MODEL_PRESETS
from llamago_tpu.models import lora


def main():
    on_tpu = jax.default_backend() == "tpu"
    model = os.environ.get("TB_MODEL", "7B" if on_tpu else "tiny")
    batch = int(os.environ.get("TB_BATCH", "4" if on_tpu else "2"))
    seq = int(os.environ.get("TB_SEQ", "512" if on_tpu else "32"))
    rank = int(os.environ.get("TB_RANK", "8"))
    steps = int(os.environ.get("TB_STEPS", "10" if on_tpu else "2"))
    cfg = MODEL_PRESETS[model].replace(
        dtype="bfloat16" if on_tpu else "float32",
        weight_dtype="int8", max_seq_len=seq)

    params = random_quantized_parameters(cfg, seed=0, layered=True)
    params = lora.init_lora(params, rank=rank, alpha=16.0, seed=0)
    opt_state = lora.init_lora_opt_state(params)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (batch, seq)),
        jnp.int32)

    t0 = time.time()
    params, opt_state, loss = lora.lora_train_step(params, opt_state,
                                                   tokens, cfg)
    np.asarray(loss)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        params, opt_state, loss = lora.lora_train_step(params, opt_state,
                                                       tokens, cfg)
    np.asarray(loss)
    dt = (time.time() - t0) / steps
    print(json.dumps({
        "metric": f"qlora_train_step_{model}_int8_r{rank}",
        "value": round(batch * seq / dt, 1),
        "unit": "train tokens/s",
        "ms_per_step": round(dt * 1e3, 1),
        "batch": batch, "seq": seq, "rank": rank,
        "compile_s": round(compile_s, 1),
        "loss": float(np.asarray(loss)),
    }))


if __name__ == "__main__":
    main()
