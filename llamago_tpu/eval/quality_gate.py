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
    for name in ["README.md", "SURVEY.md", "BASELINE.md", "PAPERS.md",
                 "SNIPPETS.md", "docs/SERVING.md", "docs/QUANTIZATION.md",
                 "docs/PARALLELISM.md"]:
        p = os.path.join(root, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                parts.append(f.read())
    text = "\n\n".join(parts)
    # 70/30: >=20k held-out tokens so a 0.1-ppl gate has statistical
    # teeth (the r2 artifact's 6.2k-token eval could not distinguish a
    # real INT4 regression from noise — VERDICT r2 #4)
    cut = int(len(text) * 0.7)
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
             kinds: tuple[str, ...] = ("q8_0", "q4_0", "q4_1"),
             dim: int = 256, n_layers: int = 6,
             fused: bool | None = None) -> dict:
    """Gate the quantized SERVING path end-to-end.

    `fused=True` (auto when on TPU) additionally evaluates every
    quantized checkpoint through the production device path: bf16
    compute with int8/int4 leaves resident on device, which routes
    matmuls through the fused Pallas dequant kernel (ops/kernels.py —
    bf16-stored scales, in-kernel unpack, f32 dot). The r2 gate only
    exercised the f32 jnp dequant path, leaving the kernel's own
    arithmetic outside the <=0.1-ppl gate (VERDICT r2 #4). Deltas for
    the fused rows are taken against the dense checkpoint evaluated at
    the same bf16 compute dtype, so they isolate quantization+kernel
    error, not bf16-vs-f32 compute error.
    """
    import jax

    from llamago_tpu.checkpoint.ggjt import read_ggjt, write_ggjt
    from llamago_tpu.checkpoint.params import export_ggjt_tensors, load_parameters
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt
    from llamago_tpu.eval.perplexity import perplexity

    if fused is None:
        fused = jax.default_backend() == "tpu"
    os.makedirs(tmp_dir, exist_ok=True)
    train_text, eval_text = _corpus()
    train_ids, eval_ids = _byte_ids(train_text), _byte_ids(eval_text)
    vocab = byte_vocab()
    config = ModelConfig(
        vocab_size=len(vocab), dim=dim, n_layers=n_layers,
        n_heads=max(4, dim // 32), multiple_of=32, max_seq_len=ctx,
        dtype="float32", weight_dtype="float32",
    )
    params = train_byte_lm(config, train_ids, steps=steps, batch=batch)

    # export through the real file pipeline
    f32_path = os.path.join(tmp_dir, "model-f32.bin")
    write_ggjt(f32_path, config, vocab, export_ggjt_tensors(config, params),
               ftype=0)

    def ppl_of(path: str, compute: str = "float32", kv: str = "auto",
               weight_dtype: str | None = None) -> float:
        ckpt = read_ggjt(path, max_seq_len=ctx)
        cfg = ckpt.config.replace(dtype=compute, max_seq_len=ctx, kv_dtype=kv)
        if weight_dtype is not None:  # quantize dense leaves at load
            cfg = cfg.replace(weight_dtype=weight_dtype)
        p = load_parameters(cfg, ckpt.tensors)
        return perplexity(p, cfg, eval_ids, ctx=ctx)["ppl"]

    results = {"fp32": ppl_of(f32_path)}
    qpaths = {}
    for kind in kinds:
        qpath = os.path.join(tmp_dir, f"model-{kind}.bin")
        quantize_ggjt(f32_path, qpath, kind=kind)
        qpaths[kind] = qpath
        results[kind] = ppl_of(qpath)
    # the int8 KV cache row isolates CACHE quantization error: dense f32
    # weights, quantized cache (runtime/kv_cache.py, --kv-dtype int8)
    results["kv_int8"] = ppl_of(f32_path, kv="int8")

    deltas = {k: results[k] - results["fp32"] for k in (*kinds, "kv_int8")}
    out = {
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
        "gate_kv_int8_pass": bool(deltas.get("kv_int8", 9e9) <= 0.1),
    }
    if fused:
        from llamago_tpu.ops import kernels as _kernels
        from llamago_tpu.ops.quant import _INT4_EXEC_ENV

        saved_exec = os.environ.get(_INT4_EXEC_ENV)
        saved_a8 = _kernels._W4X8_A8_MAX_M
        try:
            # ggml-exact exec for the file-format rows (the loader would
            # otherwise auto-upgrade q4_0 leaves to w4x8 on TPU)
            os.environ[_INT4_EXEC_ENV] = "q4_0"
            fres = {"dense_bf16": ppl_of(f32_path, compute="bfloat16")}
            for kind in kinds:
                fres[kind] = ppl_of(qpaths[kind], compute="bfloat16")
            fkeys = list(kinds)
            if "q4_0" in qpaths:
                # w4x8 exec rows — what int4 SERVING actually runs on TPU
                # (ops/kernels.py): "w4x8" = the prefill/stream numerics
                # (group-128 requant of the Q4_0 blocks, exact kernel
                # arithmetic); "w4x8_a8" forces every matmul through the
                # W4A8 decode kernel (per-(row,128-group) int8 activation
                # quantization + int8 MXU dots) so the decode-path error
                # is gated, not just the teacher-forced prefill path.
                os.environ[_INT4_EXEC_ENV] = "w4x8"
                fres["w4x8"] = ppl_of(qpaths["q4_0"], compute="bfloat16")
                _kernels._W4X8_A8_MAX_M = 4096
                fres["w4x8_a8"] = ppl_of(qpaths["q4_0"], compute="bfloat16")
                # dense -> w4x8 directly (one rounding step): the path a
                # user quantizing a real f32/f16 checkpoint takes; the
                # rows above measure the worst case (re-quantizing an
                # already-Q4_0 file, two rounding steps)
                fres["w4x8_direct"] = ppl_of(f32_path, compute="bfloat16",
                                             weight_dtype="int4")
                fkeys += ["w4x8", "w4x8_a8", "w4x8_direct"]
        finally:
            _kernels._W4X8_A8_MAX_M = saved_a8
            if saved_exec is None:
                os.environ.pop(_INT4_EXEC_ENV, None)
            else:
                os.environ[_INT4_EXEC_ENV] = saved_exec
        fdeltas = {k: fres[k] - fres["dense_bf16"] for k in fkeys}
        out["fused"] = {
            "backend": jax.default_backend(),
            "fused": jax.default_backend() == "tpu",
            "compute_dtype": "bfloat16",
            "ppl": {k: round(v, 4) for k, v in fres.items()},
            "ppl_delta_vs_dense_bf16": {k: round(v, 4) for k, v in fdeltas.items()},
            "gate_int4_pass": bool(fdeltas.get("q4_0", 9e9) <= 0.1),
            "gate_w4x8_pass": bool(fdeltas.get("w4x8_a8", 9e9) <= 0.1),
        }
    return out


def run_gate_on_checkpoint(model_path: str, ctx: int = 512,
                           tmp_dir: str = "/tmp/llamago_quality_gate",
                           kinds: tuple[str, ...] = ("q8_0", "q4_0", "q4_1"),
                           fused: bool | None = None) -> dict:
    """The same gate on a REAL dense checkpoint (ggjt or GGUF): quantize
    the given f32/f16 file with the production file quantizer and compare
    held-out perplexity, tokenizing the eval corpus with the checkpoint's
    own tokenizer. This is the `--model` escape hatch — run it the first
    time real LLaMA weights are reachable and record the numbers
    (BASELINE.md's WikiText-2 gate analogue)."""
    import jax

    from llamago_tpu.checkpoint import read_checkpoint
    from llamago_tpu.checkpoint.params import load_parameters
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt
    from llamago_tpu.eval.perplexity import perplexity

    if fused is None:
        fused = jax.default_backend() == "tpu"
    os.makedirs(tmp_dir, exist_ok=True)
    _, eval_text = _corpus()
    ckpt = read_checkpoint(model_path, max_seq_len=ctx)
    if ckpt.ftype not in (0, 1):
        raise ValueError(
            f"--model gate needs a dense f32/f16 checkpoint (ftype 0|1), "
            f"got ftype={ckpt.ftype}; quantized deltas are measured "
            f"against this base")
    from llamago_tpu.tokenizer import tokenize

    eval_ids = np.asarray(tokenize(ckpt.vocab, eval_text, bos=True), np.int32)

    def ppl_of(path: str, compute: str) -> float:
        c = read_checkpoint(path, max_seq_len=ctx)
        cfg = c.config.replace(dtype=compute, max_seq_len=ctx)
        p = load_parameters(cfg, c.tensors)
        return perplexity(p, cfg, eval_ids, ctx=ctx)["ppl"]

    compute = "bfloat16" if fused else "float32"
    results = {"dense": ppl_of(model_path, compute)}
    for kind in kinds:
        qpath = os.path.join(tmp_dir, f"real-{kind}.bin")
        quantize_ggjt(model_path, qpath, kind=kind)
        results[kind] = ppl_of(qpath, compute)
    deltas = {k: results[k] - results["dense"] for k in kinds}
    return {
        "metric": "quantization_ppl_gate_real",
        "model": os.path.basename(model_path),
        "backend": jax.default_backend(),
        "compute_dtype": compute,
        "eval_tokens": int(len(eval_ids)),
        "ctx": ctx,
        "ppl": {k: round(v, 4) for k, v in results.items()},
        "ppl_delta_vs_dense": {k: round(v, 4) for k, v in deltas.items()},
        "baseline_gate": "<=0.1 ppl delta at INT4 (BASELINE.md)",
        "gate_int4_pass": bool(deltas.get("q4_0", 9e9) <= 0.1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--fused", action="store_true", default=None,
                    help="also gate the bf16+Pallas device path "
                         "[auto-on when the backend is TPU]")
    ap.add_argument("--model", default=None,
                    help="gate a real dense checkpoint (ggjt/GGUF) instead "
                         "of the trained proxy")
    ap.add_argument("--out", default="bench_artifacts/quality_gate.json")
    args = ap.parse_args(argv)

    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:  # e.g. JAX_PLATFORMS names an unavailable plugin
        backend = ""
    if backend not in ("cpu", "tpu"):
        jax.config.update("jax_platforms", "cpu")
    if args.model:
        result = run_gate_on_checkpoint(args.model, ctx=args.ctx,
                                        fused=args.fused)
    else:
        result = run_gate(steps=args.steps, batch=args.batch, ctx=args.ctx,
                          dim=args.dim, n_layers=args.layers, fused=args.fused)
    # provenance stamp (same fields as bench.py artifacts)
    import subprocess
    import time as _time

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        ).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    result.update({
        "measured_at": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
        "git_rev": rev,
        "backend": jax.default_backend(),
    })
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
