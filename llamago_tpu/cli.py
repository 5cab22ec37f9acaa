"""CLI entry point.

Flag parity with the reference CLI (reference: main.go:24-41, defaults
main.go:352-382): --prompt --model --server --host --port --pods
--threads --context --predict --temp --silent --chat --dir --profile.
The reference's --avx/--neon CPU toggles have no TPU meaning; their
analogue is --dtype/--weight-dtype (bf16/int8/int4 compute paths).

Like the reference, the one-shot flow goes through the job machinery and
streams output as it grows (main.go:112-147 places a job and polls every
100ms); here the engine streams tokens via its own loop.

Subcommands:
  load     download a model file (reference: main.go:57-66, 435-463)
  convert  PyTorch/HF checkpoint -> ggjt (reference: scripts/convert-pth-to-ggml.py)
"""

from __future__ import annotations

from llamago_tpu.utils import colorize, log

import argparse
import os
import sys
import time

LOGO = r"""
  _ _                                        _
 | | | __ _ _ __ ___   __ _        __ _  ___| |_ _ __  _   _
 | | |/ _` | '_ ` _ \ / _` |_____ / _` |/ _ \ __| '_ \| | | |
 | | | (_| | | | | | | (_| |_____| (_| | (_) | |_| |_) | |_| |
 |_|_|\__,_|_| |_| |_|\__,_|      \__, |\___/ \__| .__/ \__,_|
                                  |___/          |_|
 TPU-native LLaMA inference  (JAX / XLA / Pallas)
"""


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="llamago-tpu", description="TPU-native LLaMA inference framework"
    )
    p.add_argument("command", nargs="?", default=None,
                   help="optional subcommand: load | convert | quantize | "
                        "perplexity | finetune")
    p.add_argument("--file", default="", help="text file for `perplexity`/`finetune`")
    p.add_argument("--out", default="", help="output path for `quantize`/`convert`")
    p.add_argument("--vocab-only", action="store_true",
                   help="`convert`: write only the scored vocab, no tensors "
                        "(reference: scripts/convert-pth-to-ggml.py:77-82)")
    p.add_argument("--qkind", default="", choices=["", "q8_0", "q4_0", "q4_1"],
                   help="quantization kind for `quantize` (overrides --bits)")
    p.add_argument("--bits", type=int, default=8, choices=[4, 8],
                   help="bit width for `quantize` [8]")
    # --- reference flag parity (main.go:24-41)
    p.add_argument("--prompt", default="", help="text prompt to feed the model")
    p.add_argument("--model", default="", help="path of converted .bin ggjt model")
    p.add_argument("--server", action="store_true", help="start REST API server mode")
    p.add_argument("--host", default="localhost", help="server host [localhost]")
    p.add_argument("--port", type=int, default=8080, help="server port [8080]")
    p.add_argument("--pods", type=int, default=1,
                   help="parallel decode slots in server mode [1]")
    p.add_argument("--threads", type=int, default=0,
                   help="host CPU threads for the native data path "
                        "(checkpoint IO / quantization) [0 = all cores]; "
                        "TPU compute does not use it")
    p.add_argument("--context", type=int, default=1024, help="context size [1024]")
    p.add_argument("--predict", type=int, default=512, help="tokens to predict [512]")
    p.add_argument("--temp", type=float, default=0.5, help="temperature [0.5]")
    p.add_argument("--silent", action="store_true", help="hide logo and extra output")
    p.add_argument("--chat", action="store_true", help="interactive chat mode")
    p.add_argument("--dir", default=".", help="download dir for `load`")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace into ./profile/")
    # accepted for drop-in compatibility with llama.go invocations
    # (main.go:39-40); SIMD selection is XLA's job on TPU
    p.add_argument("--avx", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--neon", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--debug", action="store_true",
                   help="runtime guards: jax NaN checking + engine "
                        "invariant asserts (utils/debug.py)")
    # --- sampling knobs (reference hardcodes these, main.go:87-90)
    p.add_argument("--topk", type=int, default=40)
    p.add_argument("--topp", type=float, default=0.95)
    p.add_argument("--repeat-penalty", type=float, default=1.10)
    p.add_argument("--repeat-last-n", type=int, default=0,
                   help="penalty window [default: context size]")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--stop-at-eos", action="store_true",
                   help="stop at EOS (the reference never does; parity default off)")
    # --- TPU-native knobs (no reference equivalent)
    p.add_argument("--dtype", default=None,
                   choices=["bfloat16", "float32"],
                   help="compute dtype [default: bfloat16 on TPU, "
                        "float32 elsewhere]")
    p.add_argument("--weight-dtype", default=None,
                   choices=["bfloat16", "float32", "int8", "int4"],
                   help="weight storage [default: same as --dtype]")
    p.add_argument("--kv-dtype", default="auto",
                   choices=["auto", "bfloat16", "float32", "int8"],
                   help="KV-cache storage [auto = compute dtype]; int8 "
                        "halves cache HBM (2x contexts/slots per chip) "
                        "and speeds cache-bound decode")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel size [0 = all local devices]")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel size (decode-slot replication) [1]")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel size (KV cache sharded along "
                        "positions; long-context scaling) [1]")
    p.add_argument("--chunk", type=int, default=0,
                   help="on-device decode chunk size (tokens per host sync) "
                        "[0 = auto: 32 on TPU, 1 elsewhere]")
    p.add_argument("--spec", action="store_true",
                   help="prompt-lookup speculative decoding for greedy "
                        "(temp 0) requests — lossless, often 2x+ tokens/s")
    p.add_argument("--prefill-buckets", default="",
                   help="comma-separated prefill pad lengths "
                        "[default: 16,32,...,4096 capped at --context]")
    p.add_argument("--prefill-chunk", type=int, default=256,
                   help="max prompt tokens absorbed per engine step — long "
                        "admissions interleave with decode at this "
                        "granularity [256]")
    p.add_argument("--draft", type=int, default=7,
                   help="speculative draft length [7]")
    # --- LoRA fine-tuning (`finetune` subcommand; models/lora.py). The
    # reference's training story is an unexecuted backward pass + V3
    # roadmap item (pkg/ml/ml.go:1118-1340, README.md:61).
    p.add_argument("--rank", type=int, default=8, help="LoRA rank [8]")
    p.add_argument("--lora-alpha", type=float, default=16.0,
                   help="LoRA alpha (scale = alpha/rank) [16]")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="finetune learning rate [1e-3]")
    p.add_argument("--steps", type=int, default=100,
                   help="finetune optimizer steps [100]")
    p.add_argument("--train-batch", type=int, default=2,
                   help="finetune batch size (sequences/step) [2]")
    p.add_argument("--seq", type=int, default=256,
                   help="finetune sequence length [256, capped by --context]")
    p.add_argument("--lora", default="",
                   help="adapters .npz to apply at load (merged into the "
                        "weights, so serving speed is unchanged)")
    # multi-host (jax.distributed): every host runs the same command; on
    # TPU pods the topology auto-discovers, so just pass --multihost.
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed before touching devices")
    p.add_argument("--coordinator", default="",
                   help="coordinator address host:port (manual fleets; "
                        "TPU pods auto-discover)")
    p.add_argument("--nprocs", type=int, default=0,
                   help="total process count for --coordinator mode")
    p.add_argument("--procid", type=int, default=-1,
                   help="this process's id for --coordinator mode")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.threads > 0:
        # consumed by the native C++ data path (native/__init__.py)
        os.environ["LLAMAGO_THREADS"] = str(args.threads)

    if not args.silent:
        colorize("[magenta]" + LOGO)

    if args.command == "load":
        return cmd_load(args)
    if args.command == "convert":
        return cmd_convert(args)
    if args.command == "perplexity":
        return cmd_perplexity(args)
    if args.command == "quantize":
        return cmd_quantize(args)
    if args.command == "finetune":
        return cmd_finetune(args)
    if args.command is not None:
        print(f"unknown command: {args.command}", file=sys.stderr)
        return 2

    if not args.model:
        print("error: --model is required (or use the `load`/`convert` commands)",
              file=sys.stderr)
        return 2

    if getattr(args, "debug", False):
        from llamago_tpu.utils.debug import enable_debug_checks

        enable_debug_checks()

    if args.multihost or args.coordinator:
        from llamago_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator=args.coordinator or None,
            num_processes=args.nprocs or None,
            process_id=args.procid if args.procid >= 0 else None,
        )

    profiler = None
    if args.profile:
        import jax

        os.makedirs("profile", exist_ok=True)
        jax.profiler.start_trace("profile")
        profiler = jax

    try:
        return run(args)
    finally:
        if profiler is not None:
            profiler.profiler.stop_trace()
            if not args.silent:
                print("\n[PROF] trace written to ./profile (view with xprof/tensorboard)")


def _load_engine(args):
    """Load checkpoint -> device params -> engine. Heavy imports live here
    so --help stays instant."""
    import jax

    from llamago_tpu.checkpoint import load_parameters, read_checkpoint
    from llamago_tpu.runtime.engine import Engine

    def _tunneled_tpu() -> bool:
        # the experimental 'axon' remote-TPU plugin compiles on a helper
        # machine; cached XLA:CPU entries then reload with mismatched
        # host features and can SIGILL — no persistent cache there
        from llamago_tpu.utils.transport import is_tunneled_tpu

        return is_tunneled_tpu()

    if jax.default_backend() == "tpu" and not _tunneled_tpu():
        # persistent XLA compile cache: server/CLI restarts skip
        # recompilation (cold 7B compiles cost minutes; warm loads are
        # seconds). Override dir via LLAMAGO_XLA_CACHE.
        cache_dir = os.environ.get(
            "LLAMAGO_XLA_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "llamago_tpu", "xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.dtype is None:
        # auto: bf16 is the MXU dtype on TPU; on CPU it is emulated
        # (slower than f32) and XLA:CPU's thunk runtime cannot even
        # execute the bf16xbf16->f32 dots the speculative-decode scan
        # compiles to ("Unsupported element type for DotThunk"), so f32
        # is both the faster and the only working CPU default. An
        # explicit --dtype is honored either way.
        args.dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    t0 = time.time()
    if not args.silent:
        log("info", f"loading model {args.model} ...")
    # magic-sniffing loader: ggjt v1 or GGUF (llama.cpp ecosystem)
    ckpt = read_checkpoint(args.model, max_seq_len=args.context)
    file_quantized = ckpt.ftype in (2, 3, 7)  # Q4_0 / Q4_1 / Q8_0
    config = ckpt.config.replace(
        dtype=args.dtype,
        # a pre-quantized file dictates the weight storage
        weight_dtype=(ckpt.config.weight_dtype if file_quantized
                      else args.weight_dtype or args.dtype),
        kv_dtype=args.kv_dtype,
        max_seq_len=args.context,
    )
    shardings = None
    n_dev = len(jax.devices())  # global count under jax.distributed
    dp = max(args.dp, 1)
    sp = max(getattr(args, "sp", 1), 1)
    tp = args.tp if args.tp > 0 else n_dev // (dp * sp)
    if tp * dp * sp > 1:
        from llamago_tpu.parallel import make_mesh, param_shardings
        from llamago_tpu.parallel.tp_kernels import activate_mesh

        mesh = make_mesh(tp=tp, dp=dp, sp=sp)
        shardings = param_shardings(config, mesh)
        # fused Pallas kernels run per-shard via shard_map under the mesh
        # (parallel/tp_kernels.py); global-value fusion stays off.
        activate_mesh(mesh)
    params = load_parameters(config, ckpt.tensors, shardings=shardings)
    if tp * dp * sp <= 1:
        # single-chip fast path: unstack to per-layer weights (the fused
        # Pallas kernels read them straight from HBM, and the unrolled
        # forward compiles far faster than the scan graph) and fuse the
        # QKV/W13 projections. Under TP the weights stay stacked and
        # unfused (concatenated outputs would shard across segment
        # boundaries) and lower through XLA's partitioner.
        from llamago_tpu.checkpoint.params import (
            fuse_layer_weights,
            unstack_layer_params,
        )

        params = fuse_layer_weights(unstack_layer_params(params, config.n_layers))
    if getattr(args, "lora", ""):
        # merge saved adapters into the weights at load: serving runs the
        # plain fused-kernel path afterwards, zero per-step overhead
        from llamago_tpu.models.lora import attach_lora, load_lora, merge_lora

        params = merge_lora(attach_lora(params, load_lora(args.lora)))
        if not args.silent:
            log("info", f"merged LoRA adapters from {args.lora}")
    jax.block_until_ready(jax.tree.leaves(params)[0])
    if not args.silent:
        log("info", f"model ready in {time.time() - t0:.1f}s",
            layers=config.n_layers, dim=config.dim,
            weights=config.weight_dtype, tp=tp)
    # 32 measured best on BOTH axes vs 16 at 7B int8 serving (160 vs
    # 136 tok/s, TTFT p50 174 vs 189 ms); 64 trades TTFT for peak
    # throughput (173 tok/s / 207 ms) — see bench_artifacts
    chunk = args.chunk or (32 if jax.default_backend() == "tpu" else 1)
    kwargs = {}
    if getattr(args, "prefill_buckets", ""):
        kwargs["buckets"] = tuple(
            sorted(int(b) for b in args.prefill_buckets.split(","))
        )
    engine = Engine(config, params, ckpt.vocab, slots=args.pods,
                    decode_chunk_size=chunk, speculative=args.spec,
                    draft_len=args.draft,
                    prefill_chunk=getattr(args, "prefill_chunk", 256),
                    **kwargs)
    return engine, ckpt, config


def _gen_config(args):
    from llamago_tpu.config import GenerateConfig

    return GenerateConfig(
        max_tokens=args.predict,
        ctx_size=args.context,
        temp=args.temp,
        top_k=args.topk,
        top_p=args.topp,
        repeat_penalty=args.repeat_penalty,
        repeat_last_n=args.repeat_last_n or args.context,
        seed=args.seed,
        stop_at_eos=args.stop_at_eos or args.chat,
    )


def run(args) -> int:
    engine, ckpt, config = _load_engine(args)
    gen = _gen_config(args)

    if args.server:
        import jax

        from llamago_tpu.config import ServerConfig
        from llamago_tpu.server.api import JobServer

        multi = jax.process_count() > 1
        from llamago_tpu.parallel.multihost import is_primary

        server = None
        if not multi or is_primary():
            # only process 0 owns the HTTP frontend; replicas run the
            # lockstep tick and make the identical jitted calls
            server = JobServer(
                engine,
                ServerConfig(host=args.host, port=args.port,
                             max_pods=args.pods,
                             prefill_buckets=engine.buckets),
                gen,
                model_name=os.path.basename(args.model),
            )
        warm_s = engine.warmup()
        if not args.silent:
            log("info", f"engine warm in {warm_s:.1f}s "
                        "(prefill buckets + decode step compiled)")
            if server is not None:
                log("info", f"listening on http://{args.host}:{args.port}",
                    pods=args.pods)
        try:
            if multi:
                from llamago_tpu.parallel.multihost import serve_lockstep

                serve_lockstep(engine, server)
            else:
                server.serve_forever()
        except KeyboardInterrupt:
            if server is not None:
                server.shutdown()
        return 0

    if args.chat:
        return run_chat(engine, gen, args)

    if not args.prompt:
        print("error: --prompt is required (or --server / --chat)", file=sys.stderr)
        return 2
    return run_oneshot(engine, gen, args)


def run_oneshot(engine, gen, args) -> int:
    """One-shot generation with streamed output (parity with the CLI's
    job-poll loop, main.go:131-147) and the end-of-job performance report
    (server.go:244-274)."""
    from llamago_tpu.runtime.engine import JobStatus

    job = engine.submit(args.prompt, gen)
    shown = 0
    print(args.prompt, end="", flush=True)
    while job.status in (JobStatus.QUEUED, JobStatus.PROCESSING):
        engine.step()
        out = job.output
        if len(out) > shown:
            print(out[shown:], end="", flush=True)
            shown = len(out)
    if len(job.output) > shown:
        print(job.output[shown:], end="", flush=True)
    print()
    if job.status == JobStatus.FAILED:
        log("error", job.error)
        return 1
    if not args.silent:
        _report(job)
    return 0


def run_chat(engine, gen, args) -> int:
    """Interactive chat: the reference declares --chat but never wires it
    (main.go:36,78 feed an unused param); here it works — and it CARRIES
    the conversation: each turn submits history+reply+new input, so the
    engine's per-slot prefix cache re-prefills only the new suffix
    (runtime/engine.py admission). History trims oldest-first when it
    approaches the context budget."""
    from llamago_tpu.runtime.engine import JobStatus

    print("[CHAT] interactive mode — empty line or Ctrl-D to exit\n")
    history = ""
    while True:
        try:
            prompt = input("user> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not prompt.strip():
            return 0
        if len(prompt) + 1 >= gen.ctx_size:
            print(f"[chat] input of {len(prompt)} chars exceeds the "
                  f"context ({gen.ctx_size}) — not sent", file=sys.stderr)
            continue
        # char-level trim to HALF the context: headroom for the reply and
        # for tokenization expanding past 1 token/char (byte fallback on
        # multi-byte chars); the engine re-checks in tokens at admission
        # and the FAILED branch below recovers if this still overflows
        budget = max(len(prompt) + 2, gen.ctx_size // 2)
        full = history + prompt
        while history and len(full) + 1 >= budget:
            history = history[max(1, len(history) // 2):]  # always shrinks
            full = history + prompt
        job = engine.submit(full, gen)
        shown = 0
        print("model> ", end="", flush=True)
        while job.status in (JobStatus.QUEUED, JobStatus.PROCESSING):
            engine.step()
            if len(job.output) > shown:
                print(job.output[shown:], end="", flush=True)
                shown = len(job.output)
        print(job.output[shown:] if len(job.output) > shown else "")
        if job.status == JobStatus.FAILED:
            print(f"[chat] turn failed: {job.error}", file=sys.stderr)
            if "too long" in job.error or "does not fit" in job.error:
                # char trim under-counted tokens: drop the conversation
                # so the next turn starts clean instead of wedging
                history = ""
                print("[chat] history cleared", file=sys.stderr)
            continue
        history = full + " " + job.output + "\n"


def _report(job) -> None:
    """Per-job performance table (parity: server.go:244-274)."""
    n = len(job.output_tokens)
    avg_eval = sum(job.eval_ms) / max(len(job.eval_ms), 1)
    avg_sample = sum(job.sample_ms) / max(len(job.sample_ms), 1)
    print(f"\n[ HALT ] Time per token: {avg_eval + avg_sample:.2f} ms | "
          f"eval {avg_eval:.2f} ms | sample {avg_sample:.2f} ms | "
          f"TTFT {job.ttft_ms:.0f} ms | "
          f"tokens {n} | {job.tokens_per_second:.2f} tokens/s")


def cmd_load(args) -> int:
    """Download a model file (reference: downloadModel, main.go:435-463)."""
    import urllib.request

    if not args.model:
        print("error: --model names the file to download", file=sys.stderr)
        return 2
    url = f"https://nogpu.com/{args.model}"
    dest = os.path.join(args.dir, args.model)
    print(f"[LOAD] downloading {url} -> {dest}")
    try:
        urllib.request.urlretrieve(url, dest)
    except Exception as e:  # noqa: BLE001 — report any network failure
        print(f"[ERROR] model was not downloaded: {e}", file=sys.stderr)
        return 1
    size = os.path.getsize(dest)
    if size < 1024 * 1024:  # sanity check >1MB, parity main.go:455-459
        print("[ERROR] downloaded file is suspiciously small", file=sys.stderr)
        return 1
    print(f"[LOAD] model of size {size / 2**30:.2f} GiB downloaded")
    return 0


def cmd_perplexity(args) -> int:
    """Perplexity over a text file (BASELINE.md quality metric)."""
    if not args.model or not args.file:
        print("error: perplexity needs --model and --file", file=sys.stderr)
        return 2
    engine, ckpt, config = _load_engine(args)
    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    from llamago_tpu.eval import perplexity
    from llamago_tpu.tokenizer import tokenize

    ids = tokenize(ckpt.vocab, " " + text, bos=True)
    ctx = min(args.context, 512)
    result = perplexity(engine.params, config, ids, ctx=ctx)
    print(f"[PPL] perplexity {result['ppl']:.4f} | nll {result['nll']:.4f} | "
          f"{result['n_tokens']} tokens in {result['n_windows']} windows "
          f"(ctx {ctx}, {config.weight_dtype} weights)")
    return 0


def cmd_finetune(args) -> int:
    """LoRA / QLoRA fine-tuning over a text file (models/lora.py): the
    base stays frozen — quantized bases stream through the fused dequant
    kernel whose VJP freezes them by construction — and rank-r adapters
    train with AdamW. Saves a small .npz; serve it with `--lora` (merged
    at load, so serving speed is unchanged).

    The reference's training is an unexecuted backward pass + roadmap
    item (reference: pkg/ml/ml.go:1118-1340, README.md:61)."""
    if not args.model or not args.file:
        print("error: finetune needs --model and --file", file=sys.stderr)
        return 2
    import jax.numpy as jnp
    import numpy as np

    from llamago_tpu.models import lora
    from llamago_tpu.tokenizer import tokenize

    engine, ckpt, config = _load_engine(args)
    params = engine.params
    engine = None  # params are donated by the train step below

    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    ids = np.asarray(tokenize(ckpt.vocab, " " + text, bos=True), np.int32)
    seq = min(args.seq, args.context)
    n_blocks = len(ids) // seq
    if n_blocks == 0:
        print(f"error: --file tokenizes to {len(ids)} tokens, fewer than "
              f"--seq {seq}", file=sys.stderr)
        return 2
    blocks = ids[: n_blocks * seq].reshape(n_blocks, seq)
    log("info", f"finetune: {len(ids)} tokens -> {n_blocks} blocks of {seq}",
        rank=args.rank, steps=args.steps, lr=args.lr)

    params = lora.init_lora(params, rank=args.rank, alpha=args.lora_alpha)
    opt = lora.init_lora_opt_state(params, lr=args.lr)
    rng = np.random.default_rng(args.seed if args.seed >= 0 else 0)
    t0 = time.time()
    loss = None
    for step in range(args.steps):
        take = rng.integers(0, n_blocks, size=args.train_batch)
        batch = jnp.asarray(blocks[take])
        params, opt, loss = lora.lora_train_step(
            params, opt, batch, config, lr=args.lr)
        if not args.silent and (step % 10 == 0 or step == args.steps - 1):
            log("info", f"step {step:4d} loss {float(loss):.4f} "
                f"({time.time() - t0:.1f}s)")
    out = args.out or (args.model + ".lora.npz")
    lora.save_lora(out, params)
    tps = args.steps * args.train_batch * seq / (time.time() - t0)
    print(f"[FINETUNE] {args.steps} steps, final loss {float(loss):.4f}, "
          f"{tps:.0f} tok/s -> adapters saved to {out}")
    print(f"[FINETUNE] serve with: --model {args.model} --lora {out}")
    return 0


def cmd_quantize(args) -> int:
    """ggjt f32/f16 -> Q8_0/Q4_0 (the reference's unimplemented Makefile
    target; llama.cpp-compatible bit layout). Uses the native C++ kernels
    when built."""
    if not args.model:
        print("error: quantize needs --model <ggjt file>", file=sys.stderr)
        return 2
    import time as _t

    from llamago_tpu import native
    from llamago_tpu.checkpoint.quant_file import quantize_ggjt

    kind = args.qkind or ("q8_0" if args.bits == 8 else "q4_0")
    out = args.out or args.model.replace(".bin", f"-{kind}.bin")
    t0 = _t.time()
    quantize_ggjt(args.model, out, kind)
    print(f"[QUANT] wrote {out} ({kind}, native={native.available()}) "
          f"in {_t.time() - t0:.1f}s")
    return 0


def cmd_convert(args) -> int:
    from llamago_tpu.checkpoint.convert import convert_cli

    return convert_cli(args)


if __name__ == "__main__":
    sys.exit(main())
