"""Benchmarks. Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Modes (BENCH_MODE):
  decode  [default] — single-chip steady-state decode throughput through the
          on-device chunked loop (runtime/decode_loop.py). LLaMA-7B INT8
          block-quantized weights created directly on device, layers unrolled
          so the fused Pallas dequant-matmul kernels stream int8 from HBM.
          The JSON carries an auditable roofline: `gbps` (achieved weight+KV
          bandwidth) and `roofline_pct` vs a *measured* same-run HBM copy
          microbenchmark — not a spec-sheet number.
  serve   — the REAL serving path: Engine + REST JobServer, jobs POSTed over
          HTTP, tokens decoded continuously batched across slots; reports
          served tokens/s and p50/p95 TTFT (BASELINE.md server-mode config).
  hbm     — just the HBM bandwidth microbenchmark.
  matrix  — runs a battery (int8/int4/13B/batch8/spec + serve) and records
          each result into bench_artifacts/*.json.

vs_baseline: the reference publishes NO numbers (BASELINE.md) — its own
runtime print is the only source. A 7B FP32 llama.go decode on the
README-suggested 16-core box (README.md:133-136) runs ~1.5 tokens/s; that
estimate is the denominator, recorded here so it is auditable.

Env overrides: BENCH_MODEL (7B|13B|tiny), BENCH_WEIGHT_DTYPE (int8|int4|
bfloat16), BENCH_TOKENS, BENCH_CHUNK, BENCH_CTX, BENCH_BATCH, BENCH_PODS,
BENCH_JOBS, BENCH_PROMPT_TOKENS, BENCH_SPEC, BENCH_DRAFT, BENCH_FUSE.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_7B_FP32_CPU_TOKS = 1.5  # documented estimate, see module docstring


def _provenance() -> dict:
    """Stamp every artifact with when/what produced it (r4 VERDICT #1:
    stale artifacts poisoned the evidence trail — a reader must be able
    to tell which kernels a number was measured with)."""
    import subprocess

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    import jax

    return {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_rev": rev,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }


def _setup_jax():
    import jax

    if os.environ.get("BENCH_BACKEND"):
        # NOTE: the JAX_PLATFORMS env var does NOT take effect under the
        # axon TPU plugin; jax.config.update is what works (tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["BENCH_BACKEND"])

    from jax._src import xla_bridge

    if jax.default_backend() == "tpu" and "axon" not in xla_bridge.backends():
        # persistent compile cache for real TPU hosts. NOT under the
        # tunneled axon plugin: entries compiled by its remote helper
        # reload with mismatched host features and can SIGILL
        # (see docs/SERVING.md environment notes).
        jax.config.update("jax_compilation_cache_dir", "/tmp/llamago_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _sync(arr):
    """Honest device sync: block_until_ready does not reliably wait under
    the axon TPU tunnel, and 0-d transfers stall — use a >=1-element
    device-to-host copy."""
    import numpy as np

    return np.asarray(arr.reshape(-1)[:1])


# Spec-sheet HBM bandwidth per chip generation (public TPU datasheets).
# The measured ceiling is sanity-clamped against this: the delta method
# can over-read on a noisy transport (a r2 run recorded 1047 GB/s on a
# 819 GB/s v5e — every roofline_pct derived from it was ~30% low).
_TPU_SPEC_GBPS = (
    ("v5 lite", 819.0),   # v5e
    ("v5e", 819.0),
    ("v5p", 2765.0),
    ("v6 lite", 1640.0),  # v6e / Trillium
    ("v6e", 1640.0),
    ("v4", 1228.0),
    ("v3", 900.0),
)


def _spec_gbps(jax) -> float | None:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    for tag, gbps in _TPU_SPEC_GBPS:
        if tag in kind:
            return gbps
    return None


def measure_hbm_gbps(jax, size_mb: int = 512, iters: tuple[int, int] = (8, 72),
                     pairs: int = 5, detail: dict | None = None) -> float:
    """Measured achievable HBM bandwidth, DELTA method: time a short and a
    long chain of scaled copies (each scan step reads + writes the buffer
    once: 2x traffic) and divide the traffic difference by the time
    difference. The subtraction cancels the constant dispatch+sync
    overhead, which is ~30-40 ms over this tunneled transport — a single
    timed dispatch under-reads by 2x+ at these sizes (a naive 16-chain
    measured ~290 GB/s where the delta method measures ~665 on v5e,
    81% of the 819 GB/s spec). This is the denominator of the roofline
    claim.

    Stability (VERDICT r2 #2): the r2 max-of-2-one-shot estimator swung
    675 -> 1047 GB/s run-to-run (and 1047 > the chip's 819 spec). Now the
    MEDIAN of `pairs` delta measurements, sanity-clamped to the chip's
    spec bandwidth; spread and clamping are reported via `detail` and a
    stderr warning so a noisy run is visible in the artifact."""
    import jax.numpy as jnp
    import numpy as np

    n = size_mb * 1024 * 1024 // 4
    x = jnp.zeros((n,), jnp.float32)
    one = jnp.ones((), jnp.float32)

    def make(k):
        @jax.jit
        def chain(x):
            def body(y, _):
                return y + one, None

            y, _ = jax.lax.scan(body, x, None, length=k)
            return y

        return chain

    def make_read(k):
        # READ-bandwidth chain: each step reads the buffer once through a
        # carry-dependent dynamic slice (not hoistable) and reduces it to
        # a scalar — writes are negligible. Weight-streaming decode is
        # read-dominated and measurably outruns the copy chain (707 vs
        # 655 GB/s observed on v5e), so the roofline ceiling is the max
        # of the two.
        @jax.jit
        def chain(x, idx, acc):
            def body(c, _):
                i, a = c
                seg = jax.lax.dynamic_slice(x, (i * 128,), (n - 1024,))
                return ((i + 1) % 8,
                        a * 0.5 + jnp.sum(seg, dtype=jnp.float32)), None
            (i, a), _ = jax.lax.scan(body, (idx, acc), None, length=k)
            return i, a

        return chain

    def sample_pairs(run_short, run_long, traffic):
        out = []
        for _ in range(pairs):
            t0 = time.time()
            run_short()
            t1 = time.time()
            run_long()
            t2 = time.time()
            dt = (t2 - t1) - (t1 - t0)
            if dt > 0:
                out.append(traffic / dt / 1e9)
        return out

    short, long = make(iters[0]), make(iters[1])
    y = short(x)
    _sync(y)
    y = long(y)
    _sync(y)  # compile + warm
    state = {"y": y}

    def run_copy_short():
        state["y"] = short(state["y"])
        _sync(state["y"])

    def run_copy_long():
        state["y"] = long(state["y"])
        _sync(state["y"])

    samples = sample_pairs(run_copy_short, run_copy_long,
                           2.0 * n * 4 * (iters[1] - iters[0]))

    rshort, rlong = make_read(iters[0]), make_read(iters[1])
    idx = jnp.zeros((), jnp.int32)
    acc = jnp.zeros((), jnp.float32)
    idx, acc = rshort(state["y"], idx, acc)
    _sync(acc)
    idx, acc = rlong(state["y"], idx, acc)
    _sync(acc)
    rstate = {"i": idx, "a": acc}

    def run_read_short():
        rstate["i"], rstate["a"] = rshort(state["y"], rstate["i"], rstate["a"])
        _sync(rstate["a"])

    def run_read_long():
        rstate["i"], rstate["a"] = rlong(state["y"], rstate["i"], rstate["a"])
        _sync(rstate["a"])

    read_samples = sample_pairs(run_read_short, run_read_long,
                                1.0 * (n - 1024) * 4 * (iters[1] - iters[0]))
    read_med = float(np.median(read_samples)) if read_samples else 0.0

    if not samples:
        return read_med
    copy_med = float(np.median(samples))
    if read_med > copy_med:
        samples = read_samples
    med = max(copy_med, read_med)
    spread = float((max(samples) - min(samples)) / med) if med else 0.0
    spec = _spec_gbps(jax)
    ceiling = med
    clamped = False
    if spec is not None and med > spec:
        sys.stderr.write(
            f"[bench-hbm] WARNING: measured {med:.0f} GB/s exceeds the "
            f"chip spec {spec:.0f} GB/s — clamping the roofline ceiling "
            "to spec (transport timing noise)\n"
        )
        ceiling = spec
        clamped = True
    if spread > 0.2:
        sys.stderr.write(
            f"[bench-hbm] WARNING: ceiling spread {100 * spread:.0f}% across "
            f"{len(samples)} pairs (samples: "
            f"{', '.join(f'{s:.0f}' for s in samples)} GB/s)\n"
        )
    if detail is not None:
        detail.update({
            "hbm_samples_gbps": [round(s, 1) for s in samples],
            "hbm_median_gbps": round(med, 1),
            "hbm_copy_gbps": round(copy_med, 1),
            "hbm_read_gbps": round(read_med, 1),
            "hbm_spread_pct": round(100 * spread, 1),
            "hbm_spec_gbps": spec,
            "hbm_clamped_to_spec": clamped,
        })
    return ceiling


def _weight_stream_bytes(params) -> int:
    """Bytes of parameters streamed from HBM per decoded token: every
    matmul weight (quantized q/s/m or dense) is read once; the embedding
    table is a single-row gather, excluded."""
    import jax

    total = 0
    leaves_with_path = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in leaves_with_path:
        keys = [getattr(k, "key", getattr(k, "idx", "")) for k in path]
        if "tok_embeddings" in keys:
            continue
        total += leaf.size * leaf.dtype.itemsize
    return total


def _make_config(jax):
    from llamago_tpu.config import MODEL_PRESETS

    on_tpu = jax.default_backend() == "tpu"
    model_name = os.environ.get("BENCH_MODEL", "7B" if on_tpu else "tiny")
    weight_dtype = os.environ.get("BENCH_WEIGHT_DTYPE", "int8")
    ctx = int(os.environ.get("BENCH_CTX", "1024" if on_tpu else "128"))
    config = MODEL_PRESETS[model_name].replace(
        # CPU XLA's DotThunk rejects some bf16 dot shapes (seen in the
        # speculative path); bf16 is the TPU-native choice only
        dtype="bfloat16" if on_tpu else "float32",
        weight_dtype=weight_dtype, max_seq_len=ctx,
        kv_dtype=os.environ.get("BENCH_KV_DTYPE", "auto"),
    )
    return config, model_name, weight_dtype, ctx, on_tpu


def _make_params(config, weight_dtype):
    from llamago_tpu.checkpoint.params import (
        fuse_layer_weights,
        random_parameters,
        random_quantized_parameters,
        unstack_layer_params,
    )

    if weight_dtype in ("int8", "int4"):
        # quantized leaves are created directly (no dense transient /
        # quantize pass) — same layout and bandwidth as real weights
        params = random_quantized_parameters(config, seed=0, layered=True)
    elif config.n_layers >= 16:
        # dense bench weights, generated PER LAYER: random_parameters
        # builds [L, ...]-stacked leaves whose f32 generation transient
        # (5.8 GB for a stacked 7B ffn leaf) OOMs a 16 GB chip that the
        # final 13.5 GB bf16 tree fits (measured 2026-08-20)
        params = _dense_layered_params(config)
    else:
        params = random_parameters(config, seed=0)
        params = unstack_layer_params(params, config.n_layers)
    if os.environ.get("BENCH_FUSE", "1") == "1":
        params = fuse_layer_weights(params)  # QKV + W13 fusion
    return params


def _dense_layered_params(config):
    """Random dense bench weights as per-layer leaves (the unrolled
    forward's layout), one jitted normal per leaf — peak HBM stays one
    2-D f32 leaf above the final footprint."""
    import functools

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.dtype(config.dtype)
    d, v, f = config.dim, config.vocab_size, config.ffn_hidden
    h, kv, hd = config.n_heads, config.kv_heads, config.head_dim
    keys = iter(jax.random.split(jax.random.PRNGKey(0),
                                 16 * (config.n_layers + 1)))

    @functools.partial(jax.jit, static_argnames=("shape",))
    def make(key, shape):
        if len(shape) == 1:
            return jnp.ones(shape, dtype)
        return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

    layer_shapes = {
        "attention_norm": (d,), "ffn_norm": (d,),
        "wq": (d, h * hd), "wk": (d, kv * hd), "wv": (d, kv * hd),
        "wo": (h * hd, d), "w1": (d, f), "w2": (f, d), "w3": (d, f),
    }
    layers = tuple(
        {k: make(next(keys), s) for k, s in layer_shapes.items()}
        for _ in range(config.n_layers)
    )
    return {
        "tok_embeddings": make(next(keys), (v, d)),
        "norm": make(next(keys), (d,)),
        "output": make(next(keys), (d, v)),
        "layers": layers,
    }


def bench_decode() -> dict:
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.decode_loop import decode_chunk
    from llamago_tpu.runtime.kv_cache import KVCache

    config, model_name, weight_dtype, ctx, on_tpu = _make_config(jax)
    n_tokens = int(os.environ.get("BENCH_TOKENS", "512" if on_tpu else "32"))
    spec_mode = os.environ.get("BENCH_SPEC", "0") == "1"
    # a speculative step covers draft_len+1 positions, so its chunk must
    # be ~8x shorter to fit the same context (chunk=128 at draft 7 is
    # 1024 positions — the whole ctx in one call, leaving zero decode room)
    chunk = int(os.environ.get(
        "BENCH_CHUNK", ("16" if spec_mode else "128") if on_tpu else "16"
    ))
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # decode slots (serving shape)
    # BENCH_TEMP > 0 runs the FULL sampler each step (temperature +
    # repeat penalty + top-k/top-p at the reference defaults,
    # main.go:87-90) — the BASELINE config-2 "sampled decode" shape;
    # default is greedy argmax
    bench_temp = float(os.environ.get("BENCH_TEMP", "0"))
    prompt_len = 64 if on_tpu else 8

    hbm_detail: dict = {}
    if os.environ.get("BENCH_SKIP_HBM", "0") == "1":
        # capacity-marginal configs (7B bf16 = 13.5 GB weights on a
        # 16 GB chip) OOM with the probe buffers resident; the row then
        # reports tok/s without a same-run roofline
        hbm_gbps = 0.0
    else:
        hbm_gbps = measure_hbm_gbps(jax, size_mb=512 if on_tpu else 64,
                                    detail=hbm_detail)

    t0 = time.time()
    params = _make_params(config, weight_dtype)
    _sync(jax.tree.leaves(params)[0])
    init_s = time.time() - t0
    weight_bytes = _weight_stream_bytes(params)

    cache = KVCache.create(config, batch=batch, layered=True)
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    t0 = time.time()
    logits, cache = forward(params, prompt, cache, jnp.zeros(batch, jnp.int32), config)
    _sync(logits)
    prefill_s = time.time() - t0  # includes compile
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    pos = jnp.full((batch,), prompt_len, jnp.int32)

    speculative = os.environ.get("BENCH_SPEC", "0") == "1"
    if speculative:
        # prompt-lookup speculative decode (runtime/speculative.py):
        # lossless greedy; tokens/s counts EMITTED tokens. NOTE favorable
        # case: random-weight greedy output is repetitive, so acceptance
        # is high — this measures the mechanism's ceiling, not wikitext.
        from llamago_tpu.runtime.speculative import speculative_decode_chunk

        draft_len = int(os.environ.get("BENCH_DRAFT", "7"))
        hist = jnp.zeros((batch, ctx), jnp.int32)
        hist = hist.at[:, :prompt_len].set(prompt)
        hist = jax.vmap(lambda h, t: h.at[prompt_len].set(t))(hist, tok)
        hlen = jnp.full((batch,), prompt_len + 1, jnp.int32)

        t0 = time.time()
        toks, counts, cache, pos, hist, hlen = speculative_decode_chunk(
            params, tok, cache, pos, hist, hlen, config,
            n_steps=chunk, draft_len=draft_len,
        )
        _sync(toks)
        # second warmup: the first post-compile call can run up to 2x
        # slower on this transport (measured 35 vs 18 ms/step at b=8;
        # allocator state after the HBM probe's 512 MB buffers) — steady
        # state begins at the second call, so warm twice before timing.
        last = jax.vmap(lambda t, n: t[-1, n])(toks, counts[:, -1] - 1)
        toks, counts, cache, pos, hist, hlen = speculative_decode_chunk(
            params, last, cache, pos, hist, hlen, config,
            n_steps=chunk, draft_len=draft_len,
        )
        _sync(toks)
        warmup_s = time.time() - t0

        produced = 0
        forward_steps = 0  # scan steps = weight reads
        last = jax.vmap(lambda t, n: t[-1, n])(toks, counts[:, -1] - 1)
        start_pos = int(pos.max())
        t0 = time.time()
        while produced < n_tokens and int(pos.max()) + chunk * (draft_len + 1) < ctx:
            toks, counts, cache, pos, hist, hlen = speculative_decode_chunk(
                params, last, cache, pos, hist, hlen, config,
                n_steps=chunk, draft_len=draft_len,
            )
            last = jax.vmap(lambda t, n: t[-1, n])(toks, counts[:, -1] - 1)
            produced += int(np.asarray(counts).sum())
            forward_steps += chunk
        _sync(toks)
        dt = time.time() - t0
        toks_per_s = produced / dt
    else:
        # warmup chunk — MUST use the exact steady-state arg structure
        # (state=None vs state=SamplerState are different pytrees -> retrace)
        from llamago_tpu.ops.sampling import SamplerState

        st = SamplerState.create(batch, 1, config.vocab_size)
        rngs = jax.vmap(jax.random.PRNGKey)(jnp.zeros(batch, jnp.int32))
        sample_kw = {}
        if bench_temp > 0:
            sample_kw = dict(
                greedy=False,
                temp=jnp.full(batch, bench_temp, jnp.float32),
                top_k=jnp.full(batch, 40, jnp.int32),
                top_p=jnp.full(batch, 0.95, jnp.float32),
                repeat_penalty=jnp.full(batch, 1.10, jnp.float32),
            )
        t0 = time.time()
        toks, cache, pos, st, rngs = decode_chunk(
            params, tok, cache, pos, config, chunk, rngs=rngs, state=st,
            **sample_kw
        )
        _sync(toks)
        # second warmup — see the speculative branch note: the first
        # post-compile call is up to 2x slower on this transport.
        toks, cache, pos, st, rngs = decode_chunk(
            params, toks[:, -1], cache, pos, config, chunk, rngs=rngs, state=st,
            **sample_kw
        )
        _sync(toks)
        warmup_s = time.time() - t0

        # steady-state measurement: at least 2 chunks, stop before the
        # context window would overflow (cache writes clamp at S)
        produced = 0
        forward_steps = 0
        chunks_done = 0
        pos_host = prompt_len + 2 * chunk  # tracks pos.max() sync-free
        start_pos = pos_host
        t0 = time.time()
        while (produced < n_tokens or chunks_done < 2) and (
                pos_host + chunk <= ctx):
            toks, cache, pos, st, rngs = decode_chunk(
                params, toks[:, -1], cache, pos, config, chunk, rngs=rngs,
                state=st, **sample_kw
            )
            produced += chunk * batch
            forward_steps += chunk
            chunks_done += 1
            pos_host += chunk
        _sync(toks)
        dt = time.time() - t0
        toks_per_s = produced / dt

    # Achieved HBM bandwidth, from first principles: every forward scan
    # step streams the matmul weights from HBM once (batch rows share the
    # read; a speculative step verifies draft+1 tokens per read), plus the
    # KV-cache read of ~position rows per token. This is the numerator of
    # the roofline claim; the denominator is the measured copy bandwidth.
    # Per-stream split (VERDICT r4 #2: say WHERE the bytes go). The
    # scale-plane stream matters: one scale per 128-element int8 head
    # row is itemsize/128 of the row's own bytes, for BOTH K and V.
    from llamago_tpu.runtime.kv_cache import scale_dtype
    scale_itemsize = scale_dtype().itemsize
    if config.kv_dtype == "int8":
        kv_val_row = config.n_layers * 2 * config.kv_heads * config.head_dim
        kv_scale_row = config.n_layers * 2 * config.kv_heads * scale_itemsize
    else:
        kv_itemsize = 2  # bf16 cache
        kv_val_row = (config.n_layers * 2 * config.kv_heads
                      * config.head_dim * kv_itemsize)
        kv_scale_row = 0
    end_pos = int(pos.max())
    avg_pos = (start_pos + end_pos) / 2.0  # mean position over TIMED steps
    # nominal reads assume exactly `pos` rows; the length-aware kernel
    # actually DMAs whole sb-row blocks, so its real traffic is the
    # block-rounded figure (reported separately, not in the roofline
    # numerator — the roofline credits useful bytes only)
    from llamago_tpu.ops.attention import _SB as attn_sb
    blk_pos = (int(avg_pos) // attn_sb + 1) * attn_sb
    kv_bytes_per_tok = (kv_val_row + kv_scale_row) * avg_pos
    weight_gb = weight_bytes * forward_steps / 1e9
    kv_gb = kv_bytes_per_tok * produced / 1e9
    kv_val_gb = kv_val_row * avg_pos * produced / 1e9
    kv_scale_gb = kv_scale_row * avg_pos * produced / 1e9
    kv_blk_gb = (kv_val_row + kv_scale_row) * blk_pos * produced / 1e9
    achieved_gbps = (weight_gb + kv_gb) / dt
    roofline_pct = 100.0 * achieved_gbps / hbm_gbps if hbm_gbps else 0.0
    step_ms = dt / forward_steps * 1000.0 if forward_steps else 0.0
    streams = {
        "weights_gb_per_s": round(weight_gb / dt, 1),
        "kv_values_gb_per_s": round(kv_val_gb / dt, 1),
        "kv_scales_gb_per_s": round(kv_scale_gb / dt, 1),
        # what the sb-block-granular kernel actually moves (incl. the
        # rounded-up tail block) — the gap to `gbps` is DMA overhead the
        # roofline does not credit
        "kv_block_rounded_gb_per_s": round(kv_blk_gb / dt, 1),
        "step_ms": round(step_ms, 2),
        # residual = step time minus what the measured ceiling says the
        # credited bytes need; this is the "where does the rest go" number
        "residual_ms_per_step": round(
            step_ms - (weight_gb + kv_gb) / forward_steps * 1000.0
            / hbm_gbps, 2) if hbm_gbps and forward_steps else None,
    }

    sys.stderr.write(
        f"[bench] backend={jax.default_backend()} model={model_name} "
        f"weights={weight_dtype} ctx={ctx} init={init_s:.1f}s "
        f"prefill+compile={prefill_s:.1f}s warmup={warmup_s:.1f}s "
        f"decode={produced} toks in {dt:.2f}s | hbm={hbm_gbps:.0f} GB/s "
        f"achieved={achieved_gbps:.0f} GB/s ({roofline_pct:.0f}%)\n"
    )
    return {
        "metric": (f"decode_tokens_per_sec_{model_name}_{weight_dtype}_"
                   + ("sampled" if bench_temp > 0 else "greedy")
                   + f"_b{batch}"
                   + ("_kvq" if config.kv_dtype == "int8" else "")
                   + ("_spec" if speculative else "")
                   # non-default ctx is part of the name so same-config
                   # artifacts at different contexts stay distinguishable
                   + (f"_ctx{ctx}" if ctx != (1024 if on_tpu else 128)
                      else "")),
        "kv_dtype": config.kv_dtype,
        "ctx": ctx,
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / REFERENCE_7B_FP32_CPU_TOKS, 2),
        "gbps": round(achieved_gbps, 1),
        "hbm_gbps": round(hbm_gbps, 1),
        "roofline_pct": round(roofline_pct, 1),
        "streams": streams,
        **hbm_detail,
    }


def _byte_vocab(vocab_size: int):
    """Synthetic vocab padded to `vocab_size`: the shared byte-level
    builder (eval/quality_gate.py) plus filler pieces. Byte fallback makes
    prompt token length controllable and detokenization exact."""
    from llamago_tpu.eval.quality_gate import byte_vocab
    from llamago_tpu.tokenizer import Vocab

    tokens = list(byte_vocab().tokens)
    tokens += [(f"<pad{i}>".encode(), -2000.0)
               for i in range(vocab_size - len(tokens))]
    return Vocab(tokens)


def bench_serve() -> dict:
    """Drive the REAL serving path: REST JobServer over a continuously
    batched Engine — jobs POSTed over HTTP, status polled, output fetched
    (reference contract: pkg/server/server.go:67-80,110-278). Reports
    served tokens/s across the whole run and TTFT percentiles."""
    jax = _setup_jax()
    import urllib.request

    from llamago_tpu.config import GenerateConfig, ServerConfig
    from llamago_tpu.runtime.engine import Engine
    from llamago_tpu.server.api import JobServer

    config, model_name, weight_dtype, ctx, on_tpu = _make_config(jax)
    slots = int(os.environ.get("BENCH_PODS", "4" if on_tpu else "2"))
    n_jobs = int(os.environ.get("BENCH_JOBS", "8" if on_tpu else "3"))
    predict = int(os.environ.get("BENCH_TOKENS", "64" if on_tpu else "8"))
    prompt_tokens = int(os.environ.get("BENCH_PROMPT_TOKENS", "48" if on_tpu else "8"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32" if on_tpu else "4"))

    t0 = time.time()
    params = _make_params(config, weight_dtype)
    _sync(jax.tree.leaves(params)[0])
    init_s = time.time() - t0

    vocab = _byte_vocab(config.vocab_size)
    speculative = os.environ.get("BENCH_SPEC", "0") == "1"
    engine = Engine(config, params, vocab, slots=slots,
                    decode_chunk_size=chunk, prefill_chunk=256,
                    speculative=speculative)
    # speculative serving requires an all-greedy batch (lossless path);
    # the sampled default exercises the full sampler
    gen = GenerateConfig(max_tokens=predict, ctx_size=ctx,
                         temp=0.0 if speculative else 0.8, seed=11)
    t0 = time.time()
    warm_bucket = engine._bucket(prompt_tokens + 2)
    warm_s = engine.warmup(max_bucket=warm_bucket, include_embed=False)
    sys.stderr.write(f"[bench-serve] init={init_s:.1f}s warmup={warm_s:.1f}s\n")

    server = JobServer(engine, ServerConfig(host="localhost", port=0), gen,
                       model_name=f"{model_name}-{weight_dtype}")
    server.start_background()
    port = server.port

    def post(path, body):
        req = urllib.request.Request(
            f"http://localhost:{port}{path}", data=json.dumps(body).encode()
        )
        return json.loads(urllib.request.urlopen(req).read())

    def get(path):
        return json.loads(
            urllib.request.urlopen(f"http://localhost:{port}{path}").read()
        )

    import uuid as uuid_mod

    # prompts differ so prefix caching cannot short-circuit the measurement
    prompts = [
        (f"request {i:03d}: " + "abcdefgh" * 40)[: prompt_tokens - 1]
        for i in range(n_jobs)
    ]
    ids = [str(uuid_mod.uuid4()) for _ in range(n_jobs)]
    t_start = time.time()
    for jid, prompt in zip(ids, prompts):
        post("/jobs/", {"id": jid, "prompt": prompt})

    deadline = time.time() + float(os.environ.get("BENCH_SERVE_TIMEOUT", "1800"))
    done: dict[str, dict] = {}
    while len(done) < n_jobs and time.time() < deadline:
        time.sleep(0.2)
        for jid in ids:
            if jid in done:
                continue
            st = get(f"/jobs/status/{jid}")["status"]
            if st in ("finished", "failed"):
                done[jid] = get(f"/jobs/{jid}")
    t_total = time.time() - t_start
    metrics = get("/metrics")
    server.shutdown()

    failed = [j for j in done.values() if j["status"] == "failed"]
    total_tokens = metrics["generated_tokens"]
    served_tps = total_tokens / t_total
    sys.stderr.write(
        f"[bench-serve] backend={jax.default_backend()} model={model_name} "
        f"weights={weight_dtype} slots={slots} jobs={n_jobs} "
        f"predict={predict} prompt={prompt_tokens} | "
        f"{total_tokens} toks in {t_total:.2f}s | "
        f"ttft p50={metrics['ttft_ms']['p50']}ms p95={metrics['ttft_ms']['p95']}ms "
        f"| failed={len(failed)}\n"
    )
    if failed:
        sys.stderr.write(f"[bench-serve] FIRST FAILURE: {failed[0].get('error')}\n")
    return {
        "metric": (f"served_tokens_per_sec_{model_name}_{weight_dtype}"
                   f"_slots{slots}"
                   + ("_kvq" if config.kv_dtype == "int8" else "")
                   + (f"_ctx{ctx}" if ctx != (1024 if on_tpu else 128)
                      else "")),
        "kv_dtype": config.kv_dtype,
        "ctx": ctx,
        "value": round(served_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(served_tps / REFERENCE_7B_FP32_CPU_TOKS, 2),
        "ttft_p50_ms": metrics["ttft_ms"]["p50"],
        "ttft_p95_ms": metrics["ttft_ms"]["p95"],
        "jobs": n_jobs,
        "slots": slots,
        "failed": len(failed),
    }


def bench_soak() -> dict:
    """Sustained-load serving soak (VERDICT r2 #7): jobs arrive as a
    Poisson process for BENCH_SOAK_SECONDS with more offered load than
    the slot pool can absorb, so the queue stays occupied. Records
    steady-state tok/s (measured AFTER a lead-in, so warm programs only),
    TTFT and queue-wait percentiles incl. p99, and the prefix-reuse hit
    rate (prompts draw from a small template pool; repeats on the same
    slot reuse cached KV). The reference's pods model exposes no queue
    metrics at all (server.go:248-274)."""
    jax = _setup_jax()
    import urllib.request
    import uuid as uuid_mod

    import numpy as np

    from llamago_tpu.config import GenerateConfig, ServerConfig
    from llamago_tpu.runtime.engine import Engine
    from llamago_tpu.server.api import JobServer

    config, model_name, weight_dtype, ctx, on_tpu = _make_config(jax)
    slots = int(os.environ.get("BENCH_PODS", "4" if on_tpu else "2"))
    predict = int(os.environ.get("BENCH_TOKENS", "96" if on_tpu else "8"))
    prompt_tokens = int(os.environ.get("BENCH_PROMPT_TOKENS",
                                       "48" if on_tpu else "8"))
    chunk = int(os.environ.get("BENCH_CHUNK", "32" if on_tpu else "4"))
    soak_s = float(os.environ.get("BENCH_SOAK_SECONDS",
                                  "300" if on_tpu else "12"))
    lead_s = float(os.environ.get("BENCH_SOAK_LEAD", "30" if on_tpu else "3"))
    # mean inter-arrival; default oversubscribes ~4 decode slots at 7B
    arrival_s = float(os.environ.get("BENCH_SOAK_ARRIVAL_MS",
                                     "400" if on_tpu else "1500")) / 1e3
    templates = int(os.environ.get("BENCH_SOAK_TEMPLATES", "6"))

    t0 = time.time()
    params = _make_params(config, weight_dtype)
    _sync(jax.tree.leaves(params)[0])
    init_s = time.time() - t0

    vocab = _byte_vocab(config.vocab_size)
    engine = Engine(config, params, vocab, slots=slots,
                    decode_chunk_size=chunk, prefill_chunk=256)
    gen = GenerateConfig(max_tokens=predict, ctx_size=ctx, temp=0.8, seed=11)
    warm_s = engine.warmup(max_bucket=engine._bucket(prompt_tokens + 2),
                           include_embed=False)
    sys.stderr.write(f"[bench-soak] init={init_s:.1f}s warmup={warm_s:.1f}s\n")

    server = JobServer(engine, ServerConfig(host="localhost", port=0), gen,
                       model_name=f"{model_name}-{weight_dtype}")
    server.start_background()
    port = server.port

    def post(path, body):
        req = urllib.request.Request(
            f"http://localhost:{port}{path}", data=json.dumps(body).encode()
        )
        return json.loads(urllib.request.urlopen(req).read())

    def get(path):
        return json.loads(
            urllib.request.urlopen(f"http://localhost:{port}{path}").read()
        )

    # template pool: shared prefix per template, unique tail per job —
    # same-template jobs landing on a slot that last served that template
    # hit the per-slot KV prefix cache; the unique tail keeps decode honest
    base = [
        (f"template {t}: " + "abcdefgh" * 40)[: max(prompt_tokens - 12, 4)]
        for t in range(templates)
    ]
    rng = np.random.default_rng(7)
    ids: list[str] = []
    prompt_tok_total = 0
    t_start = time.time()
    t_mark = None
    toks_mark = 0
    i = 0
    while time.time() - t_start < soak_s:
        t = int(rng.integers(0, templates))
        jid = str(uuid_mod.uuid4())
        prompt = base[t] + f" job{i:04d}"
        post("/jobs/", {"id": jid, "prompt": prompt})
        ids.append(jid)
        prompt_tok_total += len(prompt)  # byte-LM: 1 token per byte
        i += 1
        now = time.time()
        if t_mark is None and now - t_start >= lead_s:
            t_mark = now
            toks_mark = get("/metrics")["generated_tokens"]
        time.sleep(float(rng.exponential(arrival_s)))
    # drain: stop submitting, let the queue finish
    deadline = time.time() + float(os.environ.get("BENCH_SERVE_TIMEOUT", "1800"))
    while time.time() < deadline:
        st = get("/health")["jobs"]  # status -> count over all jobs
        if not (st.get("queued", 0) or st.get("processing", 0)):
            break
        time.sleep(0.5)
    t_end = time.time()
    metrics = get("/metrics")
    server.shutdown()

    done = metrics["jobs"].get("finished", 0)
    failed = metrics["jobs"].get("failed", 0)
    total_tokens = metrics["generated_tokens"]
    if t_mark is None:  # soak shorter than lead-in; fall back to full window
        t_mark, toks_mark = t_start, 0
    steady_tps = (total_tokens - toks_mark) / (t_end - t_mark)
    reuse_rate = metrics["reused_prompt_tokens"] / max(prompt_tok_total, 1)
    sys.stderr.write(
        f"[bench-soak] backend={jax.default_backend()} model={model_name} "
        f"weights={weight_dtype} slots={slots} jobs={len(ids)} "
        f"({done} done, {failed} failed) over {t_end - t_start:.0f}s | "
        f"steady {steady_tps:.1f} tok/s | "
        f"ttft p50={metrics['ttft_ms']['p50']} p99={metrics['ttft_ms']['p99']}ms "
        f"| queue p50={metrics['queue_wait_ms']['p50']} "
        f"p99={metrics['queue_wait_ms']['p99']}ms | "
        f"prefix-reuse {reuse_rate:.1%}\n"
    )
    return {
        "metric": f"serve_soak_{model_name}_{weight_dtype}_slots{slots}",
        "value": round(steady_tps, 2),
        "unit": "tokens/s (steady-state)",
        "vs_baseline": round(steady_tps / REFERENCE_7B_FP32_CPU_TOKS, 2),
        "soak_seconds": round(t_end - t_start, 1),
        "jobs_submitted": len(ids),
        "jobs_finished": done,
        "jobs_failed": failed,
        "mean_arrival_ms": arrival_s * 1e3,
        "ttft_ms": metrics["ttft_ms"],
        "queue_wait_ms": metrics["queue_wait_ms"],
        "prefix_reuse_rate": round(reuse_rate, 4),
        "prompt_templates": templates,
    }


def bench_hbm() -> dict:
    jax = _setup_jax()
    on_tpu = jax.default_backend() == "tpu"
    detail: dict = {}
    gbps = measure_hbm_gbps(jax, size_mb=512 if on_tpu else 64, detail=detail)
    return {
        "metric": "hbm_copy_bandwidth",
        "value": round(gbps, 1),
        "unit": "GB/s",
        "vs_baseline": 0.0,
        **detail,
    }


def bench_shard70b() -> dict:
    """Fused dequant-matmul streaming efficiency at EXACTLY the BASELINE
    target shapes: one tp=8 shard of LLaMA-2-70B INT4 (GQA 64/8 heads,
    dim 8192, ffn 28672 -> per-shard wq [8192,1024], wk/wv [8192,128],
    wo [1024,8192], w1/w3 [8192,3584], w2 [3584,8192], 80 layers,
    ~4.6 GB of int4+scales). One chip holds the whole shard, so the
    per-shard kernel rate — the thing the >=90%-of-roofline target
    (BASELINE.md) constrains — is measured directly; ICI collectives are
    orthogonal (they overlap or add ~alpha+bytes/bw on top, and the
    dryrun validates the sharded program itself).

    The measurement is in-model style: all 80 layers' matmuls chained
    inside ONE jitted lax.scan (isolated single-kernel probes measured
    2-4x low through this transport — see git history), value = achieved
    weight GB/s over the scan vs the same-run delta-method HBM ceiling.
    """
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from llamago_tpu.ops import quant

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:  # tiny smoke shapes off-TPU
        dim, q_out, kv_out, ffn, layers = 256, 64, 32, 96, 2
    else:
        dim, q_out, kv_out, ffn, layers = 8192, 1024, 128, 3584, 80

    hbm_detail: dict = {}
    hbm_gbps = measure_hbm_gbps(jax, size_mb=512 if on_tpu else 64,
                                detail=hbm_detail)

    if os.environ.get("BENCH_FUSE", "1") == "1":
        # per-SHARD projection fusion: a tp shard's local wq|wk|wv (and
        # w1|w3) columns concatenate legally inside the shard's program —
        # 4 large matmuls per layer instead of 7, exactly like the
        # single-chip fused path (checkpoint/params.py:fuse_layer_weights)
        shapes = {
            "wqkv": (dim, q_out + 2 * kv_out),
            "wo": (q_out, dim),
            "w13": (dim, 2 * ffn),
            "w2": (ffn, dim),
        }
    else:
        shapes = {
            "wq": (dim, q_out), "wk": (dim, kv_out), "wv": (dim, kv_out),
            "wo": (q_out, dim), "w1": (dim, ffn), "w3": (dim, ffn),
            "w2": (ffn, dim),
        }
    key = jax.random.PRNGKey(0)
    bits = int(os.environ.get("BENCH_BITS", "4"))

    # int4 exec format: w4x8 (bitcast unpack + int8 MXU dots, see
    # ops/kernels.py) unless LLAMAGO_INT4_EXEC=q4_0 forces the ggml
    # group-32 layout for A/B
    w4x8 = bits == 4 and quant.int4_exec_format() == "w4x8"

    def make_layer(i):
        nonlocal key
        layer = {}
        for name, (k_, n_) in shapes.items():
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k_, n_), jnp.bfloat16) * 0.02
            layer[name] = quant.quantize_w4x8(w) if w4x8 else quant.quantize(w, bits)
        return layer

    stack = [make_layer(i) for i in range(layers)]
    # layer-stacked pytree for scan (leaves [L, ...])
    stacked = {
        name: {part: jnp.stack([lyr[name][part] for lyr in stack])
               for part in stack[0][name]}
        for name in shapes
    }
    _sync(next(iter(stacked["w2"].values())))
    weight_bytes = sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(stacked)
    )

    x0 = jnp.ones((1, dim), jnp.bfloat16)
    h0 = jnp.ones((1, ffn), jnp.bfloat16)
    a0 = jnp.ones((1, q_out), jnp.bfloat16)
    n_steps = int(os.environ.get("BENCH_TOKENS", "32" if on_tpu else "4"))

    @jax.jit
    def sweep(weights, x, h, a):
        # every matmul of every layer, serialized by a data dependency,
        # weights read from HBM once per outer step
        def outer(carry, _):
            x, h, a = carry

            def layer_step(carry, lw):
                x, h, a = carry
                if "wqkv" in lw:
                    qkv = quant.quant_matmul(x, lw["wqkv"])
                    q, kv = qkv[:, :q_out], qkv[:, q_out:q_out + kv_out]
                    gu = quant.quant_matmul(x, lw["w13"])
                    g, u = gu[:, :ffn], gu[:, ffn:]
                else:
                    q = quant.quant_matmul(x, lw["wq"])      # [1, q_out]
                    kv = quant.quant_matmul(x, lw["wk"])
                    kv = kv + quant.quant_matmul(x, lw["wv"])
                    g = quant.quant_matmul(x, lw["w1"])
                    u = quant.quant_matmul(x, lw["w3"])
                o = quant.quant_matmul(a, lw["wo"])          # [1, dim]
                d = quant.quant_matmul(h, lw["w2"])          # [1, dim]
                x = (x + o + d) * 0.5
                h = (g + u) * 0.5
                a = q + jnp.pad(kv, ((0, 0), (0, q.shape[-1] - kv.shape[-1])))
                return (x, h, a), None

            carry, _ = jax.lax.scan(layer_step, (x, h, a), weights)
            return carry, None

        (x, h, a), _ = jax.lax.scan(outer, (x, h, a), None, length=n_steps)
        return x, h, a

    def sweep_(x, h, a):
        return sweep(stacked, x, h, a)

    x, h, a = sweep_(x0, h0, a0)
    _sync(x)  # compile + warm
    t0 = time.time()
    x, h, a = sweep_(x, h, a)
    _sync(x)
    dt = time.time() - t0
    achieved = weight_bytes * n_steps / dt / 1e9
    pct = 100.0 * achieved / hbm_gbps if hbm_gbps else 0.0
    sys.stderr.write(
        f"[bench-70b-shard] layers={layers} weight_bytes={weight_bytes/1e9:.2f}GB "
        f"steps={n_steps} in {dt:.2f}s | hbm={hbm_gbps:.0f} GB/s "
        f"achieved={achieved:.0f} GB/s ({pct:.0f}%)\n"
    )
    analysis = None
    if bits == 4:
        analysis = (
            "w4x8 exec format (r5): pltpu.bitcast hardware int4 unpack + "
            "group-128 int8 MXU dots broke the r3 VPU-element-rate bound "
            "(280 GB/s pinned regardless of tiles) — this chain now runs "
            "within ~20% of its own measured pure-block-DMA bound for the "
            "same layout/tiles (568-592 GB/s, scripts/kernel_lab.py "
            "dma_pure), so the residual gap to the >=90% target is DMA "
            "pipeline overlap on the dominant w13 [8192,7168] shape, not "
            "decode arithmetic. Cross-checks: 7B int4 b=1 decode streams "
            "its weights at 96-97% of the same-run read ceiling "
            "(decode_7b_int4.json), and int8 13B is DMA-shaped at ~90% "
            "(decode_13b_int8.json). Quality is gated: quality_gate.json "
            "w4x8/w4x8_a8/w4x8_direct rows, <=0.1 ppl vs the dense "
            "baseline (gate_w4x8_pass)."
        )
    return {
        "metric": f"dequant_matmul_stream_70B_int{bits}_tp8_shard",
        "value": round(achieved, 1),
        "unit": "GB/s",
        "vs_baseline": round(pct / 100.0, 3),  # fraction of measured roofline
        "hbm_gbps": round(hbm_gbps, 1),
        "roofline_pct": round(pct, 1),
        "target": ">=90% of per-chip HBM roofline (BASELINE.md)",
        **({"analysis": analysis} if analysis else {}),
        **hbm_detail,
    }


_MODE_OF = {"bench_decode": "decode", "bench_serve": "serve",
            "bench_soak": "soak", "bench_shard70b": "shard70b"}


def bench_matrix() -> dict:
    """Run the recorded benchmark battery and write each result to
    bench_artifacts/ (VERDICT r1: configs must exist as artifacts, not
    prose). Returns the headline (7B int8 decode) result.

    Each row runs in a FRESH SUBPROCESS: one resident process
    accumulates every row's device arrays (XLA buffers outlive the
    Python refs long enough that the 7B bf16 row OOMed a 16 GB chip
    after the int8+int4 rows — measured 2026-08-20), and a row that
    dies must not kill the battery (the r4 0-byte-artifact failure
    mode). Failures are recorded in summary.json as error rows."""
    import subprocess

    os.makedirs("bench_artifacts", exist_ok=True)
    results = []

    def record(name, env, fn):
        mode = _MODE_OF[fn.__name__]
        sub_env = {**os.environ, **env, "BENCH_MODE": mode}
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=sub_env, capture_output=True, text=True,
            timeout=float(os.environ.get("BENCH_ROW_TIMEOUT", "3600")),
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            r = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            r = None
        if proc.returncode != 0 or r is None:
            tail = "\n".join(proc.stderr.splitlines()[-4:])
            sys.stderr.write(f"[matrix] {name}: FAILED rc={proc.returncode}\n"
                             f"{tail}\n")
            results.append({"metric": name, "error": f"rc={proc.returncode}",
                            "stderr_tail": tail, **_provenance()})
            return None
        results.append(r)
        with open(f"bench_artifacts/{name}.json", "w") as f:
            json.dump(r, f, indent=1)
        sys.stderr.write(f"[matrix] {name}: {r['value']} {r['unit']}\n")
        return r

    headline = record("decode_7b_int8", {"BENCH_WEIGHT_DTYPE": "int8"}, bench_decode)
    record("decode_7b_int4", {"BENCH_WEIGHT_DTYPE": "int4"}, bench_decode)
    # BASELINE config-matrix anchors (r4 VERDICT #7):
    # - configs 1-2 are FP32-denominated; 7B fp32 weights are 26 GB and
    #   13B fp32 are 52 GB — neither fits a 16 GB v5e chip, so the fp32
    #   rows are INFEASIBLE single-chip (recorded here, not silently
    #   skipped). bf16 is the de-facto dense anchor (13.5 GB, fits);
    # - the sampled row covers config 2's temperature/top-k/top-p shape
    #   with the reference's default sampler params (main.go:87-90).
    results.append({
        "metric": "decode_7B_fp32_infeasible_note",
        "value": 0, "unit": "n/a",
        "note": ("BASELINE configs 1-2 are FP32: 7B fp32 = 26 GB weights "
                 "> 16 GB v5e HBM (13B fp32 = 52 GB). Infeasible "
                 "single-chip by capacity, not by kernel support; "
                 "decode_7b_bf16 is the dense-weights anchor."),
        **_provenance(),
    })
    record("decode_7b_bf16", {"BENCH_WEIGHT_DTYPE": "bfloat16",
                              "BENCH_SKIP_HBM": "1"}, bench_decode)
    record("decode_7b_int8_sampled",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_TEMP": "0.5"}, bench_decode)
    for b in (2, 4, 8):
        record(f"decode_7b_int8_b{b}",
               {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_BATCH": str(b)},
               bench_decode)
    record("decode_7b_int8_spec", {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_SPEC": "1"},
           bench_decode)
    # int8 KV cache (--kv-dtype int8): halves cache HBM and speeds
    # cache-bound decode. The ctx-2048 b=8 config is IMPOSSIBLE with a
    # bf16 cache on one 16 GB chip (RESOURCE_EXHAUSTED, measured
    # 2026-08-19) — the kvq row is the capacity headline.
    record("decode_7b_int8_b8_kvq",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_BATCH": "8",
            "BENCH_KV_DTYPE": "int8"},
           bench_decode)
    # int4 weights (w4x8 exec) + int8 cache at the serving batch — the
    # highest-throughput single-chip config after r5's kernel work
    record("decode_7b_int4_b8_kvq",
           {"BENCH_WEIGHT_DTYPE": "int4", "BENCH_BATCH": "8",
            "BENCH_KV_DTYPE": "int8"},
           bench_decode)
    record("decode_7b_int8_b8_ctx2048_kvq",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_BATCH": "8",
            "BENCH_KV_DTYPE": "int8", "BENCH_CTX": "2048",
            "BENCH_TOKENS": "1024"},
           bench_decode)
    # ctx-4096 long-context proof point (r4 VERDICT #10): the length-
    # aware kernel's fill-proportional reads should hold tok/s far above
    # the padded-S era; 8 slots x 4096 only fits with the int8 cache.
    record("decode_7b_int8_b8_ctx4096_kvq",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_BATCH": "8",
            "BENCH_KV_DTYPE": "int8", "BENCH_CTX": "4096",
            "BENCH_TOKENS": "2048"},
           bench_decode)
    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    if os.environ.get("BENCH_MATRIX_13B", "1") == "1" and on_tpu:
        record("decode_13b_int8", {"BENCH_MODEL": "13B", "BENCH_WEIGHT_DTYPE": "int8"},
               bench_decode)
    if os.environ.get("BENCH_MATRIX_LLAMA3", "1") == "1" and on_tpu:
        record("decode_llama3_8b_int8",
               {"BENCH_MODEL": "llama3-8B", "BENCH_WEIGHT_DTYPE": "int8"},
               bench_decode)
        record("decode_llama3_8b_int4",
               {"BENCH_MODEL": "llama3-8B", "BENCH_WEIGHT_DTYPE": "int4"},
               bench_decode)
        record("decode_llama3_8b_int8_b8",
               {"BENCH_MODEL": "llama3-8B", "BENCH_WEIGHT_DTYPE": "int8",
                "BENCH_BATCH": "8"},
               bench_decode)
    record("serve_7b_int8", {"BENCH_WEIGHT_DTYPE": "int8"}, bench_serve)
    record("serve_7b_int8_spec", {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_SPEC": "1"},
           bench_serve)
    record("serve_7b_int8_slots8",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_PODS": "8"}, bench_serve)
    record("serve_7b_int8_ctx2048",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_CTX": "2048",
            "BENCH_TOKENS": "96"}, bench_serve)
    # 8 slots x 2048 ctx only fits on a 16 GB chip with the int8 cache
    record("serve_7b_int8_slots8_ctx2048_kvq",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_PODS": "8",
            "BENCH_CTX": "2048", "BENCH_TOKENS": "96",
            "BENCH_KV_DTYPE": "int8"}, bench_serve)
    record("serve_7b_int8_slots8_ctx4096_kvq",
           {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_PODS": "8",
            "BENCH_CTX": "4096", "BENCH_TOKENS": "96",
            "BENCH_KV_DTYPE": "int8"}, bench_serve)
    if os.environ.get("BENCH_MATRIX_SOAK", "1") == "1":
        record("serve_soak", {"BENCH_WEIGHT_DTYPE": "int8"}, bench_soak)
        record("serve_soak_slots8",
               {"BENCH_WEIGHT_DTYPE": "int8", "BENCH_PODS": "8"}, bench_soak)
    record("shard70b_int4", {}, bench_shard70b)
    with open("bench_artifacts/summary.json", "w") as f:
        json.dump(results, f, indent=1)
    failed = [r["metric"] for r in results if "error" in r]
    if failed:
        sys.stderr.write(f"[matrix] {len(failed)} FAILED rows: {failed}\n")
    return headline or {"metric": "bench_matrix", "value": 0,
                        "unit": "headline row failed", "vs_baseline": 0}


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "decode")
    fn = {"decode": bench_decode, "serve": bench_serve,
          "soak": bench_soak, "hbm": bench_hbm, "matrix": bench_matrix,
          "shard70b": bench_shard70b}[mode]
    r = fn()
    r.update(_provenance())
    print(json.dumps(r))


if __name__ == "__main__":
    main()
