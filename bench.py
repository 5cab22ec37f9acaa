"""Benchmark: single-chip greedy decode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config (TPU): LLaMA-7B architecture, INT8 block-quantized weights created
directly on device, 64-token prefill, then steady-state decode measured
over on-device chunks (runtime/decode_loop.py — one host sync per chunk).
Layers run unrolled so the fused Pallas dequant-matmul kernels stream
int8 weights from HBM (ops/kernels.py).

vs_baseline: the reference publishes NO numbers (BASELINE.md) — its own
runtime print is the only source. A 7B FP32 llama.go decode on the
README-suggested 16-core box (README.md:133-136) runs ~1.5 tokens/s; that
estimate is the denominator, recorded here so it is auditable.

Env overrides: BENCH_MODEL (7B|13B|tiny), BENCH_WEIGHT_DTYPE
(int8|int4|bfloat16), BENCH_TOKENS, BENCH_CHUNK, BENCH_CTX.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_7B_FP32_CPU_TOKS = 1.5  # documented estimate, see module docstring


def main() -> None:
    import jax

    from jax._src import xla_bridge

    if jax.default_backend() == "tpu" and "axon" not in xla_bridge.backends():
        # persistent compile cache for real TPU hosts. NOT under the
        # tunneled axon plugin: entries compiled by its remote helper
        # reload with mismatched host features and can SIGILL
        # (see docs/SERVING.md environment notes).
        jax.config.update("jax_compilation_cache_dir", "/tmp/llamago_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from llamago_tpu.checkpoint.params import random_parameters, unstack_layer_params
    from llamago_tpu.config import MODEL_PRESETS
    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.decode_loop import decode_chunk
    from llamago_tpu.runtime.kv_cache import KVCache

    on_tpu = jax.default_backend() == "tpu"
    model_name = os.environ.get("BENCH_MODEL", "7B" if on_tpu else "tiny")
    weight_dtype = os.environ.get("BENCH_WEIGHT_DTYPE", "int8")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "512" if on_tpu else "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", "128" if on_tpu else "16"))
    ctx = int(os.environ.get("BENCH_CTX", "1024" if on_tpu else "128"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # decode slots (serving shape)
    prompt_len = 64 if on_tpu else 8

    config = MODEL_PRESETS[model_name].replace(
        dtype="bfloat16", weight_dtype=weight_dtype, max_seq_len=ctx
    )

    import numpy as np

    def sync(arr):
        # NOTE: block_until_ready does not reliably wait under the axon
        # TPU tunnel, and 0-d transfers stall for tens of seconds — an
        # honest sync is a >=1-element device-to-host copy.
        return np.asarray(arr.reshape(-1)[:1])

    t0 = time.time()
    from llamago_tpu.checkpoint.params import fuse_layer_weights

    if weight_dtype in ("int8", "int4"):
        # quantized leaves are created directly (no dense transient /
        # quantize pass) — same layout and bandwidth as real weights
        from llamago_tpu.checkpoint.params import random_quantized_parameters

        params = random_quantized_parameters(config, seed=0, layered=True)
    else:
        params = random_parameters(config, seed=0)
        params = unstack_layer_params(params, config.n_layers)
    if os.environ.get("BENCH_FUSE", "1") == "1":
        params = fuse_layer_weights(params)  # QKV + W13 fusion
    sync(jax.tree.leaves(params)[0])
    init_s = time.time() - t0

    cache = KVCache.create(config, batch=batch, layered=True)
    prompt = jnp.ones((batch, prompt_len), jnp.int32)
    t0 = time.time()
    logits, cache = forward(params, prompt, cache, jnp.zeros(batch, jnp.int32), config)
    sync(logits)
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
        sync(toks)
        warmup_s = time.time() - t0

        produced = 0
        last = jax.vmap(lambda t, n: t[-1, n])(toks, counts[:, -1] - 1)
        t0 = time.time()
        while produced < n_tokens and int(pos.max()) + chunk * (draft_len + 1) < ctx:
            toks, counts, cache, pos, hist, hlen = speculative_decode_chunk(
                params, last, cache, pos, hist, hlen, config,
                n_steps=chunk, draft_len=draft_len,
            )
            last = jax.vmap(lambda t, n: t[-1, n])(toks, counts[:, -1] - 1)
            produced += int(np.asarray(counts).sum())
        sync(toks)
        dt = time.time() - t0
        toks_per_s = produced / dt
    else:
        # warmup chunk — MUST use the exact steady-state arg structure
        # (state=None vs state=SamplerState are different pytrees -> retrace)
        from llamago_tpu.ops.sampling import SamplerState

        st = SamplerState.create(batch, 1, config.vocab_size)
        rngs = jax.vmap(jax.random.PRNGKey)(jnp.zeros(batch, jnp.int32))
        t0 = time.time()
        toks, cache, pos, st, rngs = decode_chunk(
            params, tok, cache, pos, config, chunk, rngs=rngs, state=st
        )
        sync(toks)
        warmup_s = time.time() - t0

        # steady-state measurement
        produced = 0
        t0 = time.time()
        while produced < n_tokens:
            toks, cache, pos, st, rngs = decode_chunk(
                params, toks[:, -1], cache, pos, config, chunk, rngs=rngs, state=st
            )
            produced += chunk * batch
        sync(toks)
        dt = time.time() - t0
        toks_per_s = produced / dt

    sys.stderr.write(
        f"[bench] backend={jax.default_backend()} model={model_name} "
        f"weights={weight_dtype} ctx={ctx} init={init_s:.1f}s "
        f"prefill+compile={prefill_s:.1f}s warmup={warmup_s:.1f}s "
        f"decode={produced} toks in {dt:.2f}s\n"
    )
    print(json.dumps({
        "metric": (f"decode_tokens_per_sec_{model_name}_{weight_dtype}_greedy_b{batch}"
                   + ("_spec" if speculative else "")),
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(toks_per_s / REFERENCE_7B_FP32_CPU_TOKS, 2),
    }))


if __name__ == "__main__":
    main()
